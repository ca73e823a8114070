package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Mutable top-1 state: the running winner of min-by-(negAdj, id). */
final class Top1Buf(
    var set: Boolean, var negAdj: Double, var id: Long, var score: Long)

/** Hash-aggregable argmax: per group, the (id, score) of the row with
  * the LARGEST adj, ties to the SMALLEST id — exactly
  * `min_by(struct(id, score), struct(-adj, id))` (the comparison is
  * implemented literally as min over (-adj, id) with Double.compare,
  * so NaN/-0.0 order matches Spark's struct ordering bit for bit).
  *
  * Why it exists: min_by/max_by carry their ordering STRUCT in the
  * aggregation buffer, and HashAggregateExec requires fixed-width
  * mutable buffer fields — so every argmax-over-a-join in the repo
  * planned as Sort + SortAggregate, a total sort of the aggregate's
  * INPUT. Harmless when the input is small; fatal when it is a
  * pair-join product: the r15 third-decade text spot measured
  * t_embed_quantize at 55x/decade sorting the 200M-row probe x corpus
  * cartesian before reducing it to 100 rows. As a
  * TypedImperativeAggregate this plans into ObjectHashAggregateExec:
  * partial aggregation folds each partition to one ~25-byte state per
  * group map-side, no sort anywhere, and the exchange carries
  * #partitions x #groups rows.
  *
  * Null contract (ADVICE r15): rows where any of (adj, id, score) is
  * null are IGNORED; a group with no qualifying rows evaluates to a
  * null struct. This matches min_by for null adj/id (null ORDERING
  * keys are skipped) but DIVERGES for null score — min_by would still
  * select such a row and return a null-score struct. The aggregate
  * therefore assumes score is non-null wherever a bitwise-min_by
  * claim is made; at its one call site (t_embed_quantize) score is
  * intDot over non-null int8 arrays, which cannot be null.
  */
case class ArgTop1(
    adj: Expression, id: Expression, score: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Top1Buf] {

  override def children: Seq[Expression] = Seq(adj, id, score)
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("n_id", LongType, nullable = false),
    StructField("score", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (adj.dataType == DoubleType && id.dataType == LongType &&
        score.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"arg_top1 requires (double, bigint, bigint), got " +
        s"(${adj.dataType.sql}, ${id.dataType.sql}, ${score.dataType.sql})")

  override def createAggregationBuffer(): Top1Buf =
    new Top1Buf(false, 0.0, 0L, 0L)

  // candidate (negAdj, id) beats the buffer iff it is strictly smaller
  // in (Double.compare, Long.compare) lexicographic order — the same
  // total order Spark's struct ordering gives min_by(_, struct(-adj, id))
  private def beats(negAdj: Double, id: Long, b: Top1Buf): Boolean = {
    val c = java.lang.Double.compare(negAdj, b.negAdj)
    c < 0 || (c == 0 && id < b.id)
  }

  override def update(b: Top1Buf, input: InternalRow): Top1Buf = {
    val a = adj.eval(input)
    val i = id.eval(input)
    val s = score.eval(input)
    if (a != null && i != null && s != null) {
      // + 0.0 folds -0.0 into 0.0 AFTER negation: Spark normalizes
      // floating ordering keys (SPARK-26021), so min_by treats
      // adj = -0.0 and adj = 0.0 as the same rank and lets the id
      // break the tie — the same fold ShardSearch.keyGe applies.
      val na = -a.asInstanceOf[Double] + 0.0
      val iv = i.asInstanceOf[Long]
      if (!b.set || beats(na, iv, b)) {
        b.set = true; b.negAdj = na; b.id = iv
        b.score = s.asInstanceOf[Long]
      }
    }
    b
  }

  override def merge(b: Top1Buf, o: Top1Buf): Top1Buf = {
    if (o.set && (!b.set || beats(o.negAdj, o.id, b))) {
      b.set = true; b.negAdj = o.negAdj; b.id = o.id; b.score = o.score
    }
    b
  }

  override def eval(b: Top1Buf): Any =
    if (!b.set) null
    else new GenericInternalRow(Array[Any](b.id, b.score))

  override def serialize(b: Top1Buf): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(25)
    buf.put(if (b.set) 1.toByte else 0.toByte)
    buf.putDouble(b.negAdj).putLong(b.id).putLong(b.score)
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): Top1Buf = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val set = buf.get() == 1
    new Top1Buf(set, buf.getDouble, buf.getLong, buf.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): ArgTop1 =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ArgTop1 =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): ArgTop1 =
    copy(adj = c(0), id = c(1), score = c(2))
  override def prettyName: String = "arg_top1"
}

object ArgTop1 {
  /** struct(n_id, score) of the max-adj (tie: min id) row per group. */
  def column(adj: Column, id: Column, score: Column): Column =
    GraftColumnBridge.column(ArgTop1(
      GraftColumnBridge.expression(adj),
      GraftColumnBridge.expression(id),
      GraftColumnBridge.expression(score)).toAggregateExpression())
}

/** Mutable top-k state: up to k (negOrd, id, payload) entries kept in
  * rank order (insertion sort — k is single-digit). */
final class TopKBuf(val k: Int) {
  var n: Int = 0
  val ord = new Array[Double](k)
  val id = new Array[Long](k)
  val payload = new Array[Double](k)
}

/** Hash-aggregable top-k: per group, the k rows with the LARGEST ord
  * (ties to the SMALLEST id), returned rank-ascending as
  * array<struct<n_id, v>> — exactly the rows `row_number() OVER
  * (PARTITION BY g ORDER BY ord DESC, id) <= k` keeps, in rn order
  * (NaN ranks first like Spark's descending double sort; -0.0 folds
  * into 0.0 like SPARK-26021 normalization — ArgTopKSpec pins both).
  *
  * Why: a window over a pair-join product sorts the WHOLE product to
  * keep k rows per group — t_embed_knn (top-5 of the probe x corpus
  * cartesian) measured 17x/decade in the r15 third-decade text spot
  * on exactly that sort. As a TypedImperativeAggregate the plan is
  * ObjectHashAggregate: each partition folds to a k-entry state per
  * group map-side and nothing is ever globally sorted.
  *
  * Null contract (ADVICE r15): rows with null ord (or id/payload) are
  * DROPPED. row_number() OVER (ORDER BY ord DESC, id) instead places
  * null ord LAST and would still assign rn <= k in a group with fewer
  * than k non-null rows — so the window-equivalence claim assumes ord
  * is non-null. At the call sites (t_embed_knn, t_dedup_cosine) ord is
  * a double cosine expression over non-null arrays: it can yield NaN
  * (ranked first, like the window) but never null.
  */
case class ArgTopK(
    ord: Expression, id: Expression, payload: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuf] {
  require(k >= 1 && k <= 1024, s"arg_topk k out of range: $k")

  override def children: Seq[Expression] = Seq(ord, id, payload)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("n_id", LongType, nullable = false),
    StructField("v", DoubleType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (ord.dataType == DoubleType && id.dataType == LongType &&
        payload.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"arg_topk requires (double, bigint, double), got " +
        s"(${ord.dataType.sql}, ${id.dataType.sql}, ${payload.dataType.sql})")

  override def createAggregationBuffer(): TopKBuf = new TopKBuf(k)

  // rank order: ord DESCENDING with Double.compare (NaN largest, so
  // NaN ranks FIRST — exactly Spark's ORDER BY ord DESC), ties to the
  // smaller id. Negating ord would NOT work: -NaN is still NaN and
  // would rank last instead of first.
  private def insert(b: TopKBuf, ord: Double, id: Long, payload: Double): Unit = {
    var pos = b.n
    while (pos > 0 && {
      val c = java.lang.Double.compare(ord, b.ord(pos - 1))
      c > 0 || (c == 0 && id < b.id(pos - 1))
    }) pos -= 1
    if (pos < b.k) {
      val last = math.min(b.n, b.k - 1)
      var j = last
      while (j > pos) {
        b.ord(j) = b.ord(j - 1); b.id(j) = b.id(j - 1)
        b.payload(j) = b.payload(j - 1); j -= 1
      }
      b.ord(pos) = ord; b.id(pos) = id; b.payload(pos) = payload
      if (b.n < b.k) b.n += 1
    }
  }

  override def update(b: TopKBuf, input: InternalRow): TopKBuf = {
    val o = ord.eval(input)
    val i = id.eval(input)
    val p = payload.eval(input)
    if (o != null && i != null && p != null) {
      // + 0.0 folds -0.0 into 0.0 (SPARK-26021 normalization)
      insert(b, o.asInstanceOf[Double] + 0.0, i.asInstanceOf[Long],
        p.asInstanceOf[Double])
    }
    b
  }

  // O(k^2) worst case per merge (k inserts, each an O(k) scan+shift).
  // Fine at the single-digit k the call sites use; the k <= 1024
  // require above bounds it at ~1M compares per merge, and merges run
  // once per (group x partial) — far off any hot path. A heap-backed
  // buffer only pays off past that bound (VERDICT r15 Next #6).
  override def merge(b: TopKBuf, o: TopKBuf): TopKBuf = {
    var i = 0
    while (i < o.n) { insert(b, o.ord(i), o.id(i), o.payload(i)); i += 1 }
    b
  }

  override def eval(b: TopKBuf): Any = {
    val out = new Array[Any](b.n)
    var i = 0
    while (i < b.n) {
      out(i) = new GenericInternalRow(Array[Any](b.id(i), b.payload(i)))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def serialize(b: TopKBuf): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(4 + 24 * b.n)
    buf.putInt(b.n)
    var i = 0
    while (i < b.n) {
      buf.putDouble(b.ord(i)).putLong(b.id(i)).putDouble(b.payload(i))
      i += 1
    }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val n = buf.getInt
    val b = new TopKBuf(k)
    b.n = n
    var i = 0
    while (i < n) {
      b.ord(i) = buf.getDouble; b.id(i) = buf.getLong
      b.payload(i) = buf.getDouble; i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): ArgTopK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ArgTopK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): ArgTopK =
    copy(ord = c(0), id = c(1), payload = c(2))
  override def prettyName: String = "arg_topk"
}

object ArgTopK {
  /** array<struct<n_id, v>> of the k max-ord rows per group, rank
    * ascending — row_number() <= k without the global sort. */
  def column(ord: Column, id: Column, payload: Column, k: Int): Column =
    GraftColumnBridge.column(ArgTopK(
      GraftColumnBridge.expression(ord),
      GraftColumnBridge.expression(id),
      GraftColumnBridge.expression(payload), k).toAggregateExpression())
}
