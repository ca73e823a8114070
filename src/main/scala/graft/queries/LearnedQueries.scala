package graft.queries

import graft.{InferDbPipeline, Tables}
import graft.core.Task
import graft.metrics.Metrics
import graft.multimodal.Multimodal
import graft.streaming.StreamOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end learned-pipeline queries (SURVEY §3.1 lifecycle with a
  * REAL MLlib model and fitted binning/selection — train-time dataflow
  * is driver-orchestrated Spark jobs, so these are rows-only checks
  * except where the serve path is SQL-expressible), plus the streaming
  * window and multimodal mapPartitions surfaces.
  */
object LearnedQueries {
  type Q = (SparkSession, String) => DataFrame

  private def trainFrame(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber"),
      col("l_quantity"), (col("l_extendedprice") / 1000.0).as("price_k"),
      col("l_discount"), col("l_tax"),
      // a categorical candidate (T2 path) — uninformative for this
      // target, so greedy selection must also REJECT it correctly.
      col("l_returnflag"),
      // learnable target (price is qty-driven in TPC-H-ish data):
      // the model earns a real F1 and the index must reproduce it.
      (col("l_extendedprice") > 30000.0).cast("double").as("target"))

  private def e2eConfig = InferDbPipeline.Config(
    features = Seq("l_quantity", "price_k", "l_discount", "l_tax", "l_returnflag"),
    categorical = Set("l_returnflag"),
    target = "target",
    task = Task.Classification,
    maxBins = 6)

  // One fit per (session, sfDir): x_learned_e2e / x_learned_parity /
  // x_report share the same lifecycle; re-training three times would
  // triple bench cost for no information.
  private val fitCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String),
      (InferDbPipeline.Fitted, DataFrame)]
  private def fitted(s: SparkSession, d: String) =
    fitCache.getOrElseUpdate((s, d), {
      val df = trainFrame(s, d)
      val (f, withPred) = InferDbPipeline.fitWithModel(df, e2eConfig)
      (f, withPred.cache())
    })

  val defs: Map[String, Q] = Map(
    // Full learned lifecycle: MLlib LR -> supervised binning -> greedy
    // IV selection -> KV index -> broadcast probe. Rows-only check
    // (training is not SQL-expressible); parity is asserted in tests.
    "x_learned_e2e" -> ((s, d) => {
      val (f, _) = fitted(s, d)
      f.transform(trainFrame(s, d), "prediction")
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("prediction"), 6).as("prediction"))
    }),

    // One-row parity report: model-vs-index F1 (the reference's core
    // effectiveness claim, transpiler.py:3295-3320). Rows-only.
    "x_learned_parity" -> ((s, d) => {
      val (f, withPred) = fitted(s, d)
      val scored = f.transform(withPred, "index_pred")
      val modelF1 = Metrics.binaryReport(scored, col("__model_pred"), col("target"))
        .select("f1").head().getDouble(0)
      val indexF1 = Metrics.binaryReport(scored, col("index_pred"), col("target"))
        .select("f1").head().getDouble(0)
      import s.implicits._
      Seq((f.selected.mkString(","), f.indexEntries,
           math.rint(modelF1 * 1e6) / 1e6, math.rint(indexF1 * 1e6) / 1e6))
        .toDF("selected_features", "index_entries", "model_f1", "index_f1")
    }),

    // Trainable-MLP lifecycle (transpiler.py:1696-1835 /
    // nn_inference.sql): MLlib MultilayerPerceptronClassifier -> index
    // memorizes its predictions; the trained weights are ALSO extracted
    // into the fused MlpModel scorer and checked against the MLlib
    // predictions in-query (fused_agreement). Rows-only.
    "x_learned_mlp" -> ((s, d) => {
      val df = trainFrame(s, d)
      val numeric = Seq("l_quantity", "price_k", "l_discount", "l_tax")
      val cfg = e2eConfig.copy(model = "mlp",
        features = numeric, categorical = Set.empty)
      val t = InferDbPipeline.fitLifecycle(df, cfg)
      val fused = graft.models.MlpModel.fromMlpClassifier(
        t.mlModel.asInstanceOf[org.apache.spark.ml.classification.MultilayerPerceptronClassificationModel])
      val scored = t.fitted.transform(t.withPred, "index_pred")
        .withColumn("fused_pred", fused.predictClass(numeric.map(col)).cast("double"))
      val modelF1 = Metrics.binaryReport(scored, col("__model_pred"), col("target"))
        .select("f1").head().getDouble(0)
      val indexF1 = Metrics.binaryReport(scored, col("index_pred"), col("target"))
        .select("f1").head().getDouble(0)
      val fusedAgree = scored.agg(
        avg((col("fused_pred") === col("__model_pred")).cast("double"))).head().getDouble(0)
      import s.implicits._
      Seq((t.fitted.selected.mkString(","), t.fitted.indexEntries,
           math.rint(modelF1 * 1e6) / 1e6, math.rint(indexF1 * 1e6) / 1e6,
           math.rint(fusedAgree * 1e6) / 1e6))
        .toDF("selected_features", "index_entries", "model_f1", "index_f1",
          "fused_agreement")
    }),

    // The reference's one-row report (size + metrics + stage latencies;
    // rows-only: latencies are wall-clock).
    "x_report" -> ((s, d) => {
      val (f, _) = fitted(s, d)
      graft.report.Report.classificationReport(s, f, trainFrame(s, d), "target")
    }),

    // Regression lifecycle e2e (T11 log-target + A1 mean index + A8
    // RMSLE): LinearRegression on log(price), index memorizes its
    // predictions, report model-vs-index RMSLE in the price domain.
    "x_learned_regression" -> ((s, d) => {
      val df = Tables.lineitem(s, d).select(
        col("l_quantity"), col("l_discount"), col("l_tax"),
        log(col("l_extendedprice") + 1.0).as("target"),
        col("l_extendedprice"))
      val cfg = InferDbPipeline.Config(
        features = Seq("l_quantity", "l_discount", "l_tax"),
        target = "target", task = Task.Regression, maxBins = 8)
      val (f, withPred) = InferDbPipeline.fitWithModel(df, cfg)
      val scored = f.transform(withPred, "index_pred")
        .withColumn("model_price", exp(col("__model_pred")) - 1.0)
        .withColumn("index_price", exp(col("index_pred")) - 1.0)
      val mR = Metrics.rmsle(scored, col("model_price"), col("l_extendedprice"))
        .head().getDouble(0)
      val iR = Metrics.rmsle(scored, col("index_price"), col("l_extendedprice"))
        .head().getDouble(0)
      import s.implicits._
      Seq((f.selected.mkString(","), f.indexEntries,
        math.rint(mR * 1e4) / 1e4, math.rint(iR * 1e4) / 1e4))
        .toDF("selected_features", "index_entries", "model_rmsle", "index_rmsle")
    }),

    // Multi-class lifecycle e2e (A2 mode aggregation in the index).
    "x_learned_multiclass" -> ((s, d) => {
      val df = Tables.orders(s, d).select(
        col("o_totalprice"), (col("o_custkey") % 50).cast("double").as("cust_mod"),
        when(col("o_orderstatus") === "F", 0.0)
          .when(col("o_orderstatus") === "O", 1.0).otherwise(2.0).as("target"))
      val cfg = InferDbPipeline.Config(
        features = Seq("o_totalprice", "cust_mod"),
        target = "target", task = Task.MultiClass, maxBins = 6)
      val (f, withPred) = InferDbPipeline.fitWithModel(df, cfg)
      val scored = f.transform(withPred, "index_pred")
      val agree = scored.agg(
        avg((col("index_pred") === col("__model_pred")).cast("double"))).head().getDouble(0)
      import s.implicits._
      Seq((f.selected.mkString(","), f.indexEntries, math.rint(agree * 1e4) / 1e4))
        .toDF("selected_features", "index_entries", "model_index_agreement")
    }),

    // MNIST-width stress (SURVEY §7.4 risks #1/#8): 256 synthetic
    // features through the full lifecycle — the 2-job batched binning
    // must not degenerate into 256 jobs, and maxBins=24 pushes every
    // selected feature onto the codegen'd BinIndex binary-search path
    // (a 24-way CASE chain × 256 features would blow up codegen).
    // Rows-only; fit wall-time is carried in the output row.
    "x_width_stress" -> ((s, d) => {
      val width = 256
      val feats = (0 until width).map { i =>
        (element_at(col("embedding"), i % 64 + 1).cast("double") * ((i / 64) + 1)
          + lit(i * 0.001)).as(s"f_$i")
      }
      val base = Tables.embeddings(s, d).select(feats :+
        (element_at(col("embedding"), 1) + element_at(col("embedding"), 2) > 0)
          .cast("double").as("target"): _*)
      val cfg = InferDbPipeline.Config(
        features = (0 until width).map(i => s"f_$i"),
        target = "target", task = Task.Classification,
        maxBins = 24, maxFeatures = 3,
        // the walk costs one joint-IV job per candidate: rank all 256
        // in ONE batched job, then walk only the 16 best
        maxCandidates = 16)
      val t0 = System.nanoTime()
      val (f, withPred) = InferDbPipeline.fitWithModel(base, cfg)
      val scored = f.transform(withPred, "index_pred")
      val agree = scored.agg(
        avg((round(col("index_pred")) === col("__model_pred")).cast("double")))
        .head().getDouble(0)
      val fitSec = (System.nanoTime() - t0) / 1e9
      import s.implicits._
      Seq((width.toLong, f.selected.length.toLong, f.indexEntries,
           math.rint(agree * 1e4) / 1e4, math.rint(fitSec * 100) / 100))
        .toDF("n_features", "n_selected", "index_entries",
          "model_index_agreement", "fit_sec")
    }),

    // Index-size sensitivity (the reference's sizes microbench): the
    // distinct-key count under coarser/finer binnings, one pass.
    "x_sizes_sensitivity" -> ((s, d) => {
      val k2 = graft.core.Keys.keyColumn(Seq(
        graft.core.NumericBins(Array(25.0)).toColumn(col("l_quantity")),
        graft.core.NumericBins(Array(0.05)).toColumn(col("l_discount"))))
      val k4 = graft.core.Keys.keyColumn(Seq(
        graft.core.NumericBins(Array(13.0, 25.0, 38.0)).toColumn(col("l_quantity")),
        graft.core.NumericBins(Array(0.025, 0.05, 0.075)).toColumn(col("l_discount"))))
      val k8 = graft.core.Keys.keyColumn(Seq(
        graft.core.NumericBins((1 to 7).map(_ * 6.25).toArray).toColumn(col("l_quantity")),
        graft.core.NumericBins((1 to 7).map(_ * 0.0125).toArray).toColumn(col("l_discount"))))
      Tables.lineitem(s, d).agg(
        countDistinct(k2).as("keys_2bins"),
        countDistinct(k4).as("keys_4bins"),
        countDistinct(k8).as("keys_8bins"))
    }),

    // Multimodal decode through the mapPartitions batch pipeline; the
    // stub decoder's arithmetic is SQL-expressible, so even this path
    // gets a full oracle.
    "x_multimodal_decode" -> ((s, d) =>
      Multimodal.decode(Multimodal.fromDocuments(Tables.documents(s, d)))
        .select("media_id", "media_type", "byte_len", "width", "height", "n_frames")),

    // Tumbling-window aggregate (same code path batch + streaming).
    "x_stream_window" -> ((s, d) =>
      StreamOps.windowedCounts(Tables.events(s, d), exactSums = true)
        .select(unix_timestamp(col("window_start")).as("wstart"),
          col("event_type"), col("cnt"), col("sum_value")))
  )

  private val P = 1000000007L
  // mirrors Multimodal.fromDocuments' ASCII sanitization (byte-fold ==
  // char-fold needs ASCII); identity on the ASCII testdata corpus
  private val asciiText = "regexp_replace(text, '[^\\x00-\\x7f]', '?', 'g')"
  private val chSql =
    s"list_reduce(list_prepend(0::BIGINT, [ord(c)::BIGINT FOR c IN string_split($asciiText, '')]), (h, x) -> (h * 31 + x) % $P)"

  val oracle: Map[String, String] = Map(
    "x_sizes_sensitivity" -> {
      def bc(c: String, sp: Seq[Double]) = SqlGen.binCase(c, sp)
      val k2 = s"${bc("l_quantity", Seq(25.0))} || '.' || ${bc("l_discount", Seq(0.05))}"
      val k4 = s"${bc("l_quantity", Seq(13.0, 25.0, 38.0))} || '.' || ${bc("l_discount", Seq(0.025, 0.05, 0.075))}"
      val k8 = s"${bc("l_quantity", (1 to 7).map(_ * 6.25))} || '.' || ${bc("l_discount", (1 to 7).map(_ * 0.0125))}"
      s"""SELECT count(DISTINCT $k2) AS keys_2bins,
         |  count(DISTINCT $k4) AS keys_4bins,
         |  count(DISTINCT $k8) AS keys_8bins
         |FROM lineitem""".stripMargin
    },
    "x_multimodal_decode" ->
      s"""SELECT doc_id AS media_id,
         |  CASE WHEN doc_id % 3 = 0 THEN 'image'
         |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
         |  length($asciiText) AS byte_len,
         |  ($chSql) % 640 AS width,
         |  (($chSql) // 640) % 480 AS height,
         |  length($asciiText) // 100 + 1 AS n_frames
         |FROM documents""".stripMargin,
    "x_stream_window" ->
      """SELECT epoch(date_trunc('hour', ts))::BIGINT AS wstart, event_type,
        |  count(*) AS cnt,
        |  sum(CAST(round(value * 1000) AS BIGINT)) / 1000.0 AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin
  )
}
