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

    // The reference's one-row report (size + metrics + stage latencies;
    // rows-only: latencies are wall-clock).
    "x_report" -> ((s, d) => {
      val (f, _) = fitted(s, d)
      graft.report.Report.classificationReport(s, f, trainFrame(s, d), "target")
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
  private val chSql =
    s"list_reduce(list_prepend(0::BIGINT, [ord(c)::BIGINT FOR c IN string_split(text, '')]), (h, x) -> (h * 31 + x) % $P)"

  val oracle: Map[String, String] = Map(
    "x_multimodal_decode" ->
      s"""SELECT doc_id AS media_id,
         |  CASE WHEN doc_id % 3 = 0 THEN 'image'
         |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
         |  length(text) AS byte_len,
         |  ($chSql) % 640 AS width,
         |  (($chSql) // 640) % 480 AS height,
         |  length(text) // 100 + 1 AS n_frames
         |FROM documents""".stripMargin,
    "x_stream_window" ->
      """SELECT epoch(date_trunc('hour', ts))::BIGINT AS wstart, event_type,
        |  count(*) AS cnt,
        |  sum(CAST(round(value * 1000) AS BIGINT)) / 1000.0 AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin
  )
}
