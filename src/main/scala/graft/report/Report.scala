package graft.report

import graft.InferDbPipeline.Fitted
import graft.metrics.Metrics
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's report harness re-expressed (SURVEY §6;
  * src/transpiler.py:3295-3320 standalone columns, :1434-1441 PG
  * columns): one-row DataFrame with solution name, index size,
  * effectiveness metrics, and per-stage latencies, where end-to-end is
  * the SUM of stage latencies exactly like the reference's report.
  */
object Report {

  /** Time `df.count()` and return (seconds, rows). */
  private def timed(df: DataFrame): (Double, Long) = {
    val t0 = System.nanoTime()
    val n = df.count()
    ((System.nanoTime() - t0) / 1e9, n)
  }

  /** Classification report for a fitted index over a test frame:
    * (solution, size_entries, accuracy, precision, recall, f1,
    * translate_s, score_s, end_to_end_s, batch_size) — the reference's
    * PG report row shape with the same stage decomposition.
    */
  def classificationReport(
      spark: SparkSession,
      fitted: Fitted,
      test: DataFrame,
      target: String,
      solution: String = "graft-kv-index"): DataFrame = {
    val (translateS, batch) = timed(test.select(fitted.keyColumn.as("key")))
    val scored = fitted.transform(test, "__p")
    val (scoreS, _) = timed(scored)
    val m = Metrics.binaryReport(scored, col("__p"), col(target)).head()
    import spark.implicits._
    Seq((
      solution,
      fitted.indexEntries,
      m.getAs[Double]("accuracy"), m.getAs[Double]("precision"),
      m.getAs[Double]("recall"), m.getAs[Double]("f1"),
      translateS, scoreS, translateS + scoreS, batch
    )).toDF("solution", "size_entries", "accuracy", "precision", "recall",
      "f1", "translate_s", "score_s", "end_to_end_s", "batch_size")
  }

  /** Regression variant: RMSLE in place of the confusion metrics. */
  def regressionReport(
      spark: SparkSession,
      fitted: Fitted,
      test: DataFrame,
      target: String,
      solution: String = "graft-kv-index"): DataFrame = {
    val (translateS, batch) = timed(test.select(fitted.keyColumn.as("key")))
    val scored = fitted.transform(test, "__p")
    val (scoreS, _) = timed(scored)
    val rmsle = Metrics.rmsle(scored, col("__p"), col(target)).head().getDouble(0)
    import spark.implicits._
    Seq((solution, fitted.indexEntries, rmsle, translateS, scoreS,
      translateS + scoreS, batch))
      .toDF("solution", "size_entries", "rmsle", "translate_s", "score_s",
        "end_to_end_s", "batch_size")
  }
}
