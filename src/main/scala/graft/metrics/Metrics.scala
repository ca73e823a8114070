package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Effectiveness metrics as single-aggregation DataFrames
  * (ref: src/transpiler.py:241-377; sql_scripts/clf_acc.sql,
  * lr_reg_test.sql). One `agg` each — no per-label CTE chains.
  */
object Metrics {

  /** Binary confusion counts + accuracy/precision/recall/F1 in one agg
    * (transpiler.py:253-273). Predictions are rounded like the
    * reference (`round(pred)`); all counts LongType.
    */
  def binaryReport(df: DataFrame, pred: Column, target: Column): DataFrame = {
    val p = round(pred).cast("long")
    val t = target.cast("long")
    df.agg(
        sum((p === 1 && t === 1).cast("long")).as("tp"),
        sum((p === 0 && t === 0).cast("long")).as("tn"),
        sum((p === 1 && t === 0).cast("long")).as("fp"),
        sum((p === 0 && t === 1).cast("long")).as("fn"))
      .withColumn("accuracy", (col("tp") + col("tn")).cast("double") /
        (col("tp") + col("tn") + col("fp") + col("fn")))
      .withColumn("precision",
        when(col("tp") + col("fp") === 0, 0.0)
          .otherwise(col("tp").cast("double") / (col("tp") + col("fp"))))
      .withColumn("recall",
        when(col("tp") + col("fn") === 0, 0.0)
          .otherwise(col("tp").cast("double") / (col("tp") + col("fn"))))
      // f1 in the single-division algebraic form 2*tp/(2*tp+fp+fn): the
      // classic 2*p*r/(p+r) is a multi-op FP expression whose last ulp
      // depends on evaluation order and differs between engines; a lone
      // division of exact integers is bit-identical everywhere.
      .withColumn("f1",
        when(lit(2L) * col("tp") + col("fp") + col("fn") === 0, 0.0)
          .otherwise((lit(2L) * col("tp")).cast("double") /
            (lit(2L) * col("tp") + col("fp") + col("fn"))))
  }

  /** Macro-averaged multi-class report: per-label one-vs-rest
    * precision/recall/F1 via one groupBy instead of the reference's
    * generated per-label CTEs (transpiler.py:274-344).
    */
  def macroReport(df: DataFrame, pred: Column, target: Column): DataFrame = {
    val p = round(pred).cast("long").as("p")
    val t = target.cast("long").as("t")
    val pairs = df.select(p, t)
    val byLabel = pairs
      .select(explode(array(struct(col("p").as("label"), lit(1).as("isP"), (col("p") === col("t")).cast("long").as("hit")),
                            struct(col("t").as("label"), lit(0).as("isP"), (col("p") === col("t")).cast("long").as("hit")))).as("x"))
      .select(col("x.*"))
      .groupBy("label")
      .agg(
        sum(when(col("isP") === 1, col("hit")).otherwise(0L)).as("tp"),
        sum(col("isP").cast("long")).as("predCnt"),
        sum(lit(1L) - col("isP")).as("trueCnt"))
      .withColumn("precision", when(col("predCnt") === 0, 0.0).otherwise(col("tp") / col("predCnt")))
      .withColumn("recall", when(col("trueCnt") === 0, 0.0).otherwise(col("tp") / col("trueCnt")))
      // Same single-division form as binaryReport: for one-vs-rest counts
      // 2*p*r/(p+r) reduces algebraically to 2*tp/(predCnt+trueCnt).
      .withColumn("f1", when(col("predCnt") + col("trueCnt") === 0, 0.0)
        .otherwise((lit(2L) * col("tp")).cast("double") / (col("predCnt") + col("trueCnt"))))
    byLabel.agg(
      avg("precision").as("macro_precision"),
      avg("recall").as("macro_recall"),
      avg("f1").as("macro_f1"))
  }

  /** RMSLE (transpiler.py:348-356, lr_reg_test.sql:18-21):
    * sqrt(sum((ln(p+1)-ln(t+1))^2) / n). */
  def rmsle(df: DataFrame, pred: Column, target: Column): DataFrame =
    df.agg(
      sqrt(sum(pow(log(pred.cast("double") + 1) - log(target.cast("double") + 1), 2)) /
        count(lit(1))).as("rmsle"))
}
