package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Information-Value aggregates (ref: src/optimizer.py:41-102,153-172)
  * as single groupBy jobs + column arithmetic. Each call is one Spark
  * job over the (cached) encoded DataFrame; the greedy selector loops
  * over these on the driver.
  */
object IV {

  /** Binary-classification IV of the grouping defined by `keyCols`.
    * WoE formula per bin (optimizer.py:79-82):
    *   ((ln(n-s+0.5)-ln(N_nonev)) - (ln(s+0.5)-ln(N_ev)))
    *     * ((n-s)/N_nonev - s/N_ev)
    * summed over bins; n = bin size, s = sum(y) in bin.
    */
  def classification(df: DataFrame, keyCols: Seq[Column], target: Column): Double = {
    val tot = df.agg(
      sum(target.cast("double")).as("ev"),
      count(lit(1)).cast("double").as("n")
    ).head()
    val nEv    = tot.getDouble(0)
    val nNonEv = tot.getDouble(1) - nEv
    if (nEv == 0 || nNonEv == 0) return 0.0

    val perBin = df
      .groupBy(keyCols: _*)
      .agg(count(lit(1)).cast("double").as("n"), sum(target.cast("double")).as("s"))
    val ivCol = classificationIvTerm(col("n"), col("s"), nEv, nNonEv)
    perBin.agg(sum(ivCol)).head().getDouble(0)
  }

  /** The per-bin WoE*distribution-difference term as a Column, shared
    * with the oracle-SQL generator so both sides use one formula. */
  def classificationIvTerm(n: Column, s: Column, nEv: Double, nNonEv: Double): Column =
    ((log(n - s + 0.5) - log(lit(nNonEv))) - (log(s + 0.5) - log(lit(nEv)))) *
      ((n - s) / nNonEv - s / nEv)

  /** Regression IV variant (optimizer.py:99-102):
    * sum over bins of |mean(y)_bin - mean(y)| * n_bin / N.
    */
  def regression(df: DataFrame, keyCols: Seq[Column], target: Column): Double = {
    val tot = df.agg(avg(target.cast("double")), count(lit(1)).cast("double")).head()
    val gMean = tot.getDouble(0)
    val nTot  = tot.getDouble(1)
    val perBin = df
      .groupBy(keyCols: _*)
      .agg(count(lit(1)).cast("double").as("n"), avg(target.cast("double")).as("m"))
    perBin.agg(sum(abs(col("m") - gMean) * col("n") / nTot)).head().getDouble(0)
  }

  /** Multi-class IV (optimizer.py:83-98): per-class one-vs-rest
    * classification IV, summed across classes. Computed with a single
    * pair of aggregations + join (SURVEY A5/J8) per call.
    */
  def multiclass(df: DataFrame, keyCols: Seq[Column], target: Column): Double = {
    val classes = df.select(target.cast("long").as("c")).distinct()
      .collect().map(_.getLong(0)).sorted
    classes.map { c =>
      classification(df, keyCols, (target.cast("long") === c).cast("double"))
    }.sum
  }
}
