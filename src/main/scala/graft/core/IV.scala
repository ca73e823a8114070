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
    classification(df, keyCols, target, tot.getDouble(0),
      tot.getDouble(1) - tot.getDouble(0))
  }

  /** [[classification]] with the global totals precomputed — callers
    * scoring SEVERAL groupings of the same (df, target) share ONE
    * totals job instead of re-running it per call (r16, guide §1.2:
    * a3_iv_classification paid 3 identical totals aggregations). The
    * per-call IV aggregation is unchanged bit for bit. */
  def classification(df: DataFrame, keyCols: Seq[Column], target: Column,
      nEv: Double, nNonEv: Double): Double = {
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
    * classification IV, summed across classes.
    *
    * r16 (guide §1.2/§2.3): TWO jobs total — one class-count
    * aggregation (which also discovers the classes, replacing the old
    * standalone distinct+collect), then one per-bin aggregation
    * carrying a conditional sum per class, with the per-class IV terms
    * summed in the same job. The old form paid 1 + 2·|classes| jobs
    * (a distinct scan, then a totals job and a per-bin job PER CLASS)
    * over the same cached frame. Term SET is identical (same per-bin
    * n/s_c, same classificationIvTerm); only the summation order moves
    * (bins-then-classes vs classes-then-bins), which every consumer
    * already absorbs by rounding to 6 decimals — the same tolerance
    * the cross-engine oracle needs anyway.
    */
  def multiclass(df: DataFrame, keyCols: Seq[Column], target: Column): Double = {
    val counts = df.groupBy(target.cast("long").as("c"))
      .agg(count(lit(1)).cast("double").as("n"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val nTot = counts.values.sum
    val classes = counts.keys.toSeq.sorted
    val aggs = count(lit(1)).cast("double").as("n") +: classes.map(c =>
      sum((target.cast("long") === c).cast("double")).as(s"s_$c"))
    val terms = classes.flatMap { c =>
      val nEv = counts(c); val nNonEv = nTot - nEv
      if (nEv == 0 || nNonEv == 0) None
      else Some(classificationIvTerm(col("n"), col(s"s_$c"), nEv, nNonEv))
    }
    if (terms.isEmpty) return 0.0
    df.groupBy(keyCols: _*).agg(aggs.head, aggs.tail: _*)
      .agg(sum(terms.reduce(_ + _))).head().getDouble(0)
  }

  /** Walk-invariant global target statistics, computed ONCE per
    * selection and reused by every [[jointIvs]] round (they cannot
    * change between rounds — recomputing them cost one extra
    * driver-blocking job per accepted feature). */
  sealed trait Totals
  final case class ClsTotals(nEv: Double, nNonEv: Double) extends Totals
  final case class RegTotals(gMean: Double, nTot: Double) extends Totals
  final case class McTotals(counts: Map[Long, Double]) extends Totals

  def totalsOf(df: DataFrame, target: String, task: Task): Totals = {
    val y = col(target).cast("double")
    task match {
      case Task.Regression =>
        val t = df.agg(avg(y), count(lit(1)).cast("double")).head()
        RegTotals(t.getDouble(0), t.getDouble(1))
      case Task.Classification =>
        val t = df.agg(sum(y).as("s"), count(lit(1)).cast("double").as("n")).head()
        ClsTotals(t.getDouble(0), t.getDouble(1) - t.getDouble(0))
      case Task.MultiClass =>
        McTotals(df.groupBy(col(target).cast("long").as("c"))
          .agg(count(lit(1)).cast("double").as("n")).collect()
          .map(r => r.getLong(0) -> r.getDouble(1)).toMap)
    }
  }

  /** Joint IV of (kept ++ candidate) for EVERY candidate in ONE
    * aggregation job (all three tasks): explode (candidateIdx, bin)
    * pairs alongside the kept-bin tuple, aggregate per
    * (candidate, kept-bins, bin), then sum each candidate's IV terms —
    * all in Spark, so only #candidates rows come back to the driver.
    * This is what makes the greedy WALK (not just the ranking) O(jobs
    * per accept) instead of O(jobs per candidate): each rejected
    * candidate previously paid its own two-job `classification()`
    * call against the same kept set.
    */
  def jointIvs(
      df: DataFrame,
      kept: Seq[String],
      candidates: Seq[String],
      target: String,
      task: Task): Map[String, Double] =
    jointIvs(df, kept, candidates, target, task, totalsOf(df, target, task))

  def jointIvs(
      df: DataFrame,
      kept: Seq[String],
      candidates: Seq[String],
      target: String,
      task: Task,
      totals: Totals): Map[String, Double] = {
    val y = col(target).cast("double")
    val keptKey: Column =
      if (kept.isEmpty) lit(0L) else struct(kept.map(col): _*)
    val pairs = df.select(
      posexplode(array(candidates.map(c => col(c).cast("long")): _*)).as(Seq("fi", "bin")) ,
      keptKey.as("kk"), y.as("y"))

    val (perBinAggs: Seq[Column], ivSum: Column) = totals match {
      case RegTotals(gMean, nTot) =>
        (Seq(count(lit(1)).cast("double").as("n"), avg("y").as("m")),
          abs(col("m") - gMean) * col("n") / nTot)
      case ClsTotals(nEv, nNonEv) =>
        if (nEv == 0 || nNonEv == 0) return candidates.map(_ -> 0.0).toMap.withDefaultValue(0.0)
        (Seq(count(lit(1)).cast("double").as("n"), sum("y").as("s")),
          classificationIvTerm(col("n"), col("s"), nEv, nNonEv))
      case McTotals(counts) =>
        // one-vs-rest per class, summed: the per-class bin sums are
        // extra agg columns and the per-class terms one summed column
        val classes = counts.keys.toSeq.sorted
        val nTot = counts.values.sum
        val terms = classes.flatMap { c =>
          val nEv = counts(c); val nNonEv = nTot - nEv
          if (nEv == 0 || nNonEv == 0) None
          else Some(classificationIvTerm(col("n"), col(s"s_$c"), nEv, nNonEv))
        }
        if (terms.isEmpty) return candidates.map(_ -> 0.0).toMap.withDefaultValue(0.0)
        // truncating match (y.cast(long) === c), the SAME normalization
        // the class counts above use — an exact-double match would
        // silently drop non-integral labels from the bin sums only
        (count(lit(1)).cast("double").as("n") +:
           classes.map(c => sum(when(col("y").cast("long") === c, 1.0).otherwise(0.0)).as(s"s_$c")),
          terms.reduce(_ + _))
    }
    pairs.groupBy("fi", "kk", "bin")
      .agg(perBinAggs.head, perBinAggs.tail: _*)
      .groupBy("fi").agg(sum(ivSum).as("iv"))
      .collect()
      .map(r => candidates(r.getInt(0)) -> r.getDouble(1))
      .toMap
      .withDefaultValue(0.0)
  }

}
