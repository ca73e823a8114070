package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

sealed trait Task
object Task {
  case object Regression extends Task
  case object Classification extends Task
  case object MultiClass extends Task
}

/** Greedy Information-Value feature selection
  * (ref: src/optimizer.py:175-231).
  *
  * Driver loop; every iteration is one IV aggregation job over the
  * cached encoded DataFrame. Candidates are ranked by single-feature IV
  * descending (ties: candidate order — np.argsort stability, SURVEY
  * §7.4 risk #3); a candidate joins the index if joint IV improves by
  * more than `tolerance` (1.002x, optimizer.py:195-198); the final
  * ordering sorts the kept set by bin count ascending to shrink the
  * key space (optimizer.py:210-211).
  */
object GreedySelector {
  final case class Result(features: Seq[String], iv: Double, singleIvs: Map[String, Double])

  def select(
      encoded: DataFrame,
      candidates: Seq[String],
      numBins: Map[String, Int],
      target: String,
      task: Task,
      tolerance: Double = 1.002,
      maxFeatures: Int = Int.MaxValue,
      maxCandidates: Int = Int.MaxValue
  ): Result = {
    def ivOf(cols: Seq[String]): Double = task match {
      case Task.Regression     => IV.regression(encoded, cols.map(col), col(target))
      case Task.Classification => IV.classification(encoded, cols.map(col), col(target))
      case Task.MultiClass     => IV.multiclass(encoded, cols.map(col), col(target))
    }

    // single-feature ranking: ONE batched job for binary/regression
    // (IV.singleFeatureIvs); multi-class keeps per-feature jobs (the
    // one-vs-rest decomposition doesn't batch the same way).
    val single: Seq[(String, Double)] = task match {
      case Task.MultiClass => candidates.map(f => f -> ivOf(Seq(f)))
      case _ =>
        val m = IV.singleFeatureIvs(encoded, candidates, target, task)
        candidates.map(f => f -> m(f))
    }
    // stable sort: descending IV, ties keep candidate order. The walk
    // below costs ONE joint-IV job per candidate (accepted or not), so
    // at MNIST width the ranked list is capped: only the `maxCandidates`
    // best single-IV features are considered (the single-IV ranking
    // itself is one batched job over ALL candidates).
    val ranked = single.sortBy { case (_, iv) => -iv }.map(_._1).take(maxCandidates)

    var kept    = Vector.empty[String]
    var current = 0.0
    ranked.foreach { f =>
      if (kept.size < maxFeatures) {
        val joint = ivOf(kept :+ f)
        if (kept.isEmpty || joint > tolerance * current) {
          kept = kept :+ f
          current = joint
        }
      }
    }
    // re-order by bin count asc (stable: ties keep greedy order)
    val ordered = kept.sortBy(f => numBins.getOrElse(f, Int.MaxValue))
    Result(ordered, current, single.toMap)
  }
}
