package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ArgTop1 must be EXACTLY `min_by(struct(id, score), struct(-adj,
  * id))` — max adj wins, ties to min id, with Spark's double ordering
  * (NaN largest in the min ordering so NaN loses to any number; -0.0
  * and 0.0 distinct in Double.compare, folded by negation symmetry) —
  * and must plan as ObjectHashAggregate, never Sort + SortAggregate
  * (the 55x/decade t_embed_quantize defect the r15 text spot caught).
  */
class ArgTop1Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def both(rows: Seq[(Long, Double, Long, Long)]) = {
    import spark.implicits._
    val df = rows.toDF("g", "adj", "id", "score")
    val kernel = df.groupBy("g")
      .agg(graft.plans.ArgTop1.column(col("adj"), col("id"), col("score")).as("t"))
      .select(col("g"), col("t.n_id"), col("t.score"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val minBy = df.groupBy("g")
      .agg(min_by(struct(col("id").as("n_id"), col("score")),
        struct(-col("adj"), col("id"))).as("t"))
      .select(col("g"), col("t.n_id"), col("t.score"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    (kernel, minBy)
  }

  test("equals min_by on ties, negatives, NaN, -0.0, multi-group") {
    val rows = Seq(
      (1L, 5.0, 10L, 100L), (1L, 5.0, 3L, 200L), (1L, 4.0, 1L, 300L),
      (2L, -7.5, 8L, 1L), (2L, -2.5, 9L, 2L),
      (3L, Double.NaN, 1L, 1L), (3L, 0.0, 2L, 2L),
      (4L, Double.NaN, 5L, 5L), (4L, Double.NaN, 4L, 6L),
      (5L, -0.0, 1L, 1L), (5L, 0.0, 2L, 2L),
      (6L, 1.0 / 3.0, 7L, 7L), (6L, 0.33333333333333337, 8L, 8L))
    val (kernel, minBy) = both(rows)
    assert(kernel == minBy)
    // and the intended reading: max adj, tie -> min id
    assert(kernel.contains((1L, 3L, 200L)))
    assert(kernel.contains((2L, 9L, 2L)))
    assert(kernel.contains((3L, 2L, 2L))) // NaN loses to a number
  }

  test("plans as ObjectHashAggregate, not SortAggregate") {
    import spark.implicits._
    val df = (1 to 1000).map(i => ((i % 7).toLong, i.toDouble, i.toLong, i.toLong))
      .toDF("g", "adj", "id", "score")
      .groupBy("g")
      .agg(graft.plans.ArgTop1.column(col("adj"), col("id"), col("score")).as("t"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(800))
    assert(!plan.contains("SortAggregate"), plan.take(800))
  }

  test("null ordering keys are skipped; empty group yields null struct") {
    import spark.implicits._
    val df = Seq[(Long, Option[Double], Long, Long)](
      (1L, None, 1L, 1L), (1L, Some(2.0), 2L, 2L), (2L, None, 3L, 3L))
      .toDF("g", "adj", "id", "score")
      .groupBy("g")
      .agg(graft.plans.ArgTop1.column(col("adj"), col("id"), col("score")).as("t"))
      .collect().map(r => (r.getLong(0), r.isNullAt(1))).toMap
    assert(df == Map(1L -> false, 2L -> true))
  }
}
