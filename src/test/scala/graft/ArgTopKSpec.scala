package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ArgTopK must keep EXACTLY the rows (and rn values) of
  * `row_number() OVER (PARTITION BY g ORDER BY ord DESC, id) <= k` —
  * NaN first (Spark's descending double sort), -0.0 folded into 0.0
  * (SPARK-26021 normalization), ties to the smaller id, groups smaller
  * than k returned whole — and must plan as ObjectHashAggregate (the
  * window form sorts its entire input; that sort is the 17x/decade
  * t_embed_knn defect the r15 third-decade text spot caught).
  */
class ArgTopKSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def both(rows: Seq[(Long, Double, Long)], k: Int) = {
    import spark.implicits._
    val df = rows.toDF("g", "ord", "id")
    val kernel = df.groupBy("g")
      .agg(graft.plans.ArgTopK.column(col("ord"), col("id"), col("ord"), k).as("tops"))
      .select(col("g"), posexplode(col("tops")))
      .select(col("g"), col("col.n_id"), col("col.v"), (col("pos") + 1).as("rn"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2)), r.getInt(3))).toSet
    val wnd = Window.partitionBy("g").orderBy(col("ord").desc, col("id"))
    val window = df.withColumn("rn", row_number().over(wnd)).filter(col("rn") <= k)
      .select(col("g"), col("id"), col("ord"), col("rn"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2)), r.getInt(3))).toSet
    (kernel, window)
  }

  test("equals window row_number <= k on ties, NaN, -0.0, short groups") {
    val rows = Seq(
      (1L, 5.0, 10L), (1L, 5.0, 3L), (1L, 4.0, 1L), (1L, 9.0, 7L),
      (1L, 9.0, 8L), (1L, 1.0, 2L), (1L, 8.0, 4L),
      (2L, Double.NaN, 9L), (2L, 100.0, 1L), (2L, 100.0, 0L),
      (3L, -0.0, 5L), (3L, 0.0, 4L), (3L, -1.0, 6L),
      (4L, 42.0, 11L)) // group smaller than k
    val (kernel, window) = both(rows, 3)
    assert(kernel == window)
    // NaN ranks FIRST under ORDER BY ord DESC
    assert(kernel.exists { case (g, id, _, rn) => g == 2L && id == 9L && rn == 1 })
    // -0.0 == 0.0 -> id breaks the tie
    assert(kernel.exists { case (g, id, _, rn) => g == 3L && id == 4L && rn == 1 })
  }

  test("equals window on a 5k-row random slab, k = 5") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 5000).map { i =>
      ((i % 13).toLong, math.floor(rnd.nextDouble() * 50) / 10.0, i.toLong)
    }
    val (kernel, window) = both(rows, 5)
    assert(kernel == window)
  }

  test("plans as ObjectHashAggregate, not Sort + SortAggregate") {
    import spark.implicits._
    val df = (1 to 100).map(i => ((i % 3).toLong, i.toDouble, i.toLong))
      .toDF("g", "ord", "id")
      .groupBy("g")
      .agg(graft.plans.ArgTopK.column(col("ord"), col("id"), col("ord"), 5).as("t"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(800))
    assert(!plan.contains("SortAggregate"), plan.take(800))
  }
}
