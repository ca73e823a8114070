package graft

import graft.plans.BinIndex
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BinRangeRewrite: the bin_index(x)=k → range-predicate rule must be
  * an EXACT expression equivalence — same rows kept for every bin
  * including the overflow bin's NULL/NaN members, boundary values
  * binned identically, and three-valued logic preserved under NOT.
  */
class BinRangeRewriteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val splits = Array(10.0, 20.0, 30.0)
  private val values: Seq[java.lang.Double] = Seq(
    -1.0, 0.0, -0.0, 9.999, 10.0, 15.0, 19.999, 20.0, 25.0, 30.0, 31.0,
    Double.NaN, null)

  private def df = values.toDF("x")

  test("filter on bin==k keeps exactly the rows BinIndex.lookup assigns to k") {
    val bin = BinIndex.column(col("x"), splits)
    (0L to splits.length.toLong).foreach { k =>
      val kept = df.filter(bin === lit(k)).collect()
        .map(r => if (r.isNullAt(0)) null else r.getDouble(0)).toSet
      val expected = values.filter { v =>
        val b = if (v == null) splits.length.toLong
          else BinIndex.lookup(splits, v)
        b == k
      }.map(v => if (v == null) null else v.doubleValue())
        // NaN != NaN in a Set of doubles — compare via string form
        .map(v => if (v != null && v.asInstanceOf[Double].isNaN) "NaN" else v).toSet
      val keptNorm = kept.map(v =>
        if (v != null && v.asInstanceOf[Double].isNaN) "NaN" else v)
      assert(keptNorm == expected, s"bin $k mismatch")
    }
  }

  test("NOT(bin==k) stays exact for NULL inputs (three-valued logic)") {
    val bin = BinIndex.column(col("x"), splits)
    // NULL binned to overflow (3): NOT(bin==1) must KEEP the null row
    val kept = df.filter(!(bin === lit(1L))).count()
    val expected = values.count { v =>
      val b = if (v == null) splits.length.toLong else BinIndex.lookup(splits, v)
      b != 1L
    }
    assert(kept == expected)
  }

  test("the rewrite fires and no BinIndex survives optimization") {
    val bin = BinIndex.column(col("x"), splits)
    val q = df.filter(bin === lit(2L))
    val opt = q.queryExecution.optimizedPlan
    assert(!opt.expressions.exists(_.exists(_.isInstanceOf[BinIndex])),
      s"BinIndex survived:\n$opt")
  }

  test("out-of-range bins rewrite to false, projection context included") {
    val bin = BinIndex.column(col("x"), splits)
    assert(df.filter(bin === lit(7L)).count() == 0)
    // as a projected boolean: overflow-bin equality is TRUE for null x
    val row = df.select((bin === lit(3L)).as("b"), col("x"))
      .filter(col("x").isNull).head()
    assert(row.getBoolean(0), "null x belongs to the overflow bin in any context")
  }
}
