package graft

import graft.plans.{ShardBounds, ShardSearch}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** The literal-bounds shard search behind distributionWindows: its
  * ordering must be EXACTLY Spark's (UTF8String binary strings, NaN
  * largest and self-equal, -0.0 == 0.0), and search must return
  * #bounds <= key for any bound set — the pid algebra (prefix sums
  * keyed on pid) is only correct if every row lands in the shard its
  * key orders into, under interpreted eval AND codegen.
  */
class ShardSearchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def mkBounds(rows: Seq[(String, Double, Long, Long)]): ShardBounds =
    ShardSearch.bounds(rows.map { case (g, q, ok, ln) => Row(g, q, ok, ln) })

  /** Reference comparator with Spark's semantics. */
  private def sparkLt(a: (String, Double, Long, Long), b: (String, Double, Long, Long)): Boolean = {
    val c0 = UTF8String.fromString(a._1).compareTo(UTF8String.fromString(b._1))
    if (c0 != 0) return c0 < 0
    val c1 = java.lang.Double.compare(a._2 + 0.0, b._2 + 0.0)
    if (c1 != 0) return c1 < 0
    if (a._3 != b._3) return a._3 < b._3
    a._4 < b._4
  }

  private val rnd = new scala.util.Random(4242)
  private val specials =
    Array(0.0, -0.0, Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity)
  private val groups = Array("A", "B", "N", "R", "", "zz")
  private def randKey(): (String, Double, Long, Long) = (
    groups(rnd.nextInt(groups.length)),
    if (rnd.nextBoolean()) rnd.nextDouble() * 10 - 5 else specials(rnd.nextInt(5)),
    rnd.nextLong() % 4,
    rnd.nextInt(3).toLong)

  test("search == #bounds <= key under Spark ordering (sampled bounds + keys)") {
    for (_ <- 1 to 300) {
      val sorted = Seq.fill(40)(randKey()).distinct.sortWith(sparkLt)
      val b = mkBounds(sorted)
      val k = randKey()
      val want = sorted.count(bd => !sparkLt(k, bd)) // bd <= k
      val got = b.search(UTF8String.fromString(k._1), k._2, k._3, k._4)
      assert(got == want, s"key=$k got=$got want=$want bounds=$sorted")
    }
  }

  test("-0.0 and NaN: bit-variant keys shard identically") {
    val b = mkBounds(Seq(("A", 0.0, 0L, 0L), ("A", Double.NaN, 0L, 0L)))
    val g = UTF8String.fromString("A")
    // -0.0 must be >= the 0.0 bound (Spark: -0.0 == 0.0)
    assert(b.search(g, -0.0, 0L, 0L) == b.search(g, 0.0, 0L, 0L))
    // NaN is largest AND equal to itself: lands at-or-above the NaN bound
    assert(b.search(g, Double.NaN, 0L, 0L) == 2)
    assert(b.search(g, Double.PositiveInfinity, 0L, 0L) == 1)
  }

  test("expression agrees with the reference count in codegen plans") {
    import spark.implicits._
    // (-0.0 is exercised in the direct ShardBounds test above: Spark's
    // UnsafeRow writers normalize -0.0 to 0.0, so a DF round trip
    // cannot carry the bit pattern)
    val keys = Seq(
      ("A", 1.0, 1L, 1L), ("A", 1.0, 1L, 2L), ("B", -0.25, 0L, 0L),
      ("B", 0.0, 0L, 0L), ("N", Double.NaN, 5L, 1L), ("", -3.5, -1L, 0L))
    val boundKeys = Seq(("A", 1.0, 1L, 2L), ("B", 0.0, 0L, 0L), ("N", 2.0, 0L, 0L))
      .sortWith(sparkLt)
    val b = mkBounds(boundKeys)
    val df = keys.zipWithIndex.map { case ((g, q, ok, ln), i) => (i, g, q, ok, ln) }
      .toDF("id", "l_returnflag", "l_quantity", "l_orderkey", "l_linenumber")
    val got = df.select(col("id"),
        ShardSearch.column(col("l_returnflag"), col("l_quantity"),
          col("l_orderkey"), col("l_linenumber"), b).as("pid"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    keys.zipWithIndex.foreach { case (k, i) =>
      val want = boundKeys.count(bd => !sparkLt(k, bd))
      assert(got(i) == want, s"key $k")
    }
  }

  test("null input fails LOUDLY in both interpreted eval and codegen (ADVICE r13)") {
    import spark.implicits._
    // pre-r14 divergence: interpreted eval NPE'd on a null child while
    // codegen silently fed the slot default (-1.0/0) into search() and
    // produced a wrong pid. Both modes must now throw the contract
    // violation. The nullable-string column comes from a real DF so
    // the codegen path actually emits the guard.
    val b = mkBounds(Seq(("A", 0.0, 0L, 0L)))
    val df = Seq((Option.empty[String], 1.0, 1L, 1L), (Some("A"), 1.0, 1L, 1L))
      .toDF("l_returnflag", "l_quantity", "l_orderkey", "l_linenumber")
    val probe = df.select(ShardSearch.column(col("l_returnflag"),
      col("l_quantity"), col("l_orderkey"), col("l_linenumber"), b).as("pid"))
    val e = intercept[Throwable](probe.collect())
    def chain(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: chain(t.getCause)
    assert(chain(e).exists(c => c.isInstanceOf[IllegalArgumentException] &&
        c.getMessage != null && c.getMessage.contains("non-null contract")),
      s"expected the loud contract violation, got: $e")
    // interpreted eval: same exception class + message
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.StringType
    val raw = ShardSearch(Literal(null, StringType), Literal(1.0),
      Literal(1L), Literal(1L), b)
    val e2 = intercept[IllegalArgumentException](
      raw.eval(org.apache.spark.sql.catalyst.InternalRow.empty))
    assert(e2.getMessage.contains("non-null contract"))
  }

  test("shard assignment is monotone: sorted keys get non-decreasing pids") {
    val keys = Seq(("A", -1.0, 0L, 0L), ("A", 0.0, 0L, 0L), ("A", 0.0, 1L, 0L),
      ("B", -0.5, 2L, 1L), ("B", Double.NaN, 0L, 0L), ("R", 2.0, 9L, 9L))
    val b = mkBounds(Seq(("A", 0.0, 0L, 5L), ("B", -0.5, 2L, 1L), ("B", 3.0, 0L, 0L)))
    val pids = keys.map(k => b.search(UTF8String.fromString(k._1), k._2, k._3, k._4))
    assert(pids == pids.sorted, s"pids $pids not monotone over sorted keys")
  }
}
