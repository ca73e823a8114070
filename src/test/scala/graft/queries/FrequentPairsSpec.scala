package graft.queries

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The t_frequent_pairs basket cap (VERDICT r9 #3): the cap must be
  * enforced in-plan, never bind on the synthetic corpus at MaxBasket,
  * and keep the top-k deterministic and bounded when it DOES bind.
  */
class FrequentPairsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def items = Tables.lineitem(spark, sf)
    .select(col("l_orderkey"), col("l_partkey")).distinct()

  test("MaxBasket cap does not bind on the synthetic corpus: capped == uncapped") {
    val maxBasket = items.groupBy("l_orderkey").count()
      .agg(max("count")).head().getLong(0)
    assert(maxBasket <= ExtraQueries.MaxBasket,
      s"corpus basket $maxBasket exceeds MaxBasket — the equality test is vacuous")
    val capped = ExtraQueries.frequentPairs(items, ExtraQueries.MaxBasket).collect()
    val uncapped = ExtraQueries.frequentPairs(items, Int.MaxValue).collect()
    assert(capped.toSeq == uncapped.toSeq)
  }

  test("a binding cap truncates every basket and keeps the top-k stable") {
    val cap = 3
    val capped = ExtraQueries.frequentPairs(items, cap)
    // every surviving pair references only the cap lowest partkeys of
    // its baskets: re-derive the capped item set and check support
    // by brute force on the driver (sf0.001 is tiny)
    val kept = items
      .withColumn("bk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("l_orderkey").orderBy("l_partkey")))
      .filter(col("bk") <= cap)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = kept.groupBy(_._1).map { case (_, v) => v.map(_._2).sorted.toSeq }
    assert(byOrder.forall(_.length <= cap), "a basket survived above the cap")
    val expected = byOrder.toSeq
      .flatMap(parts => for { a <- parts; b <- parts if a < b } yield (a, b))
      .groupBy(identity).map { case (k, v) => (k, v.size.toLong) }.toSeq
      .sortBy { case ((a, b), s) => (-s, a, b) }.take(100)
    val got = capped.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toSeq
    assert(got == expected)
    // determinism: a second run returns the identical top-k
    assert(ExtraQueries.frequentPairs(items, cap).collect().toSeq
      == capped.collect().toSeq)
  }

  test("a pathological mega-basket is capped in-plan: cap lowest keys, cap^2/2 pairs") {
    import spark.implicits._
    val cap = 8
    // one 50k-item basket (with duplicates), plus a small normal basket
    val mega = (0 until 50000).map(i => (1L, (50000 - i).toLong)) ++
      Seq((1L, 3L), (1L, 5L)) // duplicates of in-cap keys
    val small = Seq((2L, 100L), (2L, 101L))
    val items = (mega ++ small).toDF("l_orderkey", "l_partkey")
    val got = ExtraQueries.frequentPairs(items, cap).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // mega basket contributes exactly C(cap, 2) pairs over its cap
    // LOWEST partkeys 1..8; the small basket one pair — support all 1
    val expectMega = for { a <- 1L to cap; b <- (a + 1) to cap } yield (a, b, 1L)
    val expect = (expectMega :+ ((100L, 101L, 1L)))
      .sortBy { case (a, b, s) => (-s, a, b) }.take(100)
    assert(got.toSeq == expect.toSeq)
  }
}
