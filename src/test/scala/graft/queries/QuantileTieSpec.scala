package graft.queries

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial pin of [[AnalyticsQueries.sortedQuantiles]] (the
  * bounded-state exact-quantile form behind p10_winsorize / a18_mad /
  * w5_percentile) bitwise against Spark's own exact `percentile`
  * aggregate, on exactly the shapes the gate data never stresses
  * (VERDICT r10 Next #8):
  *  - tie runs so wide that BOTH bracketing positions of an interior p
  *    fall inside ONE compressed (value, cnt) row with frac != 0 —
  *    the interpolation then computes v·(1-f) + v·f, which is only
  *    correct because the engine agg computes the same unconditional
  *    expression (a short-circuiting engine would differ in the last
  *    ulp for v where v·(1-f) + v·f rounds away from v);
  *  - the p = 1.0 / p = 0.0 edges (hi row absent → coalesce to lo);
  *  - n = 1 and all-values-equal groups (every p degenerates);
  *  - values whose products are inexact (0.1, 1/3, pi-ish doubles). */
class QuantileTieSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val ps = Seq(0.0 -> "q000", 0.05 -> "q005", 0.25 -> "q025",
    0.5 -> "q050", 0.95 -> "q095", 1.0 -> "q100")

  test("sortedQuantiles is bitwise the engine percentile agg on tie-heavy edges") {
    import spark.implicits._
    val rows =
      // A: one giant tie run of an inexact double flanked by singletons
      // — every interior p brackets inside the run with frac != 0
      (Seq(0.05) ++ Seq.fill(97)(0.1) ++ Seq(0.3)).map(("A", _)) ++
      // B: n = 1
      Seq(("B", 1.0 / 3.0)) ++
      // C: all equal, inexact
      Seq.fill(13)(("C", math.Pi)) ++
      // D: two distinct values, odd split — p050 brackets ACROSS rows
      (Seq.fill(7)(1.0 / 3.0) ++ Seq.fill(6)(2.0 / 3.0)).map(("D", _)) ++
      // E: alternating short tie runs of inexact doubles
      (0 until 60).map(i => ("E", (i % 5).toDouble / 7.0))
    val df = rows.toDF("g", "v")

    val got = AnalyticsQueries.sortedQuantiles(df, "g", "v", ps)
      .collect().map(r => r.getString(0) -> ps.indices.map(i => r.getDouble(i + 1)))
      .toMap
    val want = df.groupBy("g")
      .agg(ps.map { case (p, n) => expr(s"percentile(v, $p)").as(n) }.head,
        ps.map { case (p, n) => expr(s"percentile(v, $p)").as(n) }.tail: _*)
      .collect().map(r => r.getString(0) -> ps.indices.map(i => r.getDouble(i + 1)))
      .toMap

    assert(got.keySet == want.keySet)
    for (g <- want.keySet; i <- ps.indices) {
      val (gv, wv) = (got(g)(i), want(g)(i))
      assert(java.lang.Double.doubleToLongBits(gv) ==
        java.lang.Double.doubleToLongBits(wv),
        s"group $g ${ps(i)._2}: got $gv want $wv (bitwise)")
    }
  }
}
