package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Pins the SQ8 winner-gap diagnostic ([[IvfQueries.sq8WinnerGap]],
  * the Bench `ivf_sq8_winner_cos_gap_*` rows behind the 100x-corpus
  * recall story): the gap measures how far SQ8's chosen neighbor is
  * from the true winner in EXACT cosine, so it must be consistent
  * with the declared recall row and non-negative by construction.
  */
class Sq8GapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  test("sq8WinnerGap agrees with the declared recall row and bounds the miss cost") {
    val declared = IvfQueries.defs("x_ann_ivf_sq8")(spark, d).head()
      .getAs[Double]("recall_at_1")
    val (recall, gMean, gMax) = IvfQueries.sq8WinnerGap(spark, d)
    assert(recall == declared,
      s"diagnostic recall $recall must equal the declared row's $declared")
    // bf_cos is the maximum exact cosine any candidate can reach, so
    // the winner's gap is >= 0; a hit contributes exactly 0
    assert(gMean >= 0.0 && gMax >= gMean,
      s"gap stats inconsistent: mean=$gMean max=$gMax")
    // every miss costs at most the full cosine range (the 2.0
    // empty-probe sentinel included), so mean_gap <= 2 * miss_rate
    assert(gMean <= 2.0 * (1.0 - recall) + 1e-12,
      s"mean gap $gMean exceeds the possible miss mass at recall $recall")
    if (recall == 1.0)
      assert(gMean == 0.0 && gMax == 0.0, "perfect recall must mean zero gap")
  }
}
