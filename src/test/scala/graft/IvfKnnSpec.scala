package graft

import graft.plans.{IvfKnnRef, KnnRef}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalatest.funsuite.AnyFunSuite

/** The IVF-probed kNN kernel must be EXACTLY the brute-force
  * [[KnnRef]] vote restricted to the probed cells' members — same
  * (distance asc, label asc) ranking, same majority-ties-to-smallest,
  * same NaN/short-group handling. Two pins:
  * 1. nprobe = C (probe everything) makes the IVF vote IDENTICAL to
  *    KnnRef on every query, whatever the cell assignment — the
  *    approximation must live only in the probe, never in the vote.
  * 2. Engineered partial-probe cases check the probe rule itself
  *    (centroid ties to the smaller index; probed cells with fewer
  *    than k members vote over the filled prefix).
  */
class IvfKnnSpec extends AnyFunSuite {

  private def arr(xs: Double*): GenericArrayData = new GenericArrayData(xs.toArray)

  // deterministic little corpus: 24 points on a line, label = parity
  private val feats = Array.tabulate(24)(i => Array(i.toDouble, (i * 7 % 5).toDouble))
  private val labels = Array.tabulate(24)(i => (i % 2).toDouble)
  private val cents = Array(Array(2.0, 2.0), Array(12.0, 2.0), Array(21.0, 2.0))
  private val cellOf = feats.map { f =>
    cents.zipWithIndex.minBy { case (c, i) =>
      (math.pow(f(0) - c(0), 2) + math.pow(f(1) - c(1), 2), i)
    }._2
  }

  test("full probe (nprobe = C) is bitwise the brute-force vote") {
    val exact = new KnnRef(feats, labels, 5, regression = false)
    val ivf = new IvfKnnRef(feats, labels, 5, cents, cellOf, nprobe = cents.length)
    for (i <- 0 until 40) {
      val q = arr(i * 0.7 - 2.0, (i % 6).toDouble)
      val e = exact.vote(q, xFloat = false)
      val a = ivf.vote(q, xFloat = false)
      assert(java.lang.Double.compare(e, a) == 0, s"query $i: exact $e vs ivf $a")
    }
  }

  test("partial probe scans only the probed cells' members") {
    // one point per cell, k = 3 but only 1 candidate reachable with
    // nprobe = 1 -> vote over the filled prefix (that point's label)
    val f = Array(Array(0.0), Array(10.0), Array(20.0))
    val l = Array(1.0, 0.0, 1.0)
    val c = Array(Array(0.0), Array(10.0), Array(20.0))
    val ivf = new IvfKnnRef(f, l, 3, c, Array(0, 1, 2), nprobe = 1)
    assert(ivf.vote(arr(1.0), xFloat = false) == 1.0)  // nearest cell 0
    assert(ivf.vote(arr(9.0), xFloat = false) == 0.0)  // nearest cell 1
  }

  test("centroid-distance tie probes the smaller cell index") {
    // query equidistant from centroids 0 and 1; nprobe = 1 must pick 0
    val f = Array(Array(0.0), Array(10.0))
    val l = Array(1.0, 0.0)
    val c = Array(Array(0.0), Array(10.0))
    val ivf = new IvfKnnRef(f, l, 1, c, Array(0, 1), nprobe = 1)
    assert(ivf.vote(arr(5.0), xFloat = false) == 1.0)
  }

  test("all-NaN query yields NaN (no phantom class)") {
    val ivf = new IvfKnnRef(feats, labels, 5, cents, cellOf, nprobe = 2)
    assert(ivf.vote(arr(Double.NaN, Double.NaN), xFloat = false).isNaN)
  }
}
