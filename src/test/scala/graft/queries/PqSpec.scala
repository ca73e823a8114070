package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Product-quantization ANN (x_ann_pq): the structural invariants the
  * rows-only result rests on — the re-ranked path can only improve on
  * the raw ADC top-1, every query is counted, and the claimed
  * compression arithmetic is consistent with the PQ geometry.
  */
class PqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("x_ann_pq: re-rank dominates raw ADC; row accounts for all queries") {
    val r = IvfQueries.defs("x_ann_pq")(spark, "/root/testdata/sf0.001").head()
    val (m, ksub) = (r.getAs[Int]("m"), r.getAs[Int]("ksub"))
    assert(m * (64 / m) == 64, "subspaces must tile the dimension")
    assert(ksub <= 256, "codes must fit one byte")
    assert(r.getAs[Int]("bytes_pq") == m + 8)
    assert(r.getAs[Long]("n_queries") > 0)
    val (rr, radc) = (r.getAs[Double]("recall_at_1"), r.getAs[Double]("recall_adc"))
    assert(rr >= radc,
      s"exact re-rank of a superset shortlist cannot lose to raw ADC ($rr < $radc)")
    assert(rr >= 0.9, s"re-ranked recall@1 $rr below the production bar")
  }

  test("x_ann_ivf_pq: composed IVFADC serves from pruned cells with bounded loss") {
    val r = IvfQueries.defs("x_ann_ivf_pq")(spark, "/root/testdata/sf0.001").head()
    assert(r.getAs[Long]("n_queries") > 0)
    assert(r.getAs[Long]("bytes_pq") == r.getAs[Long]("m") + 8)
    // the pruning demo must genuinely skip cells (require in-query too)
    assert(r.getAs[Long]("cells_read") < r.getAs[Long]("cells_total"))
    // nprobe=4 of 64 cells can read at most 8·4 distinct directories
    assert(r.getAs[Long]("cells_read") <=
      r.getAs[Long]("demo_n_queries") * r.getAs[Long]("demo_nprobe"))
    // full-set recall can trail the unrestricted-ADC x_ann_pq only by
    // the cell-miss rate; at the tuned nprobe=24 point that is small
    assert(r.getAs[Double]("recall_at_1") >= 0.8,
      s"IVFADC recall@1 ${r.getAs[Double]("recall_at_1")} collapsed")
  }

  test("x_ann_ivf_filtered: pre-filtered search holds recall against the filtered truth") {
    val r = IvfQueries.defs("x_ann_ivf_filtered")(spark, "/root/testdata/sf0.001").head()
    assert(r.getAs[Long]("n_queries") > 0)
    val sel = r.getAs[Double]("selectivity")
    assert(sel > 0.2 && sel < 0.5, s"predicate selectivity $sel drifted from ~1/3")
    assert(r.getAs[Double]("recall_at_1") >= 0.8,
      s"filtered recall@1 ${r.getAs[Double]("recall_at_1")} collapsed — the predicate must " +
        "restrict candidates, not the probe quality")
  }
}

/** The shared probe helper every fitted-ANN query routes through: its
  * (dist, cell) tie order and column carry-through are pinned against a
  * driver-side brute-force recompute, so a one-site edit to the probe
  * cannot silently shift only some queries.
  */
class ProbeCellsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("probeCells returns exactly the nprobe nearest cells in (dist, cell) order") {
    import spark.implicits._
    val centers = Array(
      Array(0.0, 0.0), Array(1.0, 0.0), Array(0.0, 1.0), Array(2.0, 2.0))
    val qs = Seq(
      (0L, Seq(0.1f, 0.0f)),
      (1L, Seq(1.9f, 1.9f)),
      (2L, Seq(0.5f, 0.5f))) // equidistant to cells 1 and 2 -> cell tiebreak
    val q0 = qs.toDF("q_id", "q_emb")
    val out = IvfQueries.probeCells(q0, centers, nprobe = 2)
      .select("q_id", "cell").collect()
      .groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getInt(1)).toSet }
    def brute(emb: Seq[Float], n: Int): Seq[Int] =
      centers.zipWithIndex.map { case (c, k) =>
        (c.zip(emb).map { case (a, b) => (b - a) * (b - a) }.sum.toDouble, k)
      }.sortBy(identity).take(n).map(_._2).toSeq
    qs.foreach { case (id, emb) =>
      assert(out(id) == brute(emb, 2).toSet, s"query $id probed ${out(id)}")
    }
    // the equidistant query must break the (0,0)-vs-(1,0)/(0,1) tie by
    // the LOWER cell id deterministically
    assert(out(2L).contains(0) || out(2L).contains(1),
      s"tie order broke: ${out(2L)}")
    // carry-through: every input column survives
    val cols = IvfQueries.probeCells(q0, centers, 1).columns.toSeq
    assert(cols == Seq("q_id", "q_emb", "cell"), cols.toString)
  }
}
