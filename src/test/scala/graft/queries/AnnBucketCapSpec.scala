package graft.queries

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the two regimes of the SRP-bucket occupancy cap
  * ([[TextQueries.annBucketTop1]]) that the gate oracle can't reach:
  * the cap must BIND on an adversarial mega-bucket (the near-dup-rich
  * crawl shape that measured t_ann_bucket_top1 at 37.5x per 10x decade
  * before the cap), and must be an exact no-op when every bucket is
  * under it (which is why the uncapped oracle stays bitwise at the
  * gate SFs). */
class AnnBucketCapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def frame(rows: Seq[(Long, Array[Float], Long)]) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "bucket")
      .withColumn("nsq", graft.functions.Fns.normSq(col("embedding")))
  }

  test("binding cap: mega-bucket splits by the Knuth hash, top-1 taken per sub-bucket") {
    // 300 identical embeddings in ONE bucket — all-identical crawl
    // boilerplate. Uncapped pair work is n(n-1) = 89,700; cap=50 splits
    // into 6 sub-buckets so pair work is bounded by ~n*cap.
    val n = 300
    val cap = 50
    val emb = Array.tabulate(64)(i => if (i == 0) 1.0f else 0.0f)
    val e = frame((0 until n).map(i => (i.toLong, emb, 7L)))
    val got = TextQueries.annBucketTop1(e, cap).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

    // expectation from the same sub-bucket arithmetic: every in-sub
    // pair has cos 1.0, so min_by's (-cos, n_id) tie-break picks the
    // smallest OTHER id in the query's sub-bucket; singleton sub-bucket
    // members emit no row (their candidate set is empty).
    val nSub = (n + cap - 1) / cap
    val groups = (0L until n.toLong)
      .groupBy(id => (id * graft.functions.Hashing.Mult) % graft.functions.TextHash.P % nSub)
      .values.toSeq
    val expected = groups.flatMap { g =>
      if (g.size < 2) Nil
      else g.map(q => q -> g.filter(_ != q).min)
    }.toMap
    assert(expected.nonEmpty && groups.size == nSub, s"hash must spread over $nSub sub-buckets")
    assert(got.keySet == expected.keySet,
      s"row per non-singleton member: got ${got.size}, expected ${expected.size}")
    expected.foreach { case (q, nId) =>
      assert(got(q)._1 == nId, s"q=$q: neighbor must come from its OWN sub-bucket")
      assert(math.abs(got(q)._2 - 1.0) < 1e-12, s"q=$q: identical vectors cos 1.0")
    }
  }

  test("non-binding cap: output identical to the uncapped bucket-wide top-1") {
    // distinct directions spread over 7 buckets, every bucket far under
    // AnnBucketCap — the gate-SF regime. Capped and effectively-uncapped
    // runs must agree row-for-row (this is the oracle contract).
    val rows = (0 until 120).map { i =>
      val a = Array.fill(64)(0.0f)
      a(i % 32) = 1.0f; a(32 + i % 16) = 0.5f + (i % 5) * 0.1f
      (i.toLong, a, (i % 7).toLong)
    }
    val e = frame(rows).cache()
    def run(cap: Int) = TextQueries.annBucketTop1(e, cap).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(run(TextQueries.AnnBucketCap).toSeq == run(Int.MaxValue).toSeq,
      "cap above every bucket size must be a bitwise no-op")
  }
}
