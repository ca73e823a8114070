package graft.queries

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 scale operators: BPE pair counting, int8 embedding
  * quantization, the bucketed range join, and the bloom-pruned join.
  * Each spec pins the operator against an independent formulation on
  * sf0.001 (the oracle gate re-checks against DuckDB at sf0.01).
  */
class ScaleOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("t_bpe_pair_counts: pair tf sums to Σ(len-1) and the top pair beats a window recount") {
    val out = TextQueries.defs("t_bpe_pair_counts")(spark, sf).cache()
    val rows = out.collect()
    assert(rows.length == 100)
    // every pair's df <= tf, and the list is sorted (tf desc, pair)
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(1), s"df>tf in $r"))
    val tfs = rows.map(r => (r.getLong(1), r.getString(0)))
    assert(tfs.sameElements(tfs.sortBy { case (tf, p) => (-tf, p) }), "not (tf desc, pair)-sorted")
    // independent recount of the #1 pair via a position self-join
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
    val expected = docs.as("a").join(docs.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("b.pos") === col("a.pos") + 1)
      .select(concat(col("a.tok"), lit(" "), col("b.tok")).as("pair"))
      .filter(col("pair") === rows.head.getString(0)).count()
    assert(rows.head.getLong(1) == expected, "top-pair tf disagrees with the positional recount")
  }

  test("t_embed_quantize: codes bounded by ±127 and quantized top-1 mostly agrees with exact") {
    val out = IvfQueries.defs("t_embed_quantize")(spark, sf).cache()
    val n = out.count()
    assert(n == 100, s"expected 100 query rows, got $n")
    // int8 range: |score| <= 127*127*64
    val maxScore = out.agg(max(abs(col("q8_score")))).head().getLong(0)
    assert(maxScore <= 127L * 127L * 64L, s"score $maxScore exceeds the int8 bound")
    // quantization is nearly lossless on unit vectors: agreement >= 90%
    val agree = out.agg(sum(col("agree"))).head().getLong(0)
    assert(agree >= 90, s"quantized top-1 agrees on only $agree/100 queries")
  }

  test("j10_range_join: bucketed counts equal the naive range self-join") {
    val out = RelationalQueries.defs("j10_range_join")(spark, sf)
    val e = graft.Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts").cast("timestamp")).as("us"))
    val naive = e.as("a").crossJoin(e.select(col("us").as("n_us")))
      .filter(abs(col("us") - col("n_us")) <= 300000000L)
      .groupBy("event_id").agg(count(lit(1)).as("n_naive"))
    val diff = out.join(naive, "event_id")
      .filter(col("n_within") =!= col("n_naive")).count()
    assert(diff == 0, "bucketed range join disagrees with the naive formulation")
    assert(out.count() == e.count(), "self-pair must make the join total over events")
  }

  test("t_bm25_search: top-1 score matches a driver-side recompute from raw counts") {
    val out = TextQueries.defs("t_bm25_search")(spark, sf).collect()
    assert(out.length == 10)
    assert(out.forall(_.getLong(1) >= 1), "every hit must match >= 1 query term")
    val scores = out.map(_.getDouble(2))
    assert(scores.sameElements(scores.sorted.reverse), "not score-desc ordered")
    // independent recompute of the #1 doc's score from raw token counts
    val terms = Seq("join", "vector", "stream")
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("toks")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1))
    val nDocs = docs.length.toLong
    val avgdl = docs.map(_._2.length.toLong).sum.toDouble / nDocs.toDouble
    val dfm = terms.map(t => t -> docs.count(_._2.contains(t)).toLong).toMap
    val (topId, topToks) = docs.find(_._1 == out.head.getLong(0)).get
    val expected = terms.map { t =>
      val tf = topToks.count(_ == t).toDouble
      if (tf == 0) 0.0
      else ((nDocs - dfm(t)).toDouble + 0.5) / (dfm(t).toDouble + 0.5) *
        (tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * (topToks.length.toDouble / avgdl))))
    }.sum
    assert(math.abs(out.head.getDouble(2) - expected) < 1e-12,
      s"doc $topId: got ${out.head.getDouble(2)}, recomputed $expected")
  }

  test("SQ8 kernels match the interpreted HOF formulation bitwise (absMax, codes, int/adc dots)") {
    val tv = graft.plans.TextVectorExprs
    val e = graft.Tables.embeddings(spark, sf)
      .withColumn("amax_hof", expr("array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE))))"))
      .withColumn("amax_k", tv.absMax(col("embedding")))
      .withColumn("amax0", when(col("amax_hof") === 0.0, lit(1.0)).otherwise(col("amax_hof")))
      .withColumn("q_hof",
        expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 127.0D / amax0 + 0.5D) AS BIGINT))"))
      .withColumn("q_k", tv.sq8Codes(col("embedding")))
      .cache()
    assert(e.filter(col("amax_hof") =!= col("amax_k")).count() == 0, "absMax differs")
    assert(e.filter(expr("q_hof != q_k")).count() == 0, "sq8 codes differ")
    val pairs = e.select(col("vec_id"), col("q_k"), col("embedding")).limit(20)
      .crossJoin(e.select(col("q_k").as("nq"), col("embedding").as("n_emb")).limit(20))
    val dotDiff = pairs
      .withColumn("i_hof", expr("aggregate(zip_with(q_k, nq, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"))
      .withColumn("i_k", tv.intDot(col("q_k"), col("nq")))
      .withColumn("a_hof", expr(
        "aggregate(zip_with(embedding, nq, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0.0D, (acc, v) -> acc + v)"))
      .withColumn("a_k", tv.adcDot(col("embedding"), col("nq")))
      .filter(col("i_hof") =!= col("i_k") ||
        expr("a_hof != a_k AND NOT (isnan(a_hof) AND isnan(a_k))"))
      .count()
    assert(dotDiff == 0, "dot kernels differ from the HOF folds")
  }

  test("analytics trio: funnel steps are monotone, cohorts cover all users, pair support >= 1") {
    val f = ExtraQueries.defs("t_funnel_steps")(spark, sf).head()
    assert(f.getLong(0) >= f.getLong(1) && f.getLong(1) >= f.getLong(2),
      s"funnel steps must be non-increasing: $f")
    val cohorts = ExtraQueries.defs("t_retention_cohorts")(spark, sf)
    val cohortUsers = cohorts.filter(col("day_offset") === 0)
      .agg(sum("active_users")).head().getLong(0)
    val totalUsers = graft.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(cohortUsers == totalUsers,
      s"every user must appear in their cohort's day-0 row: $cohortUsers != $totalUsers")
    assert(cohorts.filter(col("day_offset") < 0).count() == 0, "negative day offset")
    val pairs = ExtraQueries.defs("t_frequent_pairs")(spark, sf).collect()
    assert(pairs.forall(r => r.getLong(2) >= 1 && r.getLong(0) < r.getLong(1)),
      "pair rows must be ordered (a < b) with support >= 1")
  }

  test("StreamOps.funnel: the CEP state machine honors strict event-time order") {
    import spark.implicits._
    val evs = Seq(
      (1L, 10L, "click"), (1L, 20L, "error"), (1L, 30L, "purchase"), // full funnel
      (2L, 10L, "purchase"), (2L, 20L, "click"), (2L, 30L, "error"), // early purchase ignored
      (3L, 10L, "error"), (3L, 20L, "click"),                        // error before click -> 1
      (4L, 10L, "view"))                                             // never clicks -> 0
      .map(t => graft.streaming.StreamOps.TypedEvent(t._1, t._2, t._3))
    val out = graft.streaming.StreamOps
      .funnel(evs.toDS(), Seq("click", "error", "purchase"))
      .collect().map(r => r.user_id -> r.stage).toMap
    assert(out == Map(1L -> 3, 2L -> 2, 3L -> 1, 4L -> 0), s"got $out")
  }

  test("a14_countmin_topk: estimates bracket the exact counts (bounds also asserted in-query)") {
    val out = ExtraQueries.defs("a14_countmin_topk")(spark, sf).collect()
    assert(out.length == 20)
    // r9 shape: the sketch estimate itself stays engine-internal; the
    // declared row carries exact tf plus the hashed bounds verdict
    out.foreach { r =>
      assert(r.getLong(1) > 0, s"empty exact count in $r")
      assert(r.getAs[Boolean]("cms_bounds_ok"), s"CMS bounds verdict false in $r")
    }
  }

  test("x_nb_serve: compiled NB kernel agrees with MLlib's transform exactly") {
    val fit = LearnedQueries.defs("x_learned_nb")(spark, sf).head()
    assert(fit.getAs[Double]("kernel_ml_agreement") == 1.0,
      s"kernel diverged from MLlib: $fit")
    val out = LearnedQueries.defs("x_nb_serve")(spark, sf)
    assert(out.count() == graft.Tables.documents(spark, sf).count())
    // predictions only ever name fitted classes
    val langs = graft.Tables.documents(spark, sf)
      .select("lang").distinct().collect().map(_.getString(0)).toSet
    val bad = out.filter(!col("pred_lang").isin(langs.toSeq: _*)).count()
    assert(bad == 0, "serve predicted a label outside the fitted classes")
  }

  test("j11_bloom_join: result equals the plain join (bloom adds no rows, drops none)") {
    val out = StorageQueries.defs("j11_bloom_join")(spark, sf)
    val o = graft.Tables.orders(spark, sf).filter(col("o_totalprice") > 480000.0)
    val l = graft.Tables.lineitem(spark, sf)
    val plain = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("cnt"),
        (sum(round(col("l_extendedprice") * 100).cast("long")) / 100.0).as("revenue"))
    val mismatch = out.as("x").join(plain.as("p"), Seq("o_orderstatus"), "full")
      .filter(col("x.cnt").isNull || col("p.cnt").isNull ||
        col("x.cnt") =!= col("p.cnt") || col("x.revenue") =!= col("p.revenue"))
      .count()
    assert(mismatch == 0, "bloom-pruned join result differs from the plain join")
  }
}
