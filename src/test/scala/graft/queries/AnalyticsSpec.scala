package graft.queries

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The analytics additions: pivot null-fill semantics, distribution-
  * window ratio formulas, fuzzy-match determinism, and bigram
  * extraction — the properties the oracle hashes rest on.
  */
class AnalyticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pivot fills absent (group, value) combinations with 0, not null") {
    val df = Seq((1L, "click"), (1L, "click"), (2L, "view")).toDF("u", "t")
    val wide = df.groupBy("u").pivot("t", Seq("click", "view", "purchase"))
      .agg(count(lit(1))).na.fill(0L, Seq("click", "view", "purchase"))
      .orderBy("u").collect()
    assert(wide.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((1L, 2L, 0L, 0L), (2L, 0L, 1L, 0L)))
  }

  test("percent_rank and cume_dist follow the (rank-1)/(n-1), rn/n formulas under a total order") {
    val w = org.apache.spark.sql.expressions.Window.orderBy("v")
    val rows = Seq(10, 20, 30, 40, 50).toDF("v")
      .select(col("v"), percent_rank().over(w).as("pr"), cume_dist().over(w).as("cd"))
      .orderBy("v").collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getDouble(1) == i.toDouble / 4, s"pr at $i")
      assert(r.getDouble(2) == (i + 1).toDouble / 5, s"cd at $i")
    }
  }

  test("fuzzy join matches every corrupted segment back to its source at distance 1") {
    val res = AnalyticsQueries.defs("j13_fuzzy_join")(spark, "/root/testdata/sf0.001")
    val cust = graft.Tables.customer(spark, "/root/testdata/sf0.001")
      .select(col("c_custkey"), col("c_mktsegment")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = res.collect()
    assert(rows.length == cust.size, "one match per customer")
    rows.foreach { r =>
      val (key, matched, dist) = (r.getLong(0), r.getString(2), r.getLong(3))
      assert(matched == cust(key), s"customer $key matched $matched, not its source segment")
      assert(dist == 1L, s"one-char deletion must be distance 1, got $dist")
    }
  }

  test("bigram extraction yields exactly the adjacent pairs, in-row only") {
    val toks = Seq("a b c", "c d").toDF("text")
      .select(split(col("text"), " ").as("lst"))
    val bi = toks.select(
        expr("slice(lst, 1, size(lst) - 1)").as("la"),
        expr("slice(lst, 2, size(lst) - 1)").as("lb"))
      .select(explode(arrays_zip(col("la"), col("lb"))).as("z"))
      .select(col("z.la").as("a"), col("z.lb").as("b"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // no cross-document (c -> c) pair, no skip pair (a -> c)
    assert(bi == Set(("a", "b"), ("b", "c"), ("c", "d")))
  }

  test("p10_winsorize: every value lands inside its group's [p05, p95] band") {
    val sf = "/root/testdata/sf0.001"
    val rows = AnalyticsQueries.defs("p10_winsorize")(spark, sf).collect()
    assert(rows.length == graft.Tables.lineitem(spark, sf).count(), "no row dropped")
    val byFlag = rows.groupBy(_.getString(2))
    byFlag.foreach { case (flag, rs) =>
      val vals = rs.map(_.getAs[Double]("price_winsorized"))
      val raw = graft.Tables.lineitem(spark, sf)
        .filter(col("l_returnflag") === flag)
        .select("l_extendedprice").collect().map(_.getDouble(0))
      assert(vals.min >= raw.sorted.apply((0.05 * (raw.length - 1)).floor.toInt),
        s"$flag: clipped min below the p05 neighborhood")
      assert(vals.max <= raw.max && vals.min >= raw.min)
      assert(vals.distinct.length < raw.distinct.length || raw.distinct.length <= 2,
        s"$flag: clipping must collapse the tails")
    }
  }

  test("o7_intersect: intersection equals the conjunctive filter, distinct") {
    val sf = "/root/testdata/sf0.001"
    val got = AnalyticsQueries.defs("o7_intersect")(spark, sf)
      .collect().map(_.getLong(0)).sorted
    val expect = graft.Tables.documents(spark, sf)
      .filter(col("lang") === "en" && col("n_chars") > 200L)
      .select("doc_id").distinct().collect().map(_.getLong(0)).sorted
    assert(got.sameElements(expect))
  }

  test("a18_mad: matches a driver-side exact median-of-deviations") {
    val sf = "/root/testdata/sf0.001"
    val rows = AnalyticsQueries.defs("a18_mad")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    def medianOf(xs: Array[Double]): Double = {
      val s = xs.sorted; val n = s.length
      if (n % 2 == 1) s(n / 2)
      else { val lo = s(n / 2 - 1); lo + (s(n / 2) - lo) * 0.5 }
    }
    val qs = graft.Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_quantity").collect()
      .groupBy(_.getString(0)).map { case (k, rs) => k -> rs.map(_.getDouble(1)) }
    qs.foreach { case (flag, xs) =>
      val med = medianOf(xs)
      val mad = medianOf(xs.map(x => math.abs(x - med)))
      assert(rows(flag)._1 == med, s"median for $flag")
      assert(rows(flag)._2 == mad, s"mad for $flag")
    }
  }

  test("m_ks_drift: D is a valid KS statistic and the halves cover the data") {
    val sf = "/root/testdata/sf0.001"
    val r = AnalyticsQueries.defs("m_ks_drift")(spark, sf).head()
    val total = graft.Tables.lineitem(spark, sf).count()
    assert(r.getAs[Long]("n1") + r.getAs[Long]("n2") == total)
    val d = r.getAs[Double]("d_stat")
    assert(d >= 0.0 && d <= 1.0)
    // identical-distribution halves of the same column: drift must be small
    assert(d < 0.2, s"hash halves of one column should not drift: D=$d")
  }

  test("t_batch_padding: length-sorting never pads more, and pads strictly less here") {
    val rows = AnalyticsQueries.defs("t_batch_padding")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("real_tokens"), r.getAs[Long]("padded_slots"))).toMap
    val (realA, padA) = rows("arrival")
    val (realS, padS) = rows("length_sorted")
    assert(realA == realS, "both strategies batch the same corpus")
    assert(padS <= padA, "length-sorted batching cannot pad more")
    assert(padS < padA, "on variable-length docs the win must be strict")
    assert(padA >= realA && padS >= realS, "padded slots bound real tokens")
  }

  test("j14_pit_join: every click carries the version valid at its time") {
    val sf = "/root/testdata/sf0.001"
    val rows = AnalyticsQueries.defs("j14_pit_join")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val e = graft.Tables.events(spark, sf).select(col("user_id"), col("event_id"),
      col("event_type"), expr("unix_micros(CAST(ts AS TIMESTAMP))").as("us")).collect()
    val firstPurchase = e.filter(_.getString(2) == "purchase")
      .groupBy(_.getLong(0)).map { case (u, rs) => u -> rs.map(_.getLong(3)).min }
    val clicks = e.filter(_.getString(2) == "click")
      .map(r => (r.getLong(1), r.getLong(0), r.getLong(3))).toSeq
    assert(rows.length == clicks.length, "one enriched row per click")
    val byEvent = rows.map(r => r._1 -> r._3).toMap
    clicks.foreach { case (eid, u, us) =>
      val expected = firstPurchase.get(u) match {
        case Some(fp) if us >= fp => u * 10 + 2
        case _ => u * 10 + 1
      }
      assert(byEvent(eid) == expected, s"event $eid of user $u")
    }
  }

  test("t_hybrid_search: RRF top-10 is bounded and carries at least one rank per row") {
    val rows = TextQueries.defs("t_hybrid_search")(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 10)
    var last = Double.MaxValue
    rows.foreach { r =>
      val rrf = r.getAs[Double]("rrf")
      assert(rrf > 0.0 && rrf <= 2.0 / 61.0 + 1e-15)
      assert(!r.isNullAt(1) || !r.isNullAt(2), "a fused row needs at least one rank")
      assert(rrf <= last, "output must be rrf-descending")
      last = rrf
    }
  }

  test("m_pr_curve: recall is monotone down the threshold order and ends at 1") {
    val rows = AnalyticsQueries.defs("m_pr_curve")(spark, "/root/testdata/sf0.001")
      .orderBy(col("score").desc).collect()
    assert(rows.nonEmpty)
    var lastRec = 0.0
    rows.foreach { r =>
      val (p, rec) = (r.getAs[Double]("prec"), r.getAs[Double]("rec"))
      assert(p >= 0.0 && p <= 1.0)
      assert(rec >= lastRec, "recall cannot decrease as the threshold drops")
      lastRec = rec
    }
    assert(lastRec == 1.0, "the loosest threshold recalls every positive")
    val last = rows.last
    assert(last.getAs[Long]("tp") + last.getAs[Long]("fp") ==
      graft.Tables.lineitem(spark, "/root/testdata/sf0.001").count())
  }

  test("m_roc_auc: midrank identity matches the brute-force pair count") {
    val r = AnalyticsQueries.defs("m_roc_auc")(spark, "/root/testdata/sf0.001").head()
    val auc = r.getAs[Double]("auc")
    assert(auc >= 0.0 && auc <= 1.0)
    // brute force: P(score_pos > score_neg) + 0.5 P(=) on the same data
    val margin = col("l_quantity") * lit(0.8) + col("l_discount") * lit(-20.0) + lit(0.1)
    val scored = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(margin.as("s"), (col("l_returnflag") === "R").as("y")).collect()
      .map(row => (row.getDouble(0), row.getBoolean(1)))
    val pos = scored.filter(_._2).map(_._1)
    val neg = scored.filterNot(_._2).map(_._1)
    var u = 0.0
    for (p <- pos; n <- neg) u += (if (p > n) 1.0 else if (p == n) 0.5 else 0.0)
    val brute = u / (pos.length.toLong * neg.length)
    assert(math.abs(auc - brute) < 1e-12, s"midrank AUC $auc vs brute $brute")
  }

  test("t_resample_daily: per-user day grid is dense with explicit zero rows") {
    val rows = AnalyticsQueries.defs("t_resample_daily")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byUser = rows.groupBy(_._1)
    byUser.foreach { case (u, rs) =>
      val days = rs.map(_._2).sorted
      assert(days.last - days.head + 1 == days.length, s"user $u grid has gaps")
      assert(days.distinct.length == days.length, s"user $u grid has duplicates")
    }
    assert(rows.exists(_._3 == 0L), "at least one gap day materialized as a zero row")
  }

  test("m_ab_ztest: arms partition the users and the statistic is finite") {
    val r = AnalyticsQueries.defs("m_ab_ztest")(spark, "/root/testdata/sf0.001").head()
    val users = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select("user_id").distinct().count()
    assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") == users)
    assert(r.getAs[Long]("conv_a") <= r.getAs[Long]("n_a"))
    assert(r.getAs[Long]("conv_b") <= r.getAs[Long]("n_b"))
    assert(!r.getAs[Double]("z").isNaN && !r.getAs[Double]("z").isInfinite)
  }

  test("x_pagerank: damped floor holds and co-purchase hubs outrank leaves") {
    val rows = AnalyticsQueries.defs("x_pagerank")(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 20)
    // every rank carries at least the damping constant
    rows.foreach(r => assert(r.getAs[Long]("r") >= 150000L))
    // descending with the declared tiebreak
    val rs = rows.map(r => (-r.getAs[Long]("r"), r.getAs[Long]("node")))
    assert(rs.sameElements(rs.sorted), "output must follow (r desc, node)")
  }

  test("t_doc_similarity: scores count only shared rare tokens") {
    val rows = AnalyticsQueries.defs("t_doc_similarity")(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("dot") >= r.getAs[Long]("n_shared"),
        "dot of positive integer tfs is at least the shared-token count")
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"), "canonical pair order")
    }
  }

  test("grouping_id distinguishes rolled-up NULLs across all four cube levels") {
    val res = AnalyticsQueries.defs("a17_grouping_sets")(spark, "/root/testdata/sf0.001")
      .collect()
    val gids = res.map(_.getLong(2)).toSet
    assert(gids == Set(0L, 1L, 2L, 3L))
    val total = res.filter(_.getLong(2) == 3L)
    assert(total.length == 1, "exactly one grand-total row")
    assert(total.head.getLong(3) ==
      res.filter(_.getLong(2) == 0L).map(_.getLong(3)).sum,
      "grand total equals the sum of the finest level")
  }
}
