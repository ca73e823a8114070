package graft

import graft.queries.TextQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The deterministic sampling/split/scrub family over `documents`:
  * t_split_assign, t_mix_sources, t_pii_redact. These all rely on
  * engine-exact arithmetic (integer hash buckets, floor(sqrt), Java/RE2
  * common-subset regexes) — the specs pin the invariants the oracle
  * hash can't express directly.
  */
class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("t_split_assign partitions the corpus and is deterministic") {
    val res = TextQueries.defs("t_split_assign")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = Tables.documents(spark, sf).count()
    assert(res.values.sum == total, s"splits must partition the corpus: $res")
    // hash buckets are uniform enough that train is the large split at
    // any corpus size
    assert(res.getOrElse("train", 0L) > res.getOrElse("val", 0L))
    assert(res.getOrElse("train", 0L) > res.getOrElse("test", 0L))
    val again = TextQueries.defs("t_split_assign")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == res, "split assignment must be run-to-run identical")
  }

  test("t_mix_sources keeps at most the source count and near the quota") {
    val rows = TextQueries.defs("t_mix_sources")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, quota, kept) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(kept <= n, s"kept $kept > docs $n for ${r.getString(0)}")
      // Bernoulli with rate quota/n: kept is within noise of
      // min(quota, n); allow the full +-n slack only for tiny sources
      val expected = math.min(quota, n)
      assert(math.abs(kept - expected) <= math.max(4L, n / 2),
        s"kept $kept far from expected $expected (n=$n quota=$quota)")
    }
  }

  test("t_pii_redact scrubs every injected email/phone/IP") {
    val rows = TextQueries.defs("t_pii_redact")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, emails, phones, ips, red) =
        (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))
      assert(emails == (if (id % 3 == 0) 2 else 1), s"doc $id emails=$emails")
      assert(phones == 1 && ips == 1, s"doc $id phones=$phones ips=$ips")
      assert(!red.contains("@"), s"doc $id leaked an email: $red")
      assert(!red.contains("+1-555-"), s"doc $id leaked a phone: $red")
      assert(red.contains("<EMAIL>") && red.contains("<PHONE>") &&
        red.contains("<IP>"), s"doc $id missing placeholders: $red")
    }
  }

  test("t_dedup_keep_best picks the max-distinct member of each cluster") {
    val d = "/root/testdata/sf0.001"
    val clusters = TextQueries.defs("t_dedup_clusters")(spark, d)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val byCluster = clusters.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val distinctCnt = Tables.documents(spark, d)
      .select(col("doc_id"), size(array_distinct(split(col("text"), " "))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = TextQueries.defs("t_dedup_keep_best")(spark, d).collect()
    assert(rows.length == byCluster.size, "one keep decision per cluster")
    rows.foreach { r =>
      val (cluster, keep, keepN, members) =
        (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))
      val mem = byCluster(cluster)
      assert(mem.contains(keep), s"kept doc $keep not in cluster $cluster")
      assert(members == mem.size)
      val best = mem.map(distinctCnt).max
      assert(keepN == best, s"cluster $cluster kept n_distinct $keepN != max $best")
      // tie-break: min doc_id among the max-distinct members
      val expected = mem.filter(distinctCnt(_) == best).min
      assert(keep == expected, s"cluster $cluster kept $keep, expected $expected")
    }
  }

  test("t_filter_pipeline verdicts partition the corpus with dup priority") {
    val rows = TextQueries.defs("t_filter_pipeline")(spark, sf).collect()
    val total = Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum == total, "verdicts must partition the corpus")
    val verdicts = rows.map(_.getString(1)).toSet
    assert(verdicts.subsetOf(
      Set("dup", "near_dup", "lang_mismatch", "low_quality", "repetitive", "kept")))
    // the exact-dup rule fires first, so dup count == docs minus
    // distinct contents (a (fp,len) hash collision would surface here)
    val nDup = rows.filter(_.getString(1) == "dup").map(_.getLong(2)).sum
    val distinctTexts = Tables.documents(spark, sf).select("text").distinct().count()
    assert(nDup == total - distinctTexts, s"dup=$nDup total=$total distinct=$distinctTexts")
    // testdata has no exact dups, so near_dup must equal the cluster
    // query's non-canonical member count — the pipeline and the
    // standalone dedup can never disagree
    val nNear = rows.filter(_.getString(1) == "near_dup").map(_.getLong(2)).sum
    val nonCanonical = TextQueries.defs("t_dedup_clusters")(spark, sf)
      .filter(col("doc_id") =!= col("cluster")).count()
    assert(nNear == nonCanonical, s"near_dup=$nNear cluster non-canon=$nonCanonical")
  }

  test("t_seq_packing: contiguous packs, budget-bounded, totals preserved") {
    val rows = TextQueries.defs("t_seq_packing")(spark, sf).collect()
    val totalTok = Tables.documents(spark, sf)
      .agg(sum(size(split(col("text"), " ")))).head().getLong(0)
    assert(rows.map(_.getAs[Long]("sum_tokens")).sum == totalTok,
      "every token lands in exactly one pack")
    val maxDoc = Tables.documents(spark, sf)
      .agg(max(size(split(col("text"), " ")))).head().getInt(0)
    rows.groupBy(_.getAs[Long]("shard")).foreach { case (shard, packs) =>
      val ids = packs.map(_.getAs[Long]("pack_id")).sorted.toSeq
      assert(ids == (0L until ids.length.toLong),
        s"shard $shard pack ids not contiguous from 0: $ids")
      packs.foreach { p =>
        assert(p.getAs[Long]("sum_tokens") <= 2048L + maxDoc,
          s"shard $shard pack ${p.getAs[Long]("pack_id")} exceeds budget+straddle")
      }
    }
  }

  test("t_doc_chunking: chunk count formula holds; whole-doc chunks = fingerprint") {
    val chunks = TextQueries.defs("t_doc_chunking")(spark, sf).cache()
    val nTok = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val perDoc = chunks.groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"), max("chunk_id").as("max_id")).collect()
    assert(perDoc.length == nTok.size, "every doc must produce chunks")
    perDoc.foreach { r =>
      val expected = (nTok(r.getLong(0)) - 1) / 24 + 1
      assert(r.getLong(1) == expected && r.getLong(2) == expected - 1,
        s"doc ${r.getLong(0)}: ${r.getLong(1)} chunks, expected $expected")
    }
    // a doc shorter than one window has exactly one chunk = the whole
    // text, so its chunk_fp must equal t_fingerprint's doc fp
    val whole = chunks.filter(col("start_tok") === 0)
      .join(TextQueries.defs("t_fingerprint")(spark, sf), "doc_id")
      .filter(lit(32) >= col("chunk_tokens") &&
        col("doc_id").isin(nTok.filter(_._2 <= 32).keys.toSeq: _*))
    assert(whole.count() > 0, "need at least one sub-window doc in testdata")
    assert(whole.filter(col("chunk_fp") =!= col("fp")).count() == 0,
      "whole-doc chunk fingerprint must equal the document fingerprint")
    chunks.unpersist()
  }

  test("t_chunk_dedup reports only repeated chunks with consistent counts") {
    val rows = TextQueries.defs("t_chunk_dedup")(spark, sf).collect()
    assert(rows.nonEmpty, "testdata's planted near-dups must share chunks")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_copies") >= 2)
      assert(r.getAs[Long]("n_docs") <= r.getAs[Long]("n_copies"))
    }
  }

  test("x_pipeline_e2e packs exactly the pipeline's kept documents") {
    val packs = TextQueries.defs("x_pipeline_e2e")(spark, sf).collect()
    val keptDocs = TextQueries.defs("t_filter_pipeline")(spark, sf)
      .filter(col("verdict") === "kept").agg(sum("n_docs")).head().getLong(0)
    assert(packs.map(_.getAs[Long]("n_docs")).sum == keptDocs,
      "every kept doc lands in exactly one pack")
    packs.groupBy(_.getAs[Long]("shard")).foreach { case (shard, ps) =>
      val ids = ps.map(_.getAs[Long]("pack_id")).sorted.toSeq
      assert(ids == (0L until ids.length.toLong),
        s"shard $shard pack ids not contiguous: $ids")
    }
  }

  test("t_dedup_verified: surviving pairs are LSH candidates at jaccard >= 0.5") {
    val d = "/root/testdata/sf0.001"
    val verified = TextQueries.defs("t_dedup_verified")(spark, d).collect()
    assert(verified.nonEmpty, "planted near-dups must survive verification")
    val candidates = TextQueries.defs("t_dedup_minhash")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    verified.foreach { r =>
      assert(candidates.contains((r.getLong(0), r.getLong(1))),
        s"verified pair not an LSH candidate: $r")
      val (inter, uni) = (r.getAs[Long]("inter"), r.getAs[Long]("uni"))
      assert(inter * 2 >= uni && inter <= uni && uni > 0, s"bad counts: $r")
    }
    assert(verified.length <= candidates.size,
      "verification can only discard candidates")
  }

  test("t_incremental_dedup flags only new docs against the history split") {
    val rows = TextQueries.defs("t_incremental_dedup")(spark, sf).collect()
    assert(rows.nonEmpty, "testdata's near-dups must produce prefix collisions")
    rows.foreach { r =>
      assert(r.getAs[Long]("new_doc") >= 250 && r.getAs[Long]("existing_id") < 250, r.toString)
    }
  }

  test("x_stream_decontaminate equals the one-shot batch decontamination") {
    val stream = TextQueries.defs("x_stream_decontaminate")(spark, sf)
    val batch = TextQueries.defs("t_decontaminate")(spark, sf)
    assert(stream.count() == batch.count())
    assert(stream.join(batch, Seq("doc_id", "n_shared")).count() == batch.count(),
      "per-doc shared-shingle counts must match the batch run exactly")
  }

  test("Hashing.bucket: in-range, deterministic, near-uniform on dense ids") {
    import spark.implicits._
    import graft.functions.Hashing
    val ids = (0L until 10000L).toDF("id")
    val buckets = ids.select(Hashing.bucket(col("id"), 8L).as("b"))
      .groupBy("b").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(buckets.keySet.forall(b => b >= 0 && b < 8), s"out of range: $buckets")
    assert(buckets.size == 8, s"empty buckets on 10k dense ids: $buckets")
    // near-uniform: every bucket within 10% of the expected 1250
    buckets.values.foreach(c => assert(math.abs(c - 1250L) <= 125L, buckets.toString))
    // the engine-side expression must equal the reference arithmetic
    val probe = Seq(0L, 1L, 42L, 999999L).toDF("id")
      .select(col("id"), Hashing.bucket(col("id"), 1000000L).as("b")).collect()
    probe.foreach { r =>
      val id = r.getLong(0)
      val expect = ((id * Hashing.Mult) % graft.functions.TextHash.P) % 1000000L
      assert(r.getLong(1) == expect, s"id $id")
    }
    // overflow-proof at ANY id: the reduce-first form must equal the
    // BigInt modular value where the unreduced multiply would wrap
    val huge = Seq(Long.MaxValue, Long.MaxValue / 2, 4000000000L).toDF("id")
      .select(col("id"), Hashing.bucket(col("id"), 1000000L).as("b")).collect()
    huge.foreach { r =>
      val id = BigInt(r.getLong(0))
      val expect = ((id * Hashing.Mult) mod BigInt(graft.functions.TextHash.P)) % 1000000L
      assert(BigInt(r.getLong(1)) == expect, s"id $id")
    }
  }

  test("pii patterns agree between Spark (Java regex) and the RE2 subset") {
    // the one construct with cross-engine risk is \b: pin its behavior
    // on boundary-adjacent digits and dots
    import spark.implicits._
    val probe = Seq(
      "ip 10.1.2.3 end", "x10.1.2.3", "10.1.2.3.4", "v1.2", "999.999.999.999")
      .toDF("s")
    val ip = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
    val got = probe.select(size(regexp_extract_all(col("s"), lit(ip), lit(0))))
      .collect().map(_.getInt(0)).toSeq
    // "x10..." still matches after the non-word 'x'? no — 'x' is a word
    // char so \b fails before '1'... it holds between x and 1? both word
    // chars -> no boundary -> no match start there; RE2 agrees.
    assert(got == Seq(1, 0, 1, 0, 1), s"ip regex semantics drifted: $got")
  }
}
