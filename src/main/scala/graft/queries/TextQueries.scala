package graft.queries

import graft.Tables
import graft.functions.{Fns, Hashing, TextHash}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LLM-training-data pipeline operators over `documents` and
  * `embeddings` (builder-prompt first-class set): exact / MinHash-LSH /
  * SimHash / n-gram-Jaccard dedup, fingerprinting, language ID, quality
  * scoring, token counting, brute-force + LSH-bucketed similarity
  * search, and the multimodal-column plumbing stub.
  *
  * Design for 100 TB:
  *  - per-document work (tokenize, shingle, hash, signatures) is a
  *    single fused projection of custom codegen'd Catalyst expressions
  *    (graft.plans.TextVectorExprs) — no UDFs, no shuffle,
  *    embarrassingly parallel over any partitioning;
  *  - per-doc DISTINCT uses `array_distinct` inside the row (no
  *    shuffle) before exploding;
  *  - MinHash-LSH turns all-pairs O(n²) dedup into an equi-join on
  *    (band, signature) — the only shuffles are the signature groupBy
  *    and the bucket join, both keyed and partial-agg'd; brute-force
  *    cosine is kept only as the small-side baseline and the LSH bucket
  *    variant is the scale path.
  *
  * All hashing is integer-only polynomial hashing (TextHash) so the
  * DuckDB oracle reproduces signatures bit-exactly.
  */
object TextQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Declared shard count for t_corpus_shuffle — interpolated into BOTH
    * the Scala call and the oracle SQL so the two sides cannot drift. */
  private val ShuffleShards = 32L
  import TextHash._

  /** The minhash ORACLE's generate_series bound (DuckDB can't
    * lateral-join generate_series on a column arg, so the shingle CTE
    * uses this fixed cap). The Spark side has no such limit — documents
    * longer than the cap would silently shingle-truncate ONLY on the
    * oracle side, so any corpus that could exceed it must fail loudly
    * instead ([[assertUnderOracleTokenCap]]). Testdata max is 100. */
  val OracleTokenCap = 1024

  // the guard depends only on (session, corpus), so timed bench
  // invocations don't re-pay the corpus scan on every call
  private val capOk =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Unit]
  private def assertCapMemo(s: SparkSession, d: String): Unit =
    capOk.getOrElseUpdate((s, d), assertUnderOracleTokenCap(Tables.documents(s, d)))

  /** Fail-loud guard called by every query whose oracle uses the
    * shingle CTE: one cheap max-agg over the corpus. */
  def assertUnderOracleTokenCap(docs: DataFrame): Unit = {
    val maxTok = docs.agg(max(size(split(col("text"), " ")))).head().getInt(0)
    require(maxTok <= OracleTokenCap,
      s"corpus has a $maxTok-token document > the $OracleTokenCap-token " +
        "minhash-oracle shingle cap: the DuckDB oracle would silently " +
        "truncate shingles — raise the cap in TextQueries.shingleCte first")
  }

  // Full 16-perm signature in ONE codegen'd expression
  // (plans.MinHashSig): per-token hashes composed into shingle hashes
  // via the rolling-hash identity, mins updated in the same pass. The
  // earlier HOF formulation needed a cache barrier + repartition to be
  // viable (87 s -> 0.6 s for 5000 docs); the kernel needs neither.
  // Values identical to the oracle's explode+groupBy formulation.
  private def minhashSig(s: SparkSession, d: String): DataFrame = {
    assertCapMemo(s, d)
    Tables.documents(s, d)
      .repartition(s.sparkContext.defaultParallelism) // single-file source -> spread CPU work
      // docs with <3 tokens have no shingles (NULL sig): drop them,
      // matching the oracle's shingle CTE (which emits no rows for
      // them) — otherwise they'd all share the empty signature and
      // pair as false dups. The predicate is on TOKEN COUNT, not
      // sig.isNotNull: a sig-dependent filter gets pushed below the
      // projection and re-runs the signature kernel per row.
      .filter(size(split(col("text"), " ")) >= 3)
      .select(col("doc_id"), TextHash.minhashSignature(col("text")).as("sig"))
      .select(
        col("doc_id") +: (0 until NumPerms).map(k =>
          element_at(col("sig"), k + 1).as(s"m$k")): _*)
  }

  // SRP-LSH hyperplanes: deterministic integer pattern, shared with SQL.
  // k*13 % 11 repeats with period 11, so the i-slope steps from 7 to 8
  // at k = 11 — without that, plane 11 would DUPLICATE plane 0 and bit
  // 11 would add no discrimination (halving the effective bucket count
  // exactly when the adaptive width first needs it). Planes 0-7 are
  // bit-identical to the original fixed-width family.
  private def hyperplane(k: Int): Array[Double] =
    Array.tabulate(64)(i => (((i * (7 + k / 11) + k * 13) % 11) - 5).toDouble)

  /** Adaptive SRP width: smallest b in [8, 20] with n <= 64 * 2^b, so
    * expected bucket occupancy stays ~64 as the corpus grows and the
    * within-bucket self-join stays LINEAR in n. The fixed-256-bucket
    * form measured 37x per 10x decade on the scale corpus (n^2/256
    * pairs by construction); with occupancy pinned, pair count is
    * ~64*n. Integer ladder (no float log2 — cross-engine exact),
    * mirrored verbatim in [[srpBitsSql]]; at the gate SFs (n <= 2000)
    * it floors at 8 bits = the original 256 buckets, so gate results
    * are unchanged. Extend past 20 bits beyond ~67M vectors. */
  private def srpBits(n: Long): Int = {
    var b = 8
    while (b < 20 && n > (64L << b)) b += 1
    b
  }

  private def srpBucket(emb: Column, bits: Int): Column =
    (0 until bits).map { k =>
      val dot = Fns.dotProduct(emb, typedLit(hyperplane(k)))
      when(dot >= 0.0, lit(1L << k)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Per-bucket membership cap for the declared SRP top-1: adaptive
    * WIDTH (srpBits) pins EXPECTED occupancy at ~64, but LSH is built
    * to co-bucket near-duplicates, so a near-dup-rich corpus (the
    * 100 TB crawl shape — the 100x scale corpus measured it at 37.5x
    * per 10x decade) still forms mega-buckets the width knob cannot
    * split. 16x the expected occupancy: a no-op on balanced buckets
    * (and at every gate SF, where occupancy is ~1-8), binding only on
    * skew. */
  private[queries] val AnnBucketCap = 1 << 10

  /** Within-bucket top-1 with a per-bucket size cap — the same
    * secondary-hash split as [[IvfQueries.semanticDedupPairs]]: buckets
    * above `cap` members split into ceil(n/cap) sub-buckets by the
    * deterministic Knuth hash of vec_id, bounding pair work to ~n*cap
    * per bucket (linear in n). Each query's top-1 is then taken within
    * its sub-bucket (min_by, no sort); under the cap nSub = 1, the sub
    * column is constant 0 and the output is exactly the uncapped
    * bucket-wide top-1 — which is why the gate oracle (uncapped SQL)
    * stays bitwise. Above the cap the candidate set narrows to the
    * sub-bucket, the standard bounded-posting-list trade every
    * production ANN index makes (a mega-bucket is overwhelmingly
    * near-duplicate mass, so sub-bucket winners are near-duplicate-
    * quality neighbors). AnnBucketCapSpec pins both regimes.
    * `e` must carry (vec_id, embedding, bucket, nsq). */
  private[queries] def annBucketTop1(e: DataFrame, cap: Int): DataFrame = {
    // |buckets| rows, <= 2^srpBits — broadcast-tiny beside the corpus
    val sizes = e.groupBy("bucket").agg(count(lit(1)).as("bucket_n"))
    // Parallelism must be sized to the join's OUTPUT, not its input:
    // the (bucket, sub) self-join reads ~n rows but emits
    // Σ n_b·min(n_b, cap) pair rows (76 M at the 100x corpus from a
    // 100 MB input) — AQE's coalescing sees only the input bytes and
    // shrank the expansion to a couple of tasks (measured 31 s where
    // the pair arithmetic itself is ~3 s of CPU). Pre-partition both
    // sides by the join key at an explicit pair-work-derived count
    // (~2 M pair rows per task) — a user-specified numPartitions is
    // exempt from AQE coalescing, and both join inputs inherit the one
    // exchange, so this REPLACES the join's implicit shuffles. The
    // pair-work scalar costs one tiny agg over the bucket-histogram
    // frame the join broadcasts anyway.
    val pairWork = Option(sizes
      .agg(sum(col("bucket_n") * least(col("bucket_n"), lit(cap.toLong))))
      .head()).filterNot(_.isNullAt(0)).map(_.getLong(0)).getOrElse(0L)
    val parts = math.max(e.sparkSession.sparkContext.defaultParallelism,
      math.min(4096L, pairWork / 2000000L).toInt)
    // integer ceil-div (`div`, not `/` — Spark's `/` is double division)
    val nSub = greatest(lit(1L), expr(s"(bucket_n + ${cap - 1}) div $cap"))
    val sub = e.join(broadcast(sizes), Seq("bucket"))
      .withColumn("sub", Hashing.bucket(col("vec_id"), nSub))
      .repartition(parts, col("bucket"), col("sub"))
    val a = sub.select(col("bucket"), col("sub"), col("vec_id").as("q_id"),
      col("embedding").as("q_emb"), col("nsq").as("q_nsq"))
    val b = sub.select(col("bucket"), col("sub"), col("vec_id").as("n_id"),
      col("embedding").as("n_emb"), col("nsq").as("n_nsq"))
    a.join(b, Seq("bucket", "sub")).filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        (Fns.dotProduct(col("q_emb"), col("n_emb"))
          / (sqrt(col("q_nsq")) * sqrt(col("n_nsq")))).as("cos"))
      .groupBy("q_id")
      .agg(min_by(struct(col("n_id"), col("cos")), struct(-col("cos"), col("n_id"))).as("x"))
      .select(col("q_id"), col("x.n_id"), col("x.cos"))
  }

  private val enStop = Seq("the", "a", "of", "and", "to")
  private val deStop = Seq("der", "die", "das", "und", "ein")
  private val esStop = Seq("el", "la", "de", "los", "y")
  private val frStop = Seq("le", "les", "des", "et", "un")
  private val zhStop = Seq("的", "了", "是", "我", "不")

  private def stopCount(w: Column, stop: Seq[String]): Column =
    size(filter(w, t => t.isin(stop: _*)))

  /** RAG-style chunk frame: 32-token windows at stride 24 per
    * document — (doc_id, chunk_id, start_tok, chunk_tokens, chunk_fp).
    * Row-local (sequence + explode + slice); shared by t_doc_chunking
    * and t_chunk_dedup. */
  private def chunkFrame(s: SparkSession, d: String): DataFrame = {
    assertCapMemo(s, d)
    val W = 32; val S = 24
    val nTok = size(col("w"))
    Tables.documents(s, d)
      // a NULL text must produce NO chunks (the oracle's
      // `WHERE i <= len(w) - 1` is NULL-false); without this filter
      // Spark's size(NULL) = -1 would fabricate a chunk_tokens = -1 row
      .filter(col("text").isNotNull)
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .select(col("doc_id"), col("w"), nTok.as("n_tok"),
        explode(sequence(lit(0), greatest(nTok - 1, lit(0)), lit(S))).as("start"))
      .select(col("doc_id"),
        (col("start") / S).cast("long").as("chunk_id"),
        col("start").cast("long").as("start_tok"),
        least(lit(W), col("n_tok") - col("start")).cast("long").as("chunk_tokens"),
        charHash(array_join(
          slice(col("w"), col("start") + 1, least(lit(W), col("n_tok") - col("start"))),
          " ")).as("chunk_fp"))
  }

  /** Stopword-argmax language prediction with alphabetical ties —
    * ONE definition shared by t_lang_id and t_filter_pipeline (the
    * pipeline's lang-mismatch rule must agree with the standalone
    * query by construction). */
  private def predLangCol(w: Column): Column = {
    val sDe = stopCount(w, deStop); val sEn = stopCount(w, enStop)
    val sEs = stopCount(w, esStop); val sFr = stopCount(w, frStop)
    val sZh = stopCount(w, zhStop)
    when(sDe >= sEn && sDe >= sEs && sDe >= sFr && sDe >= sZh, "de")
      .when(sEn >= sEs && sEn >= sFr && sEn >= sZh, "en")
      .when(sEs >= sFr && sEs >= sZh, "es")
      .when(sFr >= sZh, "fr")
      .otherwise("zh")
  }

  /** Fail-loud scale guard (same pattern as StorageQueries): queries
    * whose 100 TB story is "the small side broadcasts" assert that no
    * join in their physical plan degraded to a sort-merge/shuffle-hash
    * exchange — a silent fallback would reshuffle the big side. */
  private def requireBroadcastOnly(df: DataFrame, name: String): Unit = {
    val smj = df.queryExecution.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }
    require(smj.isEmpty,
      s"$name: expected broadcast-only joins, found ${smj.size} shuffled join(s):\n" +
        df.queryExecution.sparkPlan)
  }

  /** LSH candidate pairs (doc_a < doc_b), shared by the pair query, the
    * cluster-formation query and the verification queries.
    *
    * r17 (VERDICT r16 Next #4, guide §1.2): memoized per (session,
    * corpus) as an eagerly-materialized frame — t_containment,
    * t_dedup_verified, t_dedup_minhash and the cluster queries all
    * consumed the identical banding join, and each used to re-run the
    * signature + band self-join + distinct from scratch (three extra
    * banding jobs per eval). The memo is the SAME session-scoped
    * mechanism the learned fits use: keyed by the live SparkSession, so
    * every bench/verify invocation still computes it from the parquet
    * inputs (no cross-run state), and CorpusCaches evicts it on a
    * corpus switch. localCheckpoint truncates the lineage so consumers
    * read the materialized pairs instead of re-planning the join; the
    * pairs frame is band-collision-bounded (orders of magnitude smaller
    * than the corpus), so pinning it is the cheap side of the r16
    * retention discipline. First consumer in sweep order pays the
    * banding once — the clusterMemo precedent. */
  private val lshPairsMemo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
  private def lshPairs(s: SparkSession, d: String): DataFrame =
    graft.core.CorpusCaches.cachedPerCorpus(lshPairsMemo, s, d) {
      // cache: the signature is cheap now (codegen'd kernel) but still
      // worth materializing once for the two band-join sides.
      val sig = minhashSig(s, d).cache()
      val bands = bandsOf(sig)
      val a = bands.select(col("band"), col("bsig"), col("doc_id").as("doc_a"))
      val b = bands.select(col("band"), col("bsig"), col("doc_id").as("doc_b"))
      a.join(b, Seq("band", "bsig")).filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").distinct()
        .localCheckpoint(true)
    }(_ => ()) // checkpoint blocks are ContextCleaner-managed on eviction

  /** The (doc_id, band, bsig) band-index rows of a signature frame —
    * ONE definition for the pair join, the incremental probe, and the
    * persisted-index lifecycle. */
  private def bandsOf(sig: DataFrame): DataFrame =
    sig.select(col("doc_id"), explode(array(
      (0 until NumBands).map { b =>
        struct(lit(b).as("band"),
          concat_ws("-", (0 until RowsPerBand).map(r => col(s"m${b * RowsPerBand + r}")): _*).as("bsig"))
      }: _*)).as("x"))
      .select(col("doc_id"), col("x.band"), col("x.bsig"))

  /** Batch boundaries for the incremental/lifecycle LSH queries —
    * interpolated into BOTH the Scala filters and the oracle SQL. */
  private val LshBase = 250L   // history: doc_id < LshBase
  private val LshBatch2 = 375L // lifecycle batch 1 = [LshBase, LshBatch2)
  private val LshProbeBase = 450L // compaction: indexed history < this, probes >= this
  private val lshCompactMemo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  private val lshLifecycleMemo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
  private val bloomMemo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Array[Byte]]
  // The benchmark's distinct shingle hashes, cached once per (session,
  // corpus): the benchmark set is SMALL by nature (the eval suite, not
  // the corpus) and the production decontamination shape pays its
  // aggregation once and serves many training batches against it. The
  // r11 bench showed the old form re-deriving this distinct (scan +
  // explode + shuffle) inside EVERY action of t_decontaminate_bloom —
  // 4x per run — which is what regressed the row when Sessions moved
  // to input-sized knobs (each re-derivation carries two small-data
  // shuffles whose fixed overhead grew ~0.2 s).
  private val benchSetMemo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  /** Exact-Jaccard verification of (new_doc, existing_id) candidate
    * links at the integer >= 0.5 threshold — shingle sets fetched for
    * candidate MEMBERS only (semi-join first, the t_dedup_verified
    * retention discipline). Returns an eagerly-materialized frame so
    * the candidate/set intermediates can be unpersisted here. */
  private def verifyLinks(s: SparkSession, d: String, cand: DataFrame): DataFrame = {
    val ids = cand.select(col("new_doc").as("doc_id"))
      .union(cand.select(col("existing_id").as("doc_id"))).distinct()
    val sets = Tables.documents(s, d)
      .join(ids, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), shingles(col("text")).as("sh"))
      .cache()
    val verified = cand
      .join(sets.select(col("doc_id").as("new_doc"), col("sh").as("sh_a")), "new_doc")
      .join(sets.select(col("doc_id").as("existing_id"), col("sh").as("sh_b")), "existing_id")
      .select(col("new_doc"), col("existing_id"),
        graft.plans.TextVectorExprs.intersectSize(col("sh_a"), col("sh_b")).cast("long").as("inter"),
        (size(col("sh_a")) + size(col("sh_b"))).cast("long").as("ns"))
      .select(col("new_doc"), col("existing_id"), col("inter"),
        (col("ns") - col("inter")).as("uni"))
      .filter(col("inter") * 2 >= col("uni"))
    val out = verified.localCheckpoint(true)
    sets.unpersist()
    out
  }

  // ---- BPE tokenizer lifecycle (t_bpe_encode) ----
  private val bpeMemo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), (java.util.HashMap[String, Integer], Seq[(String, Int)])]
  private val bpeDictSlot = new DynOracleSlot[Seq[(String, Int)]]
  private def bpeFitted(s: SparkSession, d: String)
      : (java.util.HashMap[String, Integer], Seq[(String, Int)]) = {
    val r = bpeMemo.getOrElseUpdate((s, d), {
      val sample = Tables.documents(s, d).filter(col("doc_id") < 200L)
        .select("doc_id", "text").collect()
        .sortBy(_.getLong(0)).map(_.getString(1)) // pin the sample order
      val merges = graft.plans.BpeEncode.trainMerges(sample.toSeq, 100)
      val ranks = graft.plans.BpeEncode.rankMap(merges)
      val vocab = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "").distinct().collect().map(_.getString(0)).sorted
      require(vocab.length <= 4096,
        s"t_bpe_encode oracle dictionary capped at 4096 words, got ${vocab.length}")
      val dict = vocab.toSeq.map(w =>
        w -> graft.plans.BpeEncode.encodeWord(ranks, w).length)
      (ranks, dict)
    })
    bpeDictSlot.put(d, r._2)
    r
  }
  private def bpeOracle: Map[String, String] = bpeDictSlot.only.map { dict =>
    val cases = dict.map { case (w, n) =>
      s"WHEN '${w.replace("'", "''")}' THEN $n" }.mkString(" ")
    "t_bpe_encode" ->
      s"""WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
         |SELECT doc_id, count(*)::BIGINT AS ws_tokens,
         |  sum(CASE w $cases ELSE 0 END)::BIGINT AS bpe_tokens
         |FROM w GROUP BY doc_id""".stripMargin
  }.toMap

  lazy val defs: Map[String, Q] = defsA ++ defsB

  private val defsA: Map[String, Q] = Map(
    // Exact dedup: hash-groupBy on full content, canonical = min id.
    "t_dedup_exact" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy("text")
        .agg(min("doc_id").as("canonical_id"), count(lit(1)).as("n_copies"))
        .select("canonical_id", "n_copies")),

    // Exact dedup, 100 TB shape: group on the 8-byte FINGERPRINT
    // instead of the full document, so the shuffle moves hashes + ids,
    // not content. (Collision odds at P≈2^30 are the trade; a real
    // deployment pairs fp with length or re-verifies within groups —
    // t_dedup_exact above is the content-exact baseline.)
    "t_dedup_exact_hash" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), charHash(col("text")).as("fp"), length(col("text")).as("len"))
        .groupBy("fp", "len")
        .agg(min("doc_id").as("canonical_id"), count(lit(1)).as("n_copies"))
        .select("canonical_id", "n_copies")),

    // Rolling-hash document fingerprint (one fused projection).
    "t_fingerprint" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), charHash(col("text")).as("fp"))),

    // MinHash signatures — the full shingle→hash→16-perm-min pipeline.
    "t_minhash_sig" -> ((s, d) =>
      minhashSig(s, d).select(
        col("doc_id"),
        concat_ws("-", (0 until NumPerms).map(k => col(s"m$k")): _*).as("sig"))),

    // MinHash + LSH near-dup candidate pairs: band the signature, join
    // on (band, band-sig) — O(n) shuffle instead of O(n²) pairs.
    "t_dedup_minhash" -> ((s, d) => lshPairs(s, d)),

    // Candidate pairs → duplicate CLUSTERS (the step that makes dedup
    // actionable: each group keeps one representative). Connected
    // components by min-label propagation: every round each node takes
    // the min label over itself and its neighbors — converges in
    // O(component diameter) rounds of keyed join + groupBy-min, all
    // shuffles keyed by doc id. The label sum is monotone decreasing,
    // so `sum unchanged` IS the fixpoint test (one cheap agg per
    // round). At 100 TB this is the standard iterative-CC shape; for
    // adversarially long chains the large-star/small-star variant
    // halves the diameter per round, but near-dup components are
    // near-cliques (band collisions), so plain propagation converges
    // in 2-3 rounds. Deterministic: cluster id = min doc_id reachable.
    "t_dedup_clusters" -> ((s, d) => clusterLabels(s, d)),

    // Canonical selection per near-dup cluster — the "which copy do we
    // keep" decision dedup exists to make: each LSH cluster keeps its
    // most informative member (max DISTINCT-token count, ties broken by
    // min doc_id). Both ranking keys are exact integers, so the choice
    // is bit-identical across engines and partitionings — a float
    // quality score could flip the argmax in the last ulp. Scale shape:
    // cluster labels (tiny: only near-dup members) joined to a per-doc
    // projection on doc_id, then ONE map-side-combinable aggregation
    // (max_by merges partially); no all-pairs work beyond the banded
    // LSH join itself.
    "t_dedup_keep_best" -> ((s, d) => {
      val info = Tables.documents(s, d).select(col("doc_id"),
        size(array_distinct(split(col("text"), " "))).as("n_distinct"))
      clusterLabels(s, d).join(info, "doc_id")
        .groupBy("cluster")
        .agg(
          count(lit(1)).as("n_members"),
          max_by(col("doc_id"),
            struct(col("n_distinct"), (-col("doc_id")).as("inv"))).as("keep_doc"),
          max("n_distinct").as("keep_distinct"))
        .select(col("cluster"), col("keep_doc"), col("keep_distinct"),
          col("n_members"))
    })
  )

  /** LSH near-dup connected components: (doc_id, cluster = min doc_id
    * reachable) for every document that appears in at least one LSH
    * candidate pair. Shared by t_dedup_clusters / t_dedup_keep_best /
    * t_filter_pipeline — memoized per (session, corpus) with the final
    * labels cached, so the three consumers pay the iterative
    * propagation ONCE; the fixpoint is deterministic, so reuse cannot
    * change any result. Bench timing stays honest because Bench times
    * t_* rows with ONE invocation and alphabetical order makes
    * t_dedup_clusters the first consumer — its row pays the full
    * propagation; keep_best/filter_pipeline rows measure their own
    * marginal work (as with the memoized learned fits). */
  private val clusterMemo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
  private def clusterLabels(s: SparkSession, d: String): DataFrame =
    clusterMemo.getOrElseUpdate((s, d), clusterLabelsUncached(s, d))

  private def clusterLabelsUncached(s: SparkSession, d: String): DataFrame = {
      // the memoized pairs are already materialized (localCheckpoint),
      // so the contraction rounds re-read blocks, not the banding join
      val pairs = lshPairs(s, d)
      val labels = connectedComponents(
        pairs.select(col("doc_a").as("u"), col("doc_b").as("v")))
      labels.select(col("id").as("doc_id"), col("lab").as("cluster"))
  }

  /** Connected components by alternating large-star / small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce
    * and Beyond"): each round points nodes at the minimum of their
    * 2-hop neighborhood, HALVING component diameter, so convergence is
    * O(log diameter) rounds — a diameter-1000 boilerplate chain in
    * crawl data converges in ~10 rounds where plain min-label
    * propagation needs 1000. Input: undirected edges (u, v); output:
    * (id, lab) for every node incident to an edge, lab = component
    * minimum — the same fixpoint min-propagation computes, so consumers
    * and oracles are unchanged. Each half-round is one window shuffle
    * plus a distinct; the convergence check compares canonical edge
    * sets exactly (count + one-sided except on deduplicated sets). */
  private[queries] def connectedComponents(edgesIn: DataFrame): DataFrame = {
    val wU = Window.partitionBy("u")
    // large-star(u): for m = min(neighborhood(u) ∪ {u}), point every
    // LARGER neighbor v > u at m. Strictly-larger keeps the star roots
    // stable and guarantees monotone progress toward the component min.
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      sym.withColumn("m", least(min(col("v")).over(wU), col("u")))
        .where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v"))
        .distinct()
    }
    // small-star(u): orient edges high→low, point every SMALLER
    // neighbor (and u itself) at the minimum small neighbor.
    def smallStar(e: DataFrame): DataFrame = {
      val or = e.select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      val withM = or.withColumn("m", min(col("v")).over(wU))
      withM.select(col("v").as("u"), col("m").as("v"))
        .union(withM.select(col("u"), col("m").as("v")))
        .where(col("u") =!= col("v"))
        .distinct()
    }
    // exact set equality on deduplicated canonical edges: equal counts
    // plus empty one-sided difference
    def sameEdges(a: DataFrame, b: DataFrame, na: Long, nb: Long): Boolean =
      na == nb && a.except(b).isEmpty
    // eager checkpoint, not cache: a round's plan TREE embeds the
    // previous round's subtree several times over (each union branch
    // repeats its input), so un-truncated lineage grows exponentially
    // and kills the analyzer after ~6 rounds. Checkpointing restarts
    // the plan at the materialized edge set. `spark.graft.checkpointDir`
    // selects a RELIABLE checkpoint dir (HDFS/object store) for
    // multi-executor deployments, where executor-local blocks die with
    // their executor; unset falls back to localCheckpoint — correct on
    // local[n]. Each superseded round's blocks are unpersisted
    // explicitly right after the convergence comparison instead of
    // waiting on the ContextCleaner, so at most two edge-set copies are
    // ever live however many rounds a large graph takes.
    def ckpt(df: DataFrame): DataFrame = {
      val spark = df.sparkSession
      spark.conf.getOption("spark.graft.checkpointDir") match {
        case Some(dir) =>
          if (spark.sparkContext.getCheckpointDir.isEmpty)
            spark.sparkContext.setCheckpointDir(dir)
          df.checkpoint(eager = true)
        case None => df.localCheckpoint(eager = true)
      }
    }
    // handle to the materialized RDD behind a checkpointed frame, for
    // the explicit unpersist (None on an unexpected plan shape — then
    // the ContextCleaner path still applies)
    def blocks(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
      df.queryExecution.logical match {
        case l: org.apache.spark.sql.execution.LogicalRDD => Some(l.rdd)
        case _ => None
      }
    var cur = ckpt(edgesIn.where(col("u") =!= col("v")).distinct())
    var curN = cur.count()
    var converged = curN == 0L
    var rounds = 0
    // 64 rounds covers any graph a 2^63 id space can express
    // (O(log diameter) convergence); the cap is fail-loud on principle
    while (!converged && rounds < 64) {
      val next = ckpt(smallStar(largeStar(cur)))
      val nextN = next.count()
      converged = sameEdges(next, cur, nextN, curN)
      blocks(cur).foreach(_.unpersist(blocking = false))
      cur = next
      curN = nextN
      rounds += 1
    }
    require(converged, s"star contraction did not converge in $rounds rounds")
    // fixpoint is a forest of stars (child, root): children label as
    // their root; roots (the distinct targets) label themselves
    val out = cur.select(col("u").as("id"), col("v").as("lab"))
      .union(cur.select(col("v").as("id"), col("v").as("lab")).distinct())
    out
  }

  private val defsB: Map[String, Q] = Map(
    // LSH candidate VERIFICATION — the step production LSH dedup runs
    // after banding: candidate pairs carry false positives by design,
    // so each pair's exact shingle-set Jaccard is computed (row-local
    // codegen'd IntersectSize over the two cached sets) and only pairs
    // at >= 0.5 survive. Composes lshPairs + the shingle sets; the only
    // non-candidate work is the candidate-keyed join itself — never
    // all-pairs.
    "t_dedup_verified" -> ((s, d) => {
      // shingle sets are materialized ONLY for candidate-pair members
      // (semi-join first): at scale the candidate set is orders of
      // magnitude smaller than the corpus, so caching full-corpus
      // shingle arrays would pin memory for rows the verify never reads
      val cand = lshPairs(s, d) // memoized + materialized, no re-cache
      val ids = cand.select(col("doc_a").as("doc_id"))
        .union(cand.select(col("doc_b").as("doc_id"))).distinct()
      val sets = Tables.documents(s, d)
        .join(ids, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), shingles(col("text")).as("sh"))
        .cache()
      val pairs = cand
        .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
        .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          graft.plans.TextVectorExprs.intersectSize(col("sh_a"), col("sh_b")).as("inter"),
          size(col("sh_a")).as("na"), size(col("sh_b")).as("nb"))
        .select(col("doc_a"), col("doc_b"), col("inter").cast("long").as("inter"),
          (col("na") + col("nb") - col("inter")).cast("long").as("uni"))
        // 2*inter >= uni is the integer form of jaccard >= 0.5: the
        // threshold never touches FP
        .filter(col("inter") * 2 >= col("uni"))
      // materialize eagerly so cand/sets can be unpersisted HERE: the
      // verified-pair output (dup pairs only) is orders of magnitude
      // smaller than the candidate shingle sets, so pinning it instead
      // of them is the right retention at any scale. localCheckpoint is
      // executor-local (fine on local[n]; a multi-executor deployment
      // would point this at a reliable checkpoint dir).
      val out = pairs.localCheckpoint(true)
      sets.unpersist()
      out
    }),

    // BPE tokenizer lifecycle — train-small / serve-at-scale (the
    // InferDB pattern applied to tokenization): classic BPE training
    // is inherently SEQUENTIAL (each merge changes the statistics the
    // next merge is chosen from), so 100 merges fit driver-side on a
    // bounded, deterministically-ordered sample (doc_id < 200 —
    // production tokenizers train on samples too); ENCODING is
    // embarrassingly parallel and runs as one fused projection through
    // the codegen'd BpeEncode kernel (rank table as a plan reference
    // object — the TreeEnsembleRef discipline). The oracle is generated
    // from the FITTED per-word token lengths over the corpus vocabulary
    // (bounded, asserted ≤4096; words never cross merge boundaries, so
    // doc count = Σ word counts): the green hash proves the
    // distributed kernel ≡ the driver reference encoder, via DuckDB.
    "t_bpe_encode" -> ((s, d) => {
      val (ranks, _) = bpeFitted(s, d)
      Tables.documents(s, d).select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("ws_tokens"),
        graft.plans.BpeEncode.column(col("text"), ranks).as("bpe_tokens"))
    }),

    // Hybrid retrieval — BM25 ⊕ vector ranks fused by Reciprocal Rank
    // Fusion (RRF, k=60): the production hybrid-search shape where the
    // lexical and semantic rankers each vote through their RANK, not
    // their incomparable scores. Both rank lists are total orders
    // (score desc, id), the fusion is rrf = 1/(60+r_lex) + 1/(60+r_vec)
    // — exactly TWO fixed-order double terms, so unlike a weighted
    // score sum it is bitwise-reproducible; a doc missing from one
    // list contributes 0 from that side (full outer join). Corpus
    // convention: vec_id keys the same documents as doc_id. At scale
    // each ranker prunes independently (inverted index / IVF) and RRF
    // touches only the union of the two top-k lists — here the full
    // lists keep the oracle exact.
    "t_hybrid_search" -> ((s, d) => {
      val terms = Seq("join", "vector", "stream")
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), col("toks"), size(col("toks")).as("dl"))
      val stats = docs.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      val tf = docs
        .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
        .filter(col("term").isin(terms: _*))
        .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val scored = tf
        .join(broadcast(df), "term")
        .crossJoin(broadcast(stats))
        .withColumn("score", expr(
          """(CAST(n_docs - df AS DOUBLE) + 0.5D) / (CAST(df AS DOUBLE) + 0.5D)
            | * (CAST(tf AS DOUBLE) * 2.2D
            |    / (CAST(tf AS DOUBLE)
            |       + 1.2D * (0.25D + 0.75D
            |                 * (CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))""".stripMargin))
      val lexScore = scored.groupBy("doc_id")
        .agg(
          sum(when(col("term") === terms(0), col("score"))).as("s0"),
          sum(when(col("term") === terms(1), col("score"))).as("s1"),
          sum(when(col("term") === terms(2), col("score"))).as("s2"))
        .select(col("doc_id"),
          (coalesce(col("s0"), lit(0.0)) + coalesce(col("s1"), lit(0.0))
            + coalesce(col("s2"), lit(0.0))).as("score"))
      val lexRank = lexScore.select(col("doc_id"),
        row_number().over(Window.orderBy(col("score").desc, col("doc_id"))).as("lex_rank"))
      val e = Tables.embeddings(s, d).select(
        col("vec_id"), col("embedding"), Fns.normSq(col("embedding")).as("nsq"))
      val qv = e.filter(col("vec_id") === 0L)
        .select(col("embedding").as("q_emb"), col("nsq").as("q_nsq"))
      val vecRank = e.filter(col("vec_id") =!= 0L).crossJoin(broadcast(qv))
        .select(col("vec_id").as("doc_id"),
          (Fns.dotProduct(col("q_emb"), col("embedding"))
            / (sqrt(col("q_nsq")) * sqrt(col("nsq")))).as("cos"))
        .select(col("doc_id"),
          row_number().over(Window.orderBy(col("cos").desc, col("doc_id"))).as("vec_rank"))
      lexRank.join(vecRank, Seq("doc_id"), "full_outer")
        .select(col("doc_id"), col("lex_rank"), col("vec_rank"),
          (coalesce(lit(1.0) / (lit(60) + col("lex_rank")), lit(0.0))
            + coalesce(lit(1.0) / (lit(60) + col("vec_rank")), lit(0.0))).as("rrf"))
        .orderBy(col("rrf").desc, col("doc_id"))
        .limit(10)
    }),

    // Asymmetric containment detection — the quote/boilerplate signal
    // symmetric Jaccard misses: a short doc fully embedded in a long
    // one has low Jaccard (union is dominated by the long doc) but
    // containment |A∩B|/|A| ≈ 1. Same LSH candidate discipline as
    // t_dedup_verified (banded pairs only, shingle sets fetched for
    // candidate MEMBERS via semi-join, row-local codegen'd
    // IntersectSize), then the integer threshold 2·inter ≥ |contained|
    // (containment ≥ 0.5) applied DIRECTIONALLY — each pair can emit
    // the a-in-b row, the b-in-a row, or both (near-identical docs).
    // Caveat shared with all MinHash pipelines: banding recall is
    // tuned for Jaccard, so a tiny-doc-in-huge-doc pair may never
    // band-collide — at scale containment candidates add a
    // prefix/suffix fingerprint channel (t_chunk_dedup's frame).
    "t_containment" -> ((s, d) => {
      val cand = lshPairs(s, d) // memoized + materialized, no re-cache
      val ids = cand.select(col("doc_a").as("doc_id"))
        .union(cand.select(col("doc_b").as("doc_id"))).distinct()
      val sets = Tables.documents(s, d)
        .join(ids, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), shingles(col("text")).as("sh"))
        .cache()
      val pairs = cand
        .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
        .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          graft.plans.TextVectorExprs.intersectSize(col("sh_a"), col("sh_b")).cast("long").as("inter"),
          size(col("sh_a")).cast("long").as("na"), size(col("sh_b")).cast("long").as("nb"))
      val aInB = pairs.filter(col("inter") * 2 >= col("na"))
        .select(col("doc_a").as("contained"), col("doc_b").as("container"),
          col("inter"), col("na").as("n_contained"))
      val bInA = pairs.filter(col("inter") * 2 >= col("nb"))
        .select(col("doc_b").as("contained"), col("doc_a").as("container"),
          col("inter"), col("nb").as("n_contained"))
      val out = aInB.unionByName(bInA).localCheckpoint(true)
      sets.unpersist()
      out
    }),

    // Incremental ingest dedup — the daily-crawl shape: a NEW batch
    // (doc_id >= 250) checked against the EXISTING corpus index
    // (doc_id < 250) by 32-token-prefix fingerprint (prefix
    // fingerprinting catches the retransmitted-with-appendix near-dups
    // that exact content hashing misses). At 100 TB the historical
    // side is a materialized pfp->min_id index that is NOT rescanned
    // per batch; here it is built in-query from the split. Only new
    // docs that collide with history are reported — the anti-join
    // complement is the accept list.
    "t_incremental_dedup" -> ((s, d) => {
      val w = tokens(col("text"))
      val pfp = Tables.documents(s, d).select(col("doc_id"),
        charHash(array_join(slice(w, lit(1), least(lit(32), size(w))), " ")).as("pfp"))
      val history = pfp.filter(col("doc_id") < 250)
        .groupBy("pfp").agg(min("doc_id").as("existing_id"))
      pfp.filter(col("doc_id") >= 250)
        .join(history, Seq("pfp"))
        .select(col("doc_id").as("new_doc"), col("existing_id"))
    }),

    // Incremental NEAR-dup ingest — the LSH-band complement of
    // t_incremental_dedup's prefix-fingerprint check: the arriving
    // batch (doc_id >= 250) probes the EXISTING corpus's band index
    // (doc_id < 250) with a band-keyed equi-join, and candidates are
    // verified by exact shingle-set Jaccard at the integer >= 0.5
    // threshold. At 100 TB the history side is a materialized
    // (band, bsig) -> doc_id index maintained incrementally (append
    // per batch, no rescans); here it is built in-query from the
    // split. Only verified near-dup links are reported — the anti-join
    // complement is the accept list.
    "t_incremental_lsh" -> ((s, d) => {
      val sig = minhashSig(s, d).cache()
      val bands = bandsOf(sig)
      val hist = bands.filter(col("doc_id") < LshBase)
        .select(col("band"), col("bsig"), col("doc_id").as("existing_id"))
      val cand = bands.filter(col("doc_id") >= LshBase)
        .select(col("band"), col("bsig"), col("doc_id").as("new_doc"))
        .join(hist, Seq("band", "bsig"))
        .select("new_doc", "existing_id").distinct()
      val out = verifyLinks(s, d, cand)
      sig.unpersist()
      out
    }),

    // Persisted band-index LIFECYCLE — the maintained-index claim of
    // t_incremental_lsh made real: the base corpus's (band, bsig,
    // doc_id) index is WRITTEN to parquet once; batch 1 ([LshBase,
    // LshBatch2)) probes the persisted files and its bands are
    // APPENDED; batch 2 (>= LshBatch2) then probes the UPDATED index,
    // so its links may hit batch-1 docs — history is never rescanned
    // or rebuilt, only appended, which is the 100 TB maintenance
    // story. The oracle recomputes both probes from scratch, so the
    // hash check IS the probe-against-persisted ==
    // probe-against-rebuilt equivalence. Memoized per (session, dir):
    // a re-invocation must serve the same result, not re-append.
    "t_lsh_index_lifecycle" -> ((s, d) => lshLifecycleMemo.getOrElseUpdate((s, d), {
      val sig = minhashSig(s, d).cache()
      val bands = bandsOf(sig)
      val idxDir = graft.core.TmpDirs.scratch("lsh_band_index", d)
      bands.filter(col("doc_id") < LshBase)
        .write.mode("overwrite").parquet(idxDir)
      def probePersisted(batch: DataFrame): DataFrame =
        batch.select(col("band"), col("bsig"), col("doc_id").as("new_doc"))
          .join(s.read.parquet(idxDir)
            .select(col("band"), col("bsig"), col("doc_id").as("existing_id")),
            Seq("band", "bsig"))
          .select("new_doc", "existing_id").distinct()
      val b1 = bands.filter(col("doc_id") >= LshBase && col("doc_id") < LshBatch2)
      // eager: batch 1's probe must see the PRE-append file set
      val cand1 = probePersisted(b1).localCheckpoint(true)
      b1.write.mode("append").parquet(idxDir)
      val cand2 = probePersisted(bands.filter(col("doc_id") >= LshBatch2))
        .localCheckpoint(true)
      val out = verifyLinks(s, d, cand1.union(cand2))
      sig.unpersist()
      out
    })),

    // Small-files compaction of the persisted band index — the
    // operational half of append-only indexing at 100 TB: every ingest
    // batch appends its own file set, and a year of hourly batches is
    // ~10⁴ file groups whose open/footer overhead dominates the probe
    // scan (the classic small-files problem). The query builds the
    // index DELIBERATELY fragmented (base + 2 appends, many small
    // files), compacts it with ONE keyed rewrite
    // (repartition(band) — co-locating each band's postings also makes
    // the probe join's shuffle one-sided at scale), asserts the file
    // count actually collapsed AND that probing the compacted index
    // returns byte-identical candidates (except-both-ways == 0 — a
    // compaction that loses or invents postings fails the query, not
    // just a check), then serves the probe from the compacted files.
    // The oracle recomputes candidates from the raw corpus, closing
    // fragment → compact → probe ≡ recompute end-to-end.
    "t_lsh_index_compact" -> ((s, d) => lshCompactMemo.getOrElseUpdate((s, d), {
      val sig = minhashSig(s, d).cache()
      val bands = bandsOf(sig)
      val fragDir = graft.core.TmpDirs.scratch("lsh_band_frag", d)
      val compDir = graft.core.TmpDirs.scratch("lsh_band_compact", d)
      bands.filter(col("doc_id") < LshBase)
        .repartition(8).write.mode("overwrite").parquet(fragDir)
      bands.filter(col("doc_id") >= LshBase && col("doc_id") < LshBatch2)
        .repartition(4).write.mode("append").parquet(fragDir)
      bands.filter(col("doc_id") >= LshBatch2 && col("doc_id") < LshProbeBase)
        .repartition(4).write.mode("append").parquet(fragDir)
      def dataFiles(dir: String): Int = new java.io.File(dir).listFiles()
        .count(f => f.getName.endsWith(".parquet"))
      val fragFiles = dataFiles(fragDir)
      s.read.parquet(fragDir).repartition(2, col("band"))
        .write.mode("overwrite").parquet(compDir)
      val compFiles = dataFiles(compDir)
      // a tiny corpus (sf0.001: 50 docs) leaves the append batches empty
      // and never fragments — the collapse assert fires only when the
      // fragmentation it checks actually happened
      if (fragFiles >= 16)
        require(compFiles < fragFiles / 4,
          s"compaction did not collapse files: $fragFiles -> $compFiles")
      def probe(dir: String): DataFrame =
        bands.filter(col("doc_id") >= LshProbeBase)
          .select(col("band"), col("bsig"), col("doc_id").as("new_doc"))
          .join(s.read.parquet(dir)
            .select(col("band"), col("bsig"), col("doc_id").as("existing_id")),
            Seq("band", "bsig"))
          .select("new_doc", "existing_id").distinct()
      val fromComp = probe(compDir).localCheckpoint(true)
      val fromFrag = probe(fragDir)
      require(fromComp.except(fromFrag).isEmpty && fromFrag.except(fromComp).isEmpty,
        "compacted probe diverged from the fragmented probe")
      sig.unpersist()
      fromComp
    })),

    // SimHash (16-bit) fingerprint, computed in-row (zero shuffle).
    "t_dedup_simhash" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), simhashColumn(col("text")).as("simhash"))),

    // Exact n-gram Jaccard for adjacent-id pairs sharing ≥1 shingle.
    // Shingle SETS stay in-row; the join is narrow (id = id+1) and the
    // intersection is a row-local array_intersect — no exploded
    // shingle-keyed shuffle.
    "t_ngram_jaccard" -> ((s, d) => {
      assertCapMemo(s, d) // its oracle uses the capped shingle CTE too
      val docs = Tables.documents(s, d)
        .repartition(s.sparkContext.defaultParallelism) // single-file source -> spread work
        .select(col("doc_id"), shingles(col("text")).as("sh")) // ShingleSet is distinct
        .cache() // shingle sets materialized once for both join sides
      val a = docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
      val b = docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
      a.join(b, col("doc_b") === col("doc_a") + 1)
        .select(col("doc_a"), col("doc_b"),
          graft.plans.TextVectorExprs.intersectSize(col("sh_a"), col("sh_b")).as("inter"),
          size(col("sh_a")).as("na"), size(col("sh_b")).as("nb"))
        .filter(col("inter") > 0)
        .select(col("doc_a"), col("doc_b"), col("inter"),
          (col("na") + col("nb") - col("inter")).cast("long").as("uni"),
          (col("inter").cast("double") / (col("na") + col("nb") - col("inter"))).as("jaccard"))
    }),

    // Benchmark decontamination (the pre-training hygiene pass: drop
    // training docs that share n-grams with the eval set). Docs with
    // id < 50 stand in as the benchmark; training docs report how many
    // of their distinct 3-gram shingles appear anywhere in it. Scale
    // shape: the benchmark side is tiny by nature -> its distinct
    // shingle HASHES broadcast (8 bytes each, not strings); the
    // training side is one explode + broadcast-join + doc-keyed
    // count — no all-pairs work, no string shuffle. The clean corpus
    // is the anti-join complement of this result.
    "t_decontaminate" -> ((s, d) => {
      assertCapMemo(s, d) // oracle reuses the capped shingle CTE
      val sh = Tables.documents(s, d)
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), explode(shingles(col("text"))).as("shingle"))
        .select(col("doc_id"), charHash(col("shingle")).as("h"))
      val bench = sh.filter(col("doc_id") < 50).select("h").distinct()
      val res = sh.filter(col("doc_id") >= 50)
        .join(broadcast(bench), Seq("h"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shared"))
      requireBroadcastOnly(res, "t_decontaminate")
      res
    }),

    // Bloom-filter decontamination — the shape for when even the
    // benchmark's distinct shingle HASHES are too many to broadcast
    // exactly (a full eval-suite sweep at 100 TB): the benchmark set
    // aggregates into a bloom filter (16 bits/item ≈ 5e-4 fpp), whose
    // bytes embed as a BINARY LITERAL, so the probe over the training
    // corpus is a pure fused projection — no join, no shuffle, no
    // broadcast exchange (asserted). Bloom merge is bitwise-OR, so the
    // built filter (and every count below) is partition-layout
    // independent. False positives only — the safe direction for
    // decontamination — and the exact broadcast join rides along here
    // to COUNT them. Declared rows are the exactly-contaminated docs
    // (DuckDB re-derives them) + a hashed per-doc no-false-negative
    // verdict; fpp is bounded by an in-query require and the specs.
    "t_decontaminate_bloom" -> ((s, d) => {
      val sh = Tables.documents(s, d)
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), explode(shingles(col("text"))).as("shingle"))
        .select(col("doc_id"), charHash(col("shingle")).as("h"))
      // benchmark-set distinct hashes, derived + CACHED once per
      // (session, corpus) — see [[benchSetMemo]]; every later action
      // broadcasts from the cache instead of re-running the scan.
      val bench = graft.core.CorpusCaches.cachedPerCorpus(benchSetMemo, s, d,
        // bloom is DERIVED from the cached set: evict its stale-corpus
        // entries in the same sweep (ADVICE r13)
        companions = Seq(bloomMemo))({
        val b = sh.filter(col("doc_id") < 50).select("h").distinct().persist()
        b.count() // materialize so callers never race the first fill
        b
      })(_.unpersist(blocking = false))
      // built once per (session, corpus) — the production shape pays
      // the benchmark-set aggregation once and serves many batches
      val bloom = bloomMemo.getOrElseUpdate((s, d), {
        val n = math.max(1L, bench.count())
        graft.plans.BloomExprs.buildBloom(bench, col("h"), n, n * 16L)
      })
      val train = sh.filter(col("doc_id") >= 50)
      // the production half: scan → projection → doc-keyed agg, proven
      // join-free (the exact side below exists only to measure fpp)
      val probeOnly = train.select(col("doc_id"),
        graft.plans.BloomExprs.mightContain(bloom, col("h")).as("hit"))
      require(!probeOnly.queryExecution.sparkPlan.exists(
          _.isInstanceOf[org.apache.spark.sql.execution.joins.BaseJoinExec]),
        "bloom probe must be join-free:\n" + probeOnly.queryExecution.sparkPlan)
      val perDoc = train
        .join(broadcast(bench.withColumn("exact", lit(1L))), Seq("h"), "left")
        .select(col("doc_id"),
          graft.plans.BloomExprs.mightContain(bloom, col("h")).cast("long").as("b"),
          coalesce(col("exact"), lit(0L)).as("e"))
        .groupBy("doc_id")
        .agg(sum("b").as("bloom_hits"), sum("e").as("exact_hits"))
      // ONE verdict pass over the corpus for all three invariants
      // (count(when(...)) is 0 on empty, never null) — the old three
      // separate .count() actions re-ran the whole upstream each time
      val v = perDoc.agg(
        count(when(col("exact_hits") > col("bloom_hits"), lit(1))).as("fneg"),
        count(when(col("bloom_hits") > 0 && col("exact_hits") === 0, lit(1))).as("fp"),
        count(when(col("exact_hits") === 0, lit(1))).as("clean")).head()
      val (fneg, fpDocs, cleanDocs) = (v.getLong(0), v.getLong(1), v.getLong(2))
      require(fneg == 0L,
        s"bloom decontamination produced $fneg false-negative docs — impossible by construction")
      // fpp stays measured in-query: bloom-flagged docs with zero exact
      // hits must stay rare at 16 bits/item (loose deterministic bound)
      require(fpDocs <= math.max(5L, cleanDocs / 20),
        s"bloom false-positive docs $fpDocs of $cleanDocs clean — fpp broke its design point")
      // RECORDED check (VERDICT r8 Next #2): the bloom's own hit counts
      // are Spark-sketch-specific, so the declared rows are the EXACT
      // contaminated docs (DuckDB re-derives doc_id + exact_hits — the
      // t_decontaminate arithmetic) plus the hashed no-false-negative
      // verdict per doc; a bloom break flips it (and throws above).
      perDoc.filter(col("exact_hits") > 0)
        .select(col("doc_id"), col("exact_hits"),
          (col("bloom_hits") >= col("exact_hits")).as("bloom_caught"))
    }),

    // N-gram novelty / boilerplate score (a CCNet-style LM proxy in
    // exact arithmetic): a document's signal is the mean corpus-wide
    // OCCURRENCE count of its 3-gram shingle hashes (not true document
    // frequency: a doc repeating a shingle contributes each occurrence,
    // and two distinct shingles colliding into one 8-byte hash pool
    // their counts — both effects are deterministic and identical on
    // the oracle side, and neither moves a boilerplate signal) —
    // boilerplate-heavy docs (nav chrome, license headers) score high,
    // novel text scores near 1. Counts are exact integers; the mean is
    // ONE division of two exact integers (IEEE-correctly-rounded on
    // both engines), so the score is bit-identical — no ln/perplexity
    // FP chain to diverge. Scale shape: per-row shingle explode →
    // 8-byte-hash keyed count (map-side combined) → hash-keyed join
    // back → doc-keyed agg; strings never leave their row.
    "t_ngram_novelty" -> ((s, d) => {
      assertCapMemo(s, d) // oracle reuses the capped shingle CTE
      val sh = Tables.documents(s, d)
        .select(col("doc_id"), explode(shingles(col("text"))).as("shingle"))
        .select(col("doc_id"), charHash(col("shingle")).as("h"))
      val dfreq = sh.groupBy("h").agg(count(lit(1)).as("df"))
      sh.join(dfreq, Seq("h"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shingles"), sum("df").as("sum_df"))
        .select(col("doc_id"), col("n_shingles"), col("sum_df"),
          (col("sum_df").cast("double") / col("n_shingles")).as("mean_df"))
    }),

    // Streaming benchmark decontamination — the arriving-corpus variant
    // of t_decontaminate: new training documents replayed as 2 file
    // micro-batches, each batch's distinct shingle hashes joined against
    // the BROADCAST benchmark set, flagged counts appended to the sink.
    // The per-batch plan is stateless (projection + broadcast join +
    // doc-keyed count; each doc is one row, so no doc spans batches) —
    // no watermark, no state store — so the union of batch outputs
    // equals the one-shot batch query, which is exactly the oracle.
    // This is the shape of continuous ingest hygiene at 100 TB: the
    // benchmark side stays resident, arriving shards stream through.
    "x_stream_decontaminate" -> ((s, d) => {
      assertCapMemo(s, d) // oracle reuses the capped shingle CTE
      val docs = Tables.documents(s, d)
      // cached: each of the 2 micro-batches runs an independent batch
      // job, so an uncached bench side would re-shingle + re-broadcast
      // the benchmark corpus per batch
      val bench = docs.filter(col("doc_id") < 50)
        .select(explode(shingles(col("text"))).as("shingle"))
        .select(charHash(col("shingle")).as("h")).distinct().cache()
      val stageDir = graft.core.TmpDirs.scratch("stream_decon_src", d)
      // 2 staged batches (was 4): the per-batch plan is stateless (no
      // watermark/state store), so the union of batch outputs equals
      // the one-shot batch query at ANY batch count — the extra
      // triggers were replay scaffolding (r9 Next #6 rule)
      docs.filter(col("doc_id") >= 50).repartition(2)
        .write.mode("overwrite").parquet(stageDir)
      val outDir = graft.core.TmpDirs.scratch("stream_decon_out", d)
      val stream = s.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(stageDir)
      val q = graft.streaming.StreamOps.foreachBatchSink(
        stream,
        batch => batch
          .select(col("doc_id"), explode(shingles(col("text"))).as("shingle"))
          .select(col("doc_id"), charHash(col("shingle")).as("h"))
          .join(broadcast(bench), Seq("h"))
          .groupBy("doc_id").agg(count(lit(1)).as("n_shared")),
        (flagged, _) => flagged.write.mode("append").parquet(outDir))
      q.processAllAvailable()
      graft.streaming.StreamOps.recordBatchMillis("x_stream_decontaminate", q)
      q.stop(); bench.unpersist()
      // explicit schema: if every micro-batch flagged zero rows the
      // sink dir has no parquet files and schema inference would throw
      // instead of degrading to an empty frame
      val flaggedSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          docs.schema("doc_id").dataType),
        org.apache.spark.sql.types.StructField("n_shared",
          org.apache.spark.sql.types.LongType)))
      s.read.schema(flaggedSchema).parquet(outDir)
    }),

    // Repetition filter (the Gopher-rule family: drop documents
    // dominated by one repeated token). top_ratio is a SINGLE division
    // of two exact integers, so the verdict threshold compares the
    // same double on both engines. Scale shape: explode + two keyed
    // aggregations, both map-side combined; no joins.
    "t_repetition_filter" -> ((s, d) => {
      val ratio = col("top_cnt").cast("double") / col("n_tokens")
      Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .groupBy("doc_id", "token").agg(count(lit(1)).as("cnt"))
        .groupBy("doc_id").agg(max("cnt").as("top_cnt"),
          sum("cnt").cast("long").as("n_tokens"))
        .select(col("doc_id"), col("n_tokens"), col("top_cnt"),
          ratio.as("top_ratio"), (ratio <= 0.2).as("keep"))
    }),

    // Language ID: stopword-hit scoring, argmax with alphabetical ties.
    "t_lang_id" -> ((s, d) => {
      val w = tokens(col("text"))
      val pred = predLangCol(w)
      Tables.documents(s, d).select(
        col("doc_id"), stopCount(w, enStop).as("s_en"),
        stopCount(w, deStop).as("s_de"), pred.as("pred_lang"),
        (pred === col("lang")).cast("long").as("is_match"))
    }),

    // Quality scoring: distinctness, length saturation, stopword ratio.
    "t_quality_score" -> ((s, d) => {
      val w = tokens(col("text"))
      val nTok  = size(w).cast("double")
      val nUniq = size(array_distinct(w)).cast("double")
      val nStop = stopCount(w, enStop).cast("double")
      Tables.documents(s, d).select(
        col("doc_id"),
        size(w).as("n_tokens"),
        (nUniq / nTok).as("distinct_ratio"),
        (nStop / nTok).as("stopword_ratio"),
        (lit(0.4) * (nUniq / nTok)
          + lit(0.3) * least(nTok / 100.0, lit(1.0))
          + lit(0.3) * (lit(1.0) - nStop / nTok)).as("quality"))
    }),

    // Token counting: whitespace + BPE-ish regex segmentation.
    // ONE-pass token-stats kernel (graft.plans.TokenCounts) instead of
    // split + regexp_extract_all + length: three passes and ~11 ms/doc
    // of regex automaton became a single UTF-8 byte scan (5.8 s →
    // sub-second on 500 × ~100 KB docs). The oracle keeps the regex
    // form, so the hash match proves the kernel IS the regex;
    // TokenCountSpec pins the edge cases (runs, unicode, empties).
    "t_token_count" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), graft.plans.TokenCounts.column(col("text")).as("tc"))
        .select(col("doc_id"),
          col("tc.ws_tokens").as("ws_tokens"),
          col("tc.bpe_tokens").as("bpe_tokens"),
          col("tc.n_chars").as("n_chars_computed"))),

    // Brute-force cosine top-5 — the ANN baseline. Norms are computed
    // ONCE per row before the join (not per pair): the pair-level work
    // is one dot product + a division.
    "t_embed_knn" -> ((s, d) => {
      val e = Tables.embeddings(s, d).select(
        col("vec_id"), col("embedding"), Fns.normSq(col("embedding")).as("nsq"))
        .cache() // norms computed once, reused by query and candidate sides
      val q = e.filter(col("vec_id") < 100)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("nsq").as("q_nsq"))
      // broadcast(q): without the hint the filtered-scan estimate never
      // clears the broadcast threshold and the cross join plans as
      // CartesianProduct, which buffers every corpus partition in a
      // spill array re-read once per query row (see t_embed_quantize —
      // the same scale-dependent threshold crossing, measured 20x at
      // the 1000x corpus); BNLJ streams the corpus side unbuffered.
      val pairs = e.crossJoin(broadcast(q)).filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("n_id"),
          (Fns.dotProduct(col("q_emb"), col("embedding"))
            / (sqrt(col("q_nsq")) * sqrt(col("nsq")))).as("cos"))
      // Top-5 via the hash-aggregable ArgTopK kernel — identical rows
      // and rn values to row_number() OVER (PARTITION BY q_id ORDER BY
      // cos DESC, n_id) <= 5 (ArgTopKSpec pins the equivalence): the
      // window form sorted the ENTIRE probe x corpus product to keep 5
      // rows per query — the r15 third-decade text spot measured that
      // sort at 17x/decade. ObjectHashAggregate folds each partition
      // to a 5-entry state per query map-side; nothing global is
      // sorted, so the row scales with the dot products it computes.
      pairs.groupBy("q_id")
        .agg(graft.plans.ArgTopK.column(col("cos"), col("n_id"), col("cos"), 5).as("tops"))
        .select(col("q_id"), posexplode(col("tops")))
        .select(col("q_id"), col("col.n_id").as("n_id"), col("col.v").as("cos"),
          (col("pos") + 1).cast("int").as("rn"))
    }),

    // SRP-LSH bucketing — the 100 TB similarity-search path: random-
    // hyperplane signs partition vectors into 2^srpBits(n) buckets
    // (width grows with the corpus so occupancy stays ~64).
    "t_ann_lsh_bucket" -> ((s, d) => {
      val bits = srpBits(Tables.embeddings(s, d).count())
      Tables.embeddings(s, d)
        .select(col("vec_id"), srpBucket(col("embedding"), bits).as("bucket"))
    }),

    // Within-bucket top-1 neighbor: equi-join on bucket replaces the
    // all-pairs cross join; argmax via single-pass min_by (no sort).
    // Bucket width is adaptive (srpBits) and occupancy is capped
    // ([[AnnBucketCap]] + secondary-hash split, [[annBucketTop1]]) —
    // width bounds the EXPECTED bucket, the cap bounds the adversarial
    // near-dup mega-bucket, so the join is linear in n even on skew.
    "t_ann_bucket_top1" -> ((s, d) => {
      val bits = srpBits(Tables.embeddings(s, d).count())
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"), srpBucket(col("embedding"), bits).as("bucket"),
          Fns.normSq(col("embedding")).as("nsq"))
        .cache() // buckets + norms materialized once for both sides
      annBucketTop1(e, AnnBucketCap)
    }),

    // Embedding-cosine near-dup pairs: all pairs above a similarity
    // threshold (threshold chosen for non-empty output on the random
    // testdata; real corpora use ~0.95). Brute force here as the
    // oracle-checkable baseline; the LSH-bucketed variant above is the
    // scale path for high thresholds.
    "t_dedup_cosine" -> ((s, d) => {
      val e = Tables.embeddings(s, d).select(
        col("vec_id"), col("embedding"), Fns.normSq(col("embedding")).as("nsq"))
        .cache()
      // query side capped: brute force is the BASELINE; unbounded
      // all-pairs at scale goes through the LSH-bucket path instead.
      val a = e.filter(col("vec_id") < 500)
        .select(col("vec_id").as("id_a"), col("embedding").as("emb_a"), col("nsq").as("nsq_a"))
      val b = e.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"), col("nsq").as("nsq_b"))
      a.crossJoin(b).filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          (Fns.dotProduct(col("emb_a"), col("emb_b"))
            / (sqrt(col("nsq_a")) * sqrt(col("nsq_b")))).as("cos"))
        .filter(col("cos") >= 0.45)
    }),

    // Multimodal-column plumbing STUB: the decode itself is a
    // deterministic fake (no image/audio libs in this container); the
    // Spark-side schema/partitioning/batching is real — see
    // graft.multimodal for the mapPartitions pipeline.
    "t_multimodal_stub" -> ((s, d) => {
      val fp = charHash(col("text"))
      val byteLen = length(col("text"))
      Tables.documents(s, d).select(
        col("doc_id"),
        byteLen.as("byte_len"),
        (fp % 640).as("fake_width"),
        (floor(fp / 640.0).cast("long") % 480).as("fake_height"),
        floor(byteLen / 100.0).cast("long").as("fake_frames"))
    }),

    // Vocabulary building (the tokenizer-training / corpus-stats pass):
    // term frequency + document frequency per token, top-100 by tf.
    // Scale shape: explode is row-local; the groupBy partial-aggregates
    // map-side (heavy-hitter tokens combine before the shuffle); the
    // top-k is orderBy+limit = TakeOrdered (per-partition heaps + a
    // driver merge of 100-row heads, NOT a full sort shuffle). df needs
    // distinct doc_ids per token — bounded by the group's doc set; the
    // (tf desc, token) order is total, so LIMIT is deterministic.
    "t_vocab_topk" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("tf"), count_distinct(col("doc_id")).as("df"))
        .orderBy(col("tf").desc, col("token"))
        .limit(100)),

    // BM25-ranked retrieval (the lexical-search counterpart of the ANN
    // family): top-10 docs for a fixed 3-term query under BM25
    // (k1=1.2, b=0.75; Robertson-Sparck Jones idf as the RATIO
    // (N-df+0.5)/(df+0.5) — no ln, whose last-ulp behavior differs
    // across libm implementations; ln is monotone in the ratio, so the
    // RANKING is identical to classic BM25 for single-term weights and
    // the score stays a fixed-order chain of correctly-rounded IEEE
    // ops that both engines reproduce bitwise). Scale shape: the
    // isin(query-terms) filter applies AT THE EXPLODE, so only
    // (doc, query-term) pairs — |q|·matching docs, not the corpus
    // token stream — ever shuffle; df/N/avgdl are a 3-row and a 1-row
    // broadcast; per-term scores pivot into FIXED columns added in a
    // fixed order (a float SUM over a group would be order-dependent
    // and flip ulps under repartitioning); top-k = TakeOrdered.
    "t_bm25_search" -> ((s, d) => {
      val terms = Seq("join", "vector", "stream")
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), col("toks"), size(col("toks")).as("dl"))
      val stats = docs.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      val tf = docs
        .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
        .filter(col("term").isin(terms: _*))
        .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val scored = tf
        .join(broadcast(df), "term")
        .crossJoin(broadcast(stats))
        .withColumn("score", expr(
          """(CAST(n_docs - df AS DOUBLE) + 0.5D) / (CAST(df AS DOUBLE) + 0.5D)
            | * (CAST(tf AS DOUBLE) * 2.2D
            |    / (CAST(tf AS DOUBLE)
            |       + 1.2D * (0.25D + 0.75D
            |                 * (CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))""".stripMargin))
      val pivoted = scored.groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_terms"),
          sum(when(col("term") === terms(0), col("score"))).as("s0"),
          sum(when(col("term") === terms(1), col("score"))).as("s1"),
          sum(when(col("term") === terms(2), col("score"))).as("s2"))
      pivoted.select(col("doc_id"), col("n_terms"),
          (coalesce(col("s0"), lit(0.0)) + coalesce(col("s1"), lit(0.0))
            + coalesce(col("s2"), lit(0.0))).as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(10)
    }),

    // BPE merge-candidate counting — the inner loop of tokenizer
    // training (each BPE iteration picks the most frequent adjacent
    // pair; reference for the algorithm: Sennrich et al. 2016): count
    // every adjacent token pair across the corpus, top-100 merge
    // candidates by frequency. Scale shape: the pair list is built
    // INSIDE the row (zip_with of two slices — one fused projection,
    // no self-join on token position, no shuffle of token streams);
    // the groupBy partial-aggregates map-side, so heavy-hitter pairs
    // (exactly the ones BPE wants) combine before the shuffle; top-k =
    // orderBy+limit = TakeOrdered per-partition heaps, not a full
    // sort. (tf desc, pair) is a total order, so LIMIT is
    // deterministic. Requires the oracle token cap (the pairs CTE uses
    // the same generate_series bound as the shingle CTE).
    "t_bpe_pair_counts" -> ((s, d) => {
      assertCapMemo(s, d)
      // Per-doc pair frequencies are computed IN the row (ArrayFreqs —
      // one entry per DISTINCT bigram with its occurrence count), so
      // tf = sum(per-doc tf) and df = count(*): each doc contributes
      // each pair exactly once, which is count_distinct(doc_id) by
      // construction — WITHOUT the distinct aggregate. The former
      // count_distinct form expanded every (pair, doc_id) OCCURRENCE
      // into a two-phase dedup shuffle keyed on (pair, doc_id) — the
      // r15 third-decade text spot measured it at 15x/decade on the
      // 285M-occurrence corpus; the row-local form ships only distinct
      // pairs into a plain hash aggregate that collapses map-side
      // (TermFreqsSpec pins the kernel equivalence).
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), explode(graft.plans.TermFreqs.arrayColumn(expr(
          """zip_with(slice(toks, 1, size(toks) - 1),
            |         slice(toks, 2, size(toks) - 1),
            |         (a, b) -> concat(a, ' ', b))""".stripMargin))).as("kv"))
        .groupBy(col("kv.t").as("pair"))
        .agg(sum(col("kv.tf")).as("tf"), count(lit(1)).as("df"))
        .orderBy(col("tf").desc, col("pair"))
        .limit(100)
    }),

    // Deterministic balanced downsampling (the class-rebalance pass a
    // training pipeline runs before fitting): every event class is
    // Bernoulli-downsampled toward the minority class size by a hash
    // threshold on event_id — keep iff bucket(event_id) < M*target/cnt.
    // Scale shape: ONE scan + a broadcast of the tiny per-class count
    // table; no window over skewed class partitions (the exact-k
    // variant's row_number would funnel each class through one
    // reducer — that is the non-scalable formulation). Integer-only
    // hashing, so retries, AQE re-plans and the DuckDB oracle agree
    // bit-exactly; sampled sizes land within Bernoulli noise of the
    // minority count.
    "t_balanced_sample" -> ((s, d) => {
      val e = Tables.events(s, d)
      // ONE aggregation pass over events: per-class counts + the
      // overflow guard's max id, collected once — target and the tiny
      // broadcast side both come from the collected rows instead of
      // re-running the scan as the join's build side.
      val countRows = e.groupBy("event_type").agg(
        count(lit(1)).as("cnt")).collect()
      val target = countRows.map(_.getLong(1)).min
      import s.implicits._
      val counts = countRows.map(r => (r.getString(0), r.getLong(1))).toSeq
        .toDF("event_type", "cnt")
      val bucket = Hashing.bucket(col("event_id"), 1000000L)
      // keep iff bucket < M*target/cnt, cross-multiplied to stay in
      // exact BIGINT arithmetic (no division, no FP, no floor-vs-div
      // disagreement between engines)
      val res = e.join(broadcast(counts), "event_type")
        .filter(bucket * col("cnt") < lit(1000000L) * lit(target))
        .select(col("event_id"), col("event_type"), col("user_id"))
      requireBroadcastOnly(res, "t_balanced_sample")
      res
    }),

    // Deterministic train/val/test split (the reproducible-split pass
    // every training pipeline needs): assignment is a pure function of
    // doc_id — an integer hash bucket cut at 80/10/10 — so it is stable
    // under retries, AQE re-plans, repartitioning and incremental
    // re-runs (a random() split is none of those). Scale shape: one
    // projection + one map-side-combined aggregation; no shuffle of
    // document content, no driver state.
    "t_split_assign" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val split = when(idBucket < 800000L, "train")
        .when(idBucket < 900000L, "val")
        .otherwise("test")
      docs.select(split.as("split"), col("n_chars"), col("doc_id"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("sum_chars"),
          min("doc_id").as("min_doc"),
          max("doc_id").as("max_doc"))
    }),

    // Deterministic corpus shuffle (the pre-training global
    // permutation: decorrelate crawl order before packing). Every doc
    // gets a reproducible global rank under the order
    // (hash(doc_id), doc_id) — stable across retries/AQE like every
    // hash in this family. Declared at [[ShuffleShards]] range shards
    // (ONE constant, interpolated into the oracle too); the permutation
    // is shard-count-INDEPENDENT (spec-pinned), so a 100 TB run simply
    // raises the shard count.
    "t_corpus_shuffle" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      corpusShuffle(docs, ShuffleShards)
    }),

    // Source-weighted mixture sampling (the multilingual-T5-style
    // temperature rule, alpha = 0.5: keep ~ sqrt(n_s)·K docs of each
    // source, so dominant sources are downsampled hard and tail
    // sources barely at all). Per-source quotas come from ONE tiny
    // aggregation collected to the driver; membership is the same
    // integer hash-threshold Bernoulli as t_balanced_sample,
    // cross-multiplied into exact BIGINT arithmetic. sqrt is the one
    // FP op and it is IEEE-correctly-rounded on both engines, so
    // floor(sqrt(n)) is bit-identical. Scale shape: one scan + a
    // broadcast of the ~|sources| quota table.
    "t_mix_sources" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val countRows = docs.groupBy("source").agg(
        count(lit(1)).as("cnt")).collect()
      import s.implicits._
      val quotas = countRows.map { r =>
        val n = r.getLong(1)
        (r.getString(0), n, math.sqrt(n.toDouble).toLong * 4L)
      }.toSeq.toDF("source", "cnt", "quota")
      val kept = docs.join(broadcast(quotas), "source")
        .filter(idBucket * col("cnt") < lit(1000000L) * col("quota"))
        .groupBy("source").agg(count(lit(1)).as("n_kept"))
      val res = quotas.join(broadcast(kept), Seq("source"), "left")
        .select(col("source"), col("cnt").as("n_docs"), col("quota"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"))
      requireBroadcastOnly(res, "t_mix_sources")
      res
    }),

    // PII redaction (the scrub pass a corpus runs before training):
    // email / phone / IPv4 patterns replaced with typed placeholders,
    // plus per-type match counts. The corpus is synthetic tokens with
    // no PII, so each document's contact line is DERIVED from
    // (doc_id, source) identically on both engines — the oracle then
    // checks the actual redaction logic, not a row of zeros. Patterns
    // stay inside the Java-regex/RE2 common subset (character classes,
    // bounded repetition, \b) so Spark and DuckDB agree. Scale shape:
    // fused projection, embarrassingly parallel, zero shuffle.
    "t_pii_redact" -> ((s, d) => {
      val idStr = col("doc_id").cast("string")
      val contact = concat(
        lit("user"), idStr, lit("@"), col("source"), lit(".org tel +1-555-"),
        lpad((col("doc_id") * 7919L % 10000L).cast("string"), 4, "0"),
        lit(" ip 10."), (col("doc_id") % 256L).cast("string"), lit("."),
        (col("doc_id") * 31L % 256L).cast("string"), lit(".7 "),
        substring(col("text"), 1, 40),
        when(col("doc_id") % 3L === 0L, lit(" alt bob@mail.net")).otherwise(lit("")))
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phone = "\\+1-555-[0-9]{4}"
      val ip = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
      Tables.documents(s, d).select(
        col("doc_id"),
        size(regexp_extract_all(contact, lit(email), lit(0))).as("n_emails"),
        size(regexp_extract_all(contact, lit(phone), lit(0))).as("n_phones"),
        size(regexp_extract_all(contact, lit(ip), lit(0))).as("n_ips"),
        regexp_replace(
          regexp_replace(
            regexp_replace(contact, email, "<EMAIL>"),
            phone, "<PHONE>"),
          ip, "<IP>").as("redacted"))
    }),

    // Document chunking with overlap (the RAG / long-context
    // preprocessing step): each document split into 32-token windows at
    // stride 24 (8-token overlap), emitting per-chunk start, length and
    // an integer fingerprint of the chunk text. Entirely row-local —
    // sequence + explode + slice never leave the row, so the operator
    // is embarrassingly parallel at any scale; chunk identity is the
    // same polynomial hash the dedup family uses, so downstream
    // chunk-level dedup composes directly. Token-capped oracle (same
    // generate_series cap + fail-loud guard as the shingle CTE).
    "t_doc_chunking" -> ((s, d) => chunkFrame(s, d)),

    // Chunk-level dedup — the window-granular approximation of exact
    // substring deduplication (the "repeated passages hurt LM quality"
    // pass): chunks grouped by (fingerprint, length) across the whole
    // corpus, groups appearing more than once reported with their copy
    // and distinct-doc counts. Composes t_doc_chunking directly; scale
    // shape is the exact-dedup one — the shuffle moves (hash, len) keys
    // (~16 B/chunk), never chunk text.
    "t_chunk_dedup" -> ((s, d) =>
      chunkFrame(s, d)
        .groupBy("chunk_fp", "chunk_tokens")
        .agg(count(lit(1)).as("n_copies"),
          count_distinct(col("doc_id")).as("n_docs"),
          min("doc_id").as("first_doc"))
        .filter(col("n_copies") > 1)),

    // Sequence packing (the concat-then-chunk step that turns a cleaned
    // corpus into fixed-budget training sequences): documents are
    // hash-split into 8 independent streams, each stream concatenated
    // in deterministic doc_id order, and chunked at a 2048-token
    // budget — pack_id = (cumulative_tokens - 1) div budget, pure
    // integer arithmetic over a per-shard running sum. Scale shape: the
    // window is PARTITIONED BY shard, so the inherently-sequential
    // running sum parallelizes across shards (one shuffle on the shard
    // key) — the per-shard order is the only sequential dependency, by
    // construction of the packing semantics. Result = per-pack manifest
    // (doc count, token sum, id range), the thing a trainer's data
    // loader actually consumes.
    "t_seq_packing" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      packManifest(docs)
    }),

    // The trainer-facing pack PAYLOAD (t_seq_packing emits the
    // manifest; this emits the sequences): each pack's member docs
    // concatenated in doc_id order (single space standing in for the
    // EOS separator), shipped as a fingerprint + token length so the
    // oracle checks payload INTEGRITY without hashing megabytes
    // through the driver. Order inside the aggregate is pinned by
    // array_sort on (doc_id, text) structs — collect_list alone is
    // partition-order-dependent and would break run-to-run
    // determinism. Scale shape: same (shard)-keyed window as the
    // manifest, then one keyed agg; payload strings move once, to
    // their reducer — exactly the shuffle the real payload write pays.
    "t_pack_payload" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val w = Window.partitionBy("shard").orderBy("doc_id")
      val staged = docs.filter(col("text").isNotNull)
        .select(col("doc_id"), col("text"),
          Hashing.bucket(col("doc_id"), 8L).as("shard"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
        .withColumn("cum", sum("n_tok").over(w))
        .withColumn("pack_id", expr("(cum - 1) div 2048"))
      staged.groupBy("shard", "pack_id")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tok").as("payload_tokens"),
          charHash(array_join(
            transform(array_sort(collect_list(struct(col("doc_id"), col("text")))),
              x => x.getField("text")), " ")).as("payload_fp"))
    }),

    // The full corpus-cleaning pass as ONE Spark plan — the shape a
    // real 100 TB pipeline runs nightly: exact-dup canonicalization,
    // language mismatch, low-distinctness, and Gopher-repetition
    // verdicts composed with a fixed priority, aggregated per source.
    // EVERY verdict rule is pure integer arithmetic / string equality
    // (n_uniq*2 < n_tok is the integer form of distinct_ratio < 0.5;
    // top_cnt*5 > n_tokens of top_ratio > 0.2) — no FP anywhere, so
    // the per-doc verdict is bit-identical on any engine. Scale shape:
    // the dup check shuffles (hash,len) keys (~16 B/row, never
    // content); the repetition stats are two map-side-combined keyed
    // aggs; lang/distinctness never leave their row; one final keyed
    // agg over (source, verdict).
    "t_filter_pipeline" -> ((s, d) =>
      verdictFrame(s, d)
        .groupBy("source", "verdict")
        .agg(count(lit(1)).as("n_docs"))),

    // The whole corpus-to-trainer path as ONE declared query: the
    // cleaning pipeline's per-doc verdict selects the surviving
    // documents, which are then sequence-packed into the per-pack
    // manifest — corpus in, training manifest out. Every stage reuses
    // the exact shared definitions (verdictFrame, packManifest), so
    // this composite can never disagree with its component queries.
    "x_pipeline_e2e" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val kept = verdictFrame(s, d)
        .filter(col("verdict") === "kept").select("doc_id")
      packManifest(docs.join(kept, "doc_id"))
    })
  )

  /** Sequence-packing manifest over any (doc_id, text) frame:
    * `numShards` hash shards, per-shard running token sum in
    * deterministic doc_id order, chunked at a 2048-token budget —
    * pack_id = (cum − 1) div budget, pure integer arithmetic. Shared by
    * t_seq_packing and x_pipeline_e2e (both pin numShards = 8 for
    * oracle stability). The shard count IS the reducer parallelism of
    * the running sum: at 100 TB size it so each shard's token stream
    * fits one task comfortably (corpus_tokens / numShards ≲ 10^9;
    * e.g. a 25-trillion-token corpus wants numShards ≳ 25k). Any value
    * keeps determinism — shard membership is a pure hash of doc_id and
    * pack boundaries are per-shard. */
  private[queries] def packManifest(docs: DataFrame, numShards: Long = 8L): DataFrame = {
    val w = Window.partitionBy("shard").orderBy("doc_id")
    // NULL-text guard: Spark size(split(NULL)) = -1 would feed the
    // running sum while the oracle's len(string_split(NULL)) is NULL —
    // same defense chunkFrame carries
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"),
        Hashing.bucket(col("doc_id"), numShards).as("shard"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .withColumn("cum", sum("n_tok").over(w))
      .withColumn("pack_id", expr("(cum - 1) div 2048"))
      .groupBy("shard", "pack_id")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tok").as("sum_tokens"),
        min("doc_id").as("first_doc"),
        max("doc_id").as("last_doc"))
  }

  /** Per-document cleaning verdict — (doc_id, source, verdict) with the
    * fixed priority dup > near_dup > lang_mismatch > low_quality >
    * repetitive > kept; every rule integer/string-exact. Shared by
    * t_filter_pipeline and x_pipeline_e2e. */
  private def verdictFrame(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val w = tokens(col("text"))
    val sTotal = Seq(enStop, deStop, esStop, frStop, zhStop)
      .map(stopCount(w, _)).reduce(_ + _)
    val base = docs.select(col("doc_id"), col("source"), col("lang"),
      TextHash.charHash(col("text")).as("fp"), length(col("text")).as("len"),
      size(w).as("n_tok"), size(array_distinct(w)).as("n_uniq"),
      sTotal.as("s_total"), predLangCol(w).as("pred_lang"))
    // r17 (guide §2.4 — share the exchange): canonical_id = min(doc_id)
    // per (fp, len) used to be a groupBy + SortMergeJoin BACK onto base
    // — two shuffles + two full sorts of base for a value a window over
    // the SAME key computes inside one exchange (every base row matches
    // its own group by construction, so join ≡ window row for row). At
    // 100 TB that is one full corpus shuffle saved from this pipeline.
    val canon = base.withColumn("canonical_id",
      min("doc_id").over(Window.partitionBy("fp", "len")))
    val rep = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id").agg(max("cnt").as("top_cnt"),
        sum("cnt").as("n_tokens"))
    val clusters = clusterLabels(s, d)
      .select(col("doc_id"), col("cluster"))
    val verdict = when(col("doc_id") =!= col("canonical_id"), "dup")
      .when(col("cluster").isNotNull && col("doc_id") =!= col("cluster"),
        "near_dup")
      .when(col("s_total") > 0 && col("pred_lang") =!= col("lang"),
        "lang_mismatch")
      .when(col("n_uniq") * 2 < col("n_tok"), "low_quality")
      .when(col("top_cnt") * 5 > col("n_tokens"), "repetitive")
      .otherwise("kept")
    canon
      .join(rep, "doc_id")
      .join(clusters, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"), verdict.as("verdict"))
  }

  /** Deterministic global shuffle rank, computed the scale-correct way
    * (the canonical distributed total-order sort, with deterministic
    * boundaries instead of sampled ones): shuffle key = integer hash of
    * doc_id; RANGE shards over the key space ((skey * n) div P, so
    * shard-major order IS key order); per-shard local ranks from one
    * keyed window; global rank = shard offset + local rank, offsets
    * from an n-row aggregate. No global window, no single reducer —
    * reducer parallelism is `nShards`, a free parameter: concatenating
    * contiguous key ranges reproduces the SAME permutation at any
    * shard count (DedupScaleSpec pins 8 vs 64). */
  private[queries] def corpusShuffle(docs: DataFrame, nShards: Long): DataFrame = {
    val keyed = docs.select(col("doc_id"),
        Hashing.bucket(col("doc_id"), TextHash.P).as("skey"))
      .withColumn("shard", expr(s"(skey * $nShards) div ${TextHash.P}"))
    // nShards rows: the offset table is driver-tiny at any corpus size,
    // so the unpartitioned window is fine — and it broadcasts.
    val offsets = keyed.groupBy("shard").agg(count(lit(1)).as("n"))
      .withColumn("off", sum("n").over(Window.orderBy("shard")) - col("n"))
      .select(col("shard"), col("off"))
    keyed
      .withColumn("lr", row_number().over(
        Window.partitionBy("shard").orderBy("skey", "doc_id")))
      .join(broadcast(offsets), "shard")
      .select(col("doc_id"), col("skey"),
        (col("off") + col("lr")).cast("long").as("shuffle_rank"))
  }

  /** Sampling/split family bucket: [[graft.functions.Hashing]] over
    * doc_id, mod 1e6. */
  private def idBucket: Column = Hashing.bucket(col("doc_id"), 1000000L)
  // overflow guard memoized per (session, corpus) so timed bench
  // re-invocations don't re-pay the max() scan
  // ------------------------- oracle SQL ------------------------------

  private val P = TextHash.P

  private def chSql(e: String): String =
    s"list_reduce(list_prepend(0::BIGINT, [ord(c)::BIGINT FOR c IN string_split($e, '')]), (h, x) -> (h * 31 + x) % $P)"

  /** (doc_id, shingle) distinct word-3-gram CTE body. DuckDB can't
    * lateral-join generate_series on a column arg, so the series bound
    * is the fixed [[OracleTokenCap]]; [[assertUnderOracleTokenCap]]
    * fails every minhash query loudly if the corpus ever exceeds it
    * (silent oracle-side truncation otherwise).
    */
  private val shingleCte =
    s"""words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
       |       FROM words, generate_series(1, $OracleTokenCap) t(i) WHERE i <= len(w) - 2)""".stripMargin

  private val minhashCte = {
    val mins = (0 until NumPerms)
      .map(k => s"min((h * ${permA(k)} + ${permB(k)}) % $P) AS m$k").mkString(", ")
    s"""$shingleCte,
       |hh AS (SELECT doc_id, ${chSql("shingle")} AS h FROM sh),
       |m AS (SELECT doc_id, $mins FROM hh GROUP BY doc_id)""".stripMargin
  }

  /** The LSH band-join candidate pairs as SQL CTEs (`bands`, `pairs`)
    * over the minhash CTE's `m` — ONE definition shared by the pair
    * and cluster oracles so they can never check different graphs. */
  /** Exact-Jaccard verification tail over a `cand(new_doc,
    * existing_id)` CTE (requires the minhash CTE's `sh` upstream) —
    * ONE definition shared by the incremental and lifecycle oracles,
    * mirroring [[verifyLinks]]. */
  private val verifyLinksCte =
    """cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (SELECT c.new_doc, c.existing_id, count(*) AS inter
      |          FROM cand c
      |          JOIN sh a ON a.doc_id = c.new_doc
      |          JOIN sh b ON b.doc_id = c.existing_id AND b.shingle = a.shingle
      |          GROUP BY 1, 2)
      |SELECT i.new_doc, i.existing_id, i.inter::BIGINT AS inter,
      |       (ca.n + cb.n - i.inter)::BIGINT AS uni
      |FROM inter i JOIN cnt ca ON ca.doc_id = i.new_doc
      |     JOIN cnt cb ON cb.doc_id = i.existing_id
      |WHERE i.inter * 2 >= ca.n + cb.n - i.inter""".stripMargin

  private val bandsPairsCte = {
    val bandSelects = (0 until NumBands).map { b =>
      val sig = (0 until RowsPerBand).map(r => s"m${b * RowsPerBand + r}").mkString(" || '-' || ")
      s"SELECT doc_id, $b AS band, $sig AS bsig FROM m"
    }.mkString(" UNION ALL ")
    s"""bands AS ($bandSelects),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id)""".stripMargin
  }

  /** LSH connected-components CTE chain ending in
    * `clu(doc_id, cluster)` — shared by the cluster and keep-best
    * oracles so they can never check different graphs. Requires
    * `WITH RECURSIVE $minhashCte` upstream. */
  private val clusterCte =
    s"""$bandsPairsCte,
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |          UNION ALL SELECT doc_b, doc_a FROM pairs),
       |nodes AS (SELECT DISTINCT src AS id FROM edges),
       |reach(id, lab) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id),
       |clu AS (SELECT id AS doc_id, min(lab) AS cluster FROM reach GROUP BY id)""".stripMargin

  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0, [z[1]::DOUBLE * z[2]::DOUBLE FOR z IN list_zip($a, $b)]), (acc, v) -> acc + v)"

  private def planeSql(k: Int): String =
    hyperplane(k).map(_.toString).mkString("[", ", ", "]")

  /** SQL mirror of [[srpBits]]: the same integer CASE ladder over
    * n = count(*) of embeddings — no float log2, so both engines pick
    * the identical width at ANY corpus size (ADVICE r10: the old fixed
    * 8-bit oracle silently diverged past 16384 vectors). Emitted as a
    * 1-row CTE (`sb`) cross-joined into the SRP oracles. */
  private val srpBitsSql: String = {
    val ladder = (8 until 20).map(b => s"WHEN n <= ${64L << b} THEN $b").mkString(" ")
    s"SELECT CASE $ladder ELSE 20 END AS bits FROM (SELECT count(*) AS n FROM embeddings)"
  }

  /** Adaptive-width SRP bucket in SQL: all 20 plane terms generated,
    * each gated on `sb.bits` — plane k contributes 2^k only when
    * k < bits, mirroring [[srpBucket]] at whatever width [[srpBitsSql]]
    * selects. Requires `CROSS JOIN sb` in the enclosing query. */
  private val bucketSql: String =
    (0 until 20).map { k =>
      s"(CASE WHEN $k < sb.bits AND ${dotSql("embedding", planeSql(k))} >= 0.0 THEN ${1L << k} ELSE 0 END)"
    }.mkString(" + ")

  private def stopSql(stop: Seq[String]): String =
    s"len(list_filter(string_split(text, ' '), t -> t IN (${stop.map(x => s"'$x'").mkString(", ")})))"

  /** Chunk CTE (`chunks`) — mirrors [[chunkFrame]]; shared by the
    * t_doc_chunking and t_chunk_dedup oracles. Token-capped
    * generate_series like the shingle CTE ([[assertUnderOracleTokenCap]]
    * guards both). */
  private lazy val chunkCteSql: String =
    s"""words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |chunks AS (
       |  SELECT doc_id, (i // 24)::BIGINT AS chunk_id, i::BIGINT AS start_tok,
       |         least(32, len(w) - i)::BIGINT AS chunk_tokens,
       |         ${chSql("array_to_string(w[i + 1 : i + least(32, len(w) - i)], ' ')")} AS chunk_fp
       |  FROM words, generate_series(0, $OracleTokenCap, 24) t(i)
       |  WHERE i <= len(w) - 1)""".stripMargin

  /** Stopword-argmax language CASE — one definition shared by the
    * t_lang_id and t_filter_pipeline oracles (mirrors predLangCol). */
  private val langCaseSql: String = {
    val (sDe, sEn, sEs, sFr, sZh) =
      (stopSql(deStop), stopSql(enStop), stopSql(esStop), stopSql(frStop), stopSql(zhStop))
    s"""CASE WHEN $sDe >= $sEn AND $sDe >= $sEs AND $sDe >= $sFr AND $sDe >= $sZh THEN 'de'
       |       WHEN $sEn >= $sEs AND $sEn >= $sFr AND $sEn >= $sZh THEN 'en'
       |       WHEN $sEs >= $sFr AND $sEs >= $sZh THEN 'es'
       |       WHEN $sFr >= $sZh THEN 'fr'
       |       ELSE 'zh' END""".stripMargin
  }

  def oracle: Map[String, String] = staticOracle ++ bpeOracle

  private lazy val staticOracle: Map[String, String] = Map(
    "t_dedup_exact" ->
      """SELECT min(doc_id) AS canonical_id, count(*) AS n_copies
        |FROM documents GROUP BY text""".stripMargin,
    "t_dedup_exact_hash" ->
      s"""SELECT min(doc_id) AS canonical_id, count(*) AS n_copies
         |FROM (SELECT doc_id, ${chSql("text")} AS fp, length(text) AS len FROM documents)
         |GROUP BY fp, len""".stripMargin,
    "t_fingerprint" ->
      s"SELECT doc_id, ${chSql("text")} AS fp FROM documents",
    "t_minhash_sig" ->
      s"""WITH $minhashCte
         |SELECT doc_id, ${(0 until NumPerms).map(k => s"m$k").mkString(" || '-' || ")} AS sig
         |FROM m""".stripMargin,
    "t_dedup_minhash" ->
      s"""WITH $minhashCte,
         |$bandsPairsCte
         |SELECT doc_a, doc_b FROM pairs""".stripMargin,
    // connected components over the SAME candidate-pair graph, as a
    // recursive reachability CTE: reach(id, lab) holds every label
    // reachable from id; min over them = the component representative.
    "t_dedup_clusters" ->
      s"""WITH RECURSIVE $minhashCte,
         |$clusterCte
         |SELECT doc_id, cluster FROM clu""".stripMargin,
    "t_dedup_keep_best" ->
      s"""WITH RECURSIVE $minhashCte,
         |$clusterCte,
         |info AS (SELECT doc_id, len(list_distinct(string_split(text, ' '))) AS n_distinct
         |         FROM documents),
         |j AS (SELECT c.cluster, c.doc_id, i.n_distinct
         |      FROM clu c JOIN info i USING (doc_id)),
         |r AS (SELECT cluster, doc_id, n_distinct,
         |             row_number() OVER (PARTITION BY cluster
         |                                ORDER BY n_distinct DESC, doc_id) AS rn
         |      FROM j),
         |agg AS (SELECT cluster, count(*) AS n_members FROM j GROUP BY cluster)
         |SELECT r.cluster, r.doc_id AS keep_doc, r.n_distinct AS keep_distinct,
         |       a.n_members
         |FROM r JOIN agg a USING (cluster) WHERE rn = 1""".stripMargin,
    "t_dedup_simhash" -> {
      val bitSums = (0 until 16)
        .map(j => s"sum(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS s$j").mkString(", ")
      val fp = (0 until 16).map(j => s"(CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END)").mkString(" + ")
      s"""WITH tok AS (SELECT DISTINCT doc_id, tok FROM (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)),
         |hh AS (SELECT doc_id, ${chSql("tok")} AS h FROM tok),
         |bits AS (SELECT doc_id, $bitSums FROM hh GROUP BY doc_id)
         |SELECT doc_id, $fp AS simhash FROM bits""".stripMargin
    },
    "t_ngram_jaccard" ->
      s"""WITH $shingleCte,
         |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
         |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND b.doc_id = a.doc_id + 1
         |          GROUP BY 1, 2)
         |SELECT doc_a, doc_b, inter, ca.n + cb.n - inter AS uni,
         |       inter::DOUBLE / (ca.n + cb.n - inter) AS jaccard
         |FROM inter
         |JOIN cnt ca ON ca.doc_id = doc_a
         |JOIN cnt cb ON cb.doc_id = doc_b""".stripMargin,
    "t_repetition_filter" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |tc AS (SELECT doc_id, token, count(*) AS cnt FROM tok GROUP BY 1, 2),
        |agg AS (SELECT doc_id, max(cnt) AS top_cnt,
        |               CAST(sum(cnt) AS BIGINT) AS n_tokens FROM tc GROUP BY 1)
        |SELECT doc_id, n_tokens, top_cnt,
        |  top_cnt::DOUBLE / n_tokens AS top_ratio,
        |  (top_cnt::DOUBLE / n_tokens) <= 0.2 AS keep
        |FROM agg""".stripMargin,
    "t_decontaminate" ->
      s"""WITH $shingleCte,
         |hs AS (SELECT doc_id, ${chSql("shingle")} AS h FROM sh),
         |bench AS (SELECT DISTINCT h FROM hs WHERE doc_id < 50)
         |SELECT t.doc_id, count(*) AS n_shared
         |FROM hs t JOIN bench b ON t.h = b.h
         |WHERE t.doc_id >= 50
         |GROUP BY t.doc_id""".stripMargin,
    "t_decontaminate_bloom" ->
      s"""WITH $shingleCte,
         |hs AS (SELECT doc_id, ${chSql("shingle")} AS h FROM sh),
         |bench AS (SELECT DISTINCT h FROM hs WHERE doc_id < 50)
         |SELECT t.doc_id, count(*)::BIGINT AS exact_hits, true AS bloom_caught
         |FROM hs t JOIN bench b ON t.h = b.h
         |WHERE t.doc_id >= 50
         |GROUP BY t.doc_id""".stripMargin,
    "t_hybrid_search" ->
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks,
         |                  len(string_split(text, ' ')) AS dl FROM documents),
         |stats AS (SELECT count(*) AS n_docs, sum(dl)::BIGINT AS sum_dl FROM d),
         |tf AS (SELECT doc_id, dl, term, count(*) AS tf
         |       FROM (SELECT doc_id, dl, unnest(toks) AS term FROM d)
         |       WHERE term IN ('join', 'vector', 'stream')
         |       GROUP BY doc_id, dl, term),
         |tdf AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |sc AS (SELECT tf.doc_id, tf.term,
         |         (CAST(n_docs - tdf.df AS DOUBLE) + 0.5) / (CAST(tdf.df AS DOUBLE) + 0.5)
         |         * (CAST(tf.tf AS DOUBLE) * 2.2
         |            / (CAST(tf.tf AS DOUBLE)
         |               + 1.2 * (0.25 + 0.75
         |                        * (CAST(tf.dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))) AS score
         |       FROM tf JOIN tdf USING (term) CROSS JOIN stats),
         |piv AS (SELECT doc_id,
         |         sum(CASE WHEN term = 'join' THEN score END) AS s0,
         |         sum(CASE WHEN term = 'vector' THEN score END) AS s1,
         |         sum(CASE WHEN term = 'stream' THEN score END) AS s2
         |        FROM sc GROUP BY doc_id),
         |lex AS (SELECT doc_id, row_number() OVER (
         |          ORDER BY COALESCE(s0, 0.0) + COALESCE(s1, 0.0) + COALESCE(s2, 0.0) DESC,
         |                   doc_id) AS lex_rank
         |        FROM piv),
         |e AS (SELECT vec_id, embedding,
         |        ${dotSql("embedding", "embedding")} AS nsq FROM embeddings),
         |qv AS (SELECT embedding AS q_emb, nsq AS q_nsq FROM e WHERE vec_id = 0),
         |vr AS (SELECT vec_id AS doc_id, row_number() OVER (
         |          ORDER BY ${dotSql("q_emb", "embedding")} / (sqrt(q_nsq) * sqrt(nsq)) DESC,
         |                   vec_id) AS vec_rank
         |        FROM e CROSS JOIN qv WHERE vec_id <> 0)
         |SELECT COALESCE(lex.doc_id, vr.doc_id) AS doc_id, lex_rank, vec_rank,
         |  COALESCE(CAST(1 AS DOUBLE) / (60 + lex_rank), 0.0)
         |  + COALESCE(CAST(1 AS DOUBLE) / (60 + vec_rank), 0.0) AS rrf
         |FROM lex FULL OUTER JOIN vr ON lex.doc_id = vr.doc_id
         |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin,
    "t_containment" ->
      s"""WITH $minhashCte,
         |$bandsPairsCte,
         |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (SELECT p.doc_a, p.doc_b, count(*) AS inter
         |          FROM pairs p
         |          JOIN sh a ON a.doc_id = p.doc_a
         |          JOIN sh b ON b.doc_id = p.doc_b AND b.shingle = a.shingle
         |          GROUP BY 1, 2)
         |SELECT i.doc_a AS contained, i.doc_b AS container,
         |       i.inter::BIGINT AS inter, ca.n::BIGINT AS n_contained
         |FROM inter i JOIN cnt ca ON ca.doc_id = i.doc_a
         |WHERE i.inter * 2 >= ca.n
         |UNION ALL
         |SELECT i.doc_b, i.doc_a, i.inter::BIGINT, cb.n::BIGINT
         |FROM inter i JOIN cnt cb ON cb.doc_id = i.doc_b
         |WHERE i.inter * 2 >= cb.n""".stripMargin,
    "t_dedup_verified" ->
      s"""WITH $minhashCte,
         |$bandsPairsCte,
         |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (SELECT p.doc_a, p.doc_b, count(*) AS inter
         |          FROM pairs p
         |          JOIN sh a ON a.doc_id = p.doc_a
         |          JOIN sh b ON b.doc_id = p.doc_b AND b.shingle = a.shingle
         |          GROUP BY 1, 2)
         |SELECT i.doc_a, i.doc_b, i.inter::BIGINT AS inter,
         |       (ca.n + cb.n - i.inter)::BIGINT AS uni
         |FROM inter i JOIN cnt ca ON ca.doc_id = i.doc_a
         |     JOIN cnt cb ON cb.doc_id = i.doc_b
         |WHERE i.inter * 2 >= ca.n + cb.n - i.inter""".stripMargin,

    "t_pack_payload" ->
      s"""WITH t AS (SELECT doc_id, text, ((doc_id * 2654435761) % 1000000007) % 8 AS shard,
         |                  len(string_split(text, ' '))::BIGINT AS n_tok
         |           FROM documents WHERE text IS NOT NULL),
         |c AS (SELECT doc_id, text, shard, n_tok,
         |             sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id) AS cum
         |      FROM t),
         |p AS (SELECT shard, ((cum - 1) // 2048)::BIGINT AS pack_id, doc_id, text, n_tok FROM c)
         |SELECT shard, pack_id, count(*) AS n_docs, sum(n_tok)::BIGINT AS payload_tokens,
         |       ${chSql("string_agg(text, ' ' ORDER BY doc_id)")} AS payload_fp
         |FROM p GROUP BY shard, pack_id""".stripMargin,

    "t_incremental_lsh" ->
      s"""WITH $minhashCte,
         |$bandsPairsCte,
         |cand AS (
         |  SELECT DISTINCT n.doc_id AS new_doc, h.doc_id AS existing_id
         |  FROM bands n JOIN bands h ON n.band = h.band AND n.bsig = h.bsig
         |  WHERE n.doc_id >= $LshBase AND h.doc_id < $LshBase),
         |$verifyLinksCte""".stripMargin,

    // rebuilt-from-scratch twin of the persisted-index lifecycle: the
    // hash match IS the probe-against-persisted == probe-against-
    // rebuilt equivalence (batch 2's history includes batch 1)
    "t_lsh_index_lifecycle" ->
      s"""WITH $minhashCte,
         |$bandsPairsCte,
         |cand AS (
         |  SELECT DISTINCT n.doc_id AS new_doc, h.doc_id AS existing_id
         |  FROM bands n JOIN bands h ON n.band = h.band AND n.bsig = h.bsig
         |  WHERE (n.doc_id >= $LshBase AND n.doc_id < $LshBatch2 AND h.doc_id < $LshBase)
         |     OR (n.doc_id >= $LshBatch2 AND h.doc_id < $LshBatch2)),
         |$verifyLinksCte""".stripMargin,

    // rebuilt-from-scratch twin of the compaction query: the hash match
    // proves fragment -> compact -> probe == recompute (the in-query
    // except-both-ways already pinned compacted == fragmented)
    "t_lsh_index_compact" ->
      s"""WITH $minhashCte,
         |$bandsPairsCte
         |SELECT DISTINCT n.doc_id AS new_doc, h.doc_id AS existing_id
         |FROM bands n JOIN bands h ON n.band = h.band AND n.bsig = h.bsig
         |WHERE n.doc_id >= $LshProbeBase AND h.doc_id < $LshProbeBase""".stripMargin,

    "t_incremental_dedup" ->
      s"""WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |p AS (SELECT doc_id, ${chSql("array_to_string(w[1 : least(32, len(w))], ' ')")} AS pfp FROM words),
         |h AS (SELECT pfp, min(doc_id) AS existing_id FROM p WHERE doc_id < 250 GROUP BY pfp)
         |SELECT n.doc_id AS new_doc, h.existing_id
         |FROM p n JOIN h USING (pfp) WHERE n.doc_id >= 250""".stripMargin,

    // stateless per-batch plan == batch plan, so the streaming variant
    // shares the batch oracle verbatim
    "x_stream_decontaminate" ->
      s"""WITH $shingleCte,
         |hs AS (SELECT doc_id, ${chSql("shingle")} AS h FROM sh),
         |bench AS (SELECT DISTINCT h FROM hs WHERE doc_id < 50)
         |SELECT t.doc_id, count(*) AS n_shared
         |FROM hs t JOIN bench b ON t.h = b.h
         |WHERE t.doc_id >= 50
         |GROUP BY t.doc_id""".stripMargin,

    "t_lang_id" ->
      s"""SELECT doc_id, ${stopSql(enStop)} AS s_en, ${stopSql(deStop)} AS s_de,
         |  $langCaseSql AS pred_lang,
         |  CASE WHEN ($langCaseSql) = lang THEN 1 ELSE 0 END AS is_match
         |FROM documents""".stripMargin,
    "t_quality_score" ->
      s"""SELECT doc_id,
         |  len(string_split(text, ' ')) AS n_tokens,
         |  len(list_distinct(string_split(text, ' ')))::DOUBLE / len(string_split(text, ' ')) AS distinct_ratio,
         |  ${stopSql(enStop)}::DOUBLE / len(string_split(text, ' ')) AS stopword_ratio,
         |  0.4 * (len(list_distinct(string_split(text, ' ')))::DOUBLE / len(string_split(text, ' ')))
         |  + 0.3 * least(len(string_split(text, ' ')) / 100.0, 1.0)
         |  + 0.3 * (1.0 - ${stopSql(enStop)}::DOUBLE / len(string_split(text, ' '))) AS quality
         |FROM documents""".stripMargin,
    "t_token_count" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS ws_tokens,
        |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS bpe_tokens,
        |  length(text) AS n_chars_computed
        |FROM documents""".stripMargin,
    "t_embed_knn" ->
      s"""WITH e AS (SELECT vec_id, embedding,
         |             ${dotSql("embedding", "embedding")} AS nsq FROM embeddings),
         |p AS (SELECT q.vec_id AS q_id, e.vec_id AS n_id,
         |        ${dotSql("q.embedding", "e.embedding")} / (sqrt(q.nsq) * sqrt(e.nsq)) AS cos
         |      FROM e q JOIN e ON q.vec_id < 100 AND e.vec_id <> q.vec_id)
         |SELECT q_id, n_id, cos, rn FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rn FROM p)
         |WHERE rn <= 5""".stripMargin,
    "t_ann_lsh_bucket" ->
      s"WITH sb AS ($srpBitsSql) SELECT vec_id, $bucketSql AS bucket FROM embeddings CROSS JOIN sb",
    // Uncapped bucket-wide top-1: matches the capped Spark form exactly
    // wherever AnnBucketCap does not bind (all gate SFs — occupancy ~64
    // by construction), the same oracle contract as SemCellCap/MaxSimDf.
    "t_ann_bucket_top1" ->
      s"""WITH sb AS ($srpBitsSql),
         |e AS (SELECT vec_id, embedding, $bucketSql AS bucket,
         |             ${dotSql("embedding", "embedding")} AS nsq FROM embeddings CROSS JOIN sb),
         |p AS (SELECT a.vec_id AS q_id, b.vec_id AS n_id,
         |        ${dotSql("a.embedding", "b.embedding")} / (sqrt(a.nsq) * sqrt(b.nsq)) AS cos
         |      FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id)
         |SELECT q_id, n_id, cos FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rn FROM p)
         |WHERE rn = 1""".stripMargin,
    "t_dedup_cosine" ->
      s"""WITH e AS (SELECT vec_id, embedding,
         |             ${dotSql("embedding", "embedding")} AS nsq FROM embeddings)
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  ${dotSql("a.embedding", "b.embedding")} / (sqrt(a.nsq) * sqrt(b.nsq)) AS cos
         |FROM e a JOIN e b ON a.vec_id < 500 AND a.vec_id < b.vec_id
         |WHERE ${dotSql("a.embedding", "b.embedding")} / (sqrt(a.nsq) * sqrt(b.nsq)) >= 0.45""".stripMargin,
    "t_multimodal_stub" ->
      s"""SELECT doc_id,
         |  length(text) AS byte_len,
         |  ${chSql("text")} % 640 AS fake_width,
         |  CAST(floor(${chSql("text")} / 640.0) AS BIGINT) % 480 AS fake_height,
         |  CAST(floor(length(text) / 100.0) AS BIGINT) AS fake_frames
         |FROM documents""".stripMargin,
    // (tf desc, token) is a TOTAL order (token is the group key), so
    // the LIMIT boundary is deterministic on both engines
    "t_vocab_topk" ->
      """SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY token
        |ORDER BY tf DESC, token
        |LIMIT 100""".stripMargin,
    "t_bm25_search" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks,
        |                  len(string_split(text, ' ')) AS dl FROM documents),
        |stats AS (SELECT count(*) AS n_docs, sum(dl)::BIGINT AS sum_dl FROM d),
        |tf AS (SELECT doc_id, dl, term, count(*) AS tf
        |       FROM (SELECT doc_id, dl, unnest(toks) AS term FROM d)
        |       WHERE term IN ('join', 'vector', 'stream')
        |       GROUP BY doc_id, dl, term),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |sc AS (SELECT tf.doc_id, tf.term,
        |         (CAST(n_docs - df.df AS DOUBLE) + 0.5) / (CAST(df.df AS DOUBLE) + 0.5)
        |         * (CAST(tf.tf AS DOUBLE) * 2.2
        |            / (CAST(tf.tf AS DOUBLE)
        |               + 1.2 * (0.25 + 0.75
        |                        * (CAST(tf.dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))) AS score
        |       FROM tf JOIN df USING (term) CROSS JOIN stats),
        |piv AS (SELECT doc_id, count(*) AS n_terms,
        |         sum(CASE WHEN term = 'join' THEN score END) AS s0,
        |         sum(CASE WHEN term = 'vector' THEN score END) AS s1,
        |         sum(CASE WHEN term = 'stream' THEN score END) AS s2
        |        FROM sc GROUP BY doc_id)
        |SELECT doc_id, n_terms,
        |       COALESCE(s0, 0.0) + COALESCE(s1, 0.0) + COALESCE(s2, 0.0) AS score
        |FROM piv ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,

    "t_bpe_pair_counts" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |p AS (SELECT doc_id, toks[g.i] || ' ' || toks[g.i + 1] AS pair
         |      FROM t, generate_series(1, $OracleTokenCap) g(i)
         |      WHERE g.i <= len(toks) - 1)
         |SELECT pair, count(*) AS tf, count(DISTINCT doc_id) AS df
         |FROM p GROUP BY pair ORDER BY tf DESC, pair LIMIT 100""".stripMargin,

    "t_balanced_sample" ->
      """WITH c AS (SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type),
        |t AS (SELECT min(cnt) AS target FROM c)
        |SELECT e.event_id, e.event_type, e.user_id
        |FROM events e JOIN c ON e.event_type = c.event_type CROSS JOIN t
        |WHERE (((e.event_id * 2654435761) % 1000000007) % 1000000) * c.cnt
        |      < 1000000 * t.target""".stripMargin,

    "t_split_assign" ->
      """SELECT CASE WHEN ((doc_id * 2654435761) % 1000000007) % 1000000 < 800000 THEN 'train'
        |            WHEN ((doc_id * 2654435761) % 1000000007) % 1000000 < 900000 THEN 'val'
        |            ELSE 'test' END AS split,
        |       count(*) AS n_docs, sum(n_chars)::BIGINT AS sum_chars,
        |       min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM documents GROUP BY 1""".stripMargin,

    "t_ngram_novelty" ->
      s"""WITH $shingleCte,
         |hh AS (SELECT doc_id, ${chSql("shingle")} AS h FROM sh),
         |dfreq AS (SELECT h, count(*) AS df FROM hh GROUP BY h)
         |SELECT hh.doc_id, count(*) AS n_shingles, sum(df)::BIGINT AS sum_df,
         |       (sum(df)::DOUBLE / count(*)) AS mean_df
         |FROM hh JOIN dfreq USING (h)
         |GROUP BY hh.doc_id""".stripMargin,

    "t_corpus_shuffle" ->
      s"""WITH t AS (SELECT doc_id, (doc_id * 2654435761) % ${TextHash.P} AS skey FROM documents),
        |t2 AS (SELECT doc_id, skey, (skey * $ShuffleShards) // ${TextHash.P} AS shard FROM t),
        |c AS (SELECT shard, count(*) AS n FROM t2 GROUP BY 1),
        |o AS (SELECT shard, (sum(n) OVER (ORDER BY shard) - n)::BIGINT AS off FROM c),
        |l AS (SELECT doc_id, skey, shard,
        |        row_number() OVER (PARTITION BY shard ORDER BY skey, doc_id) AS lr
        |      FROM t2)
        |SELECT l.doc_id, l.skey, (o.off + l.lr)::BIGINT AS shuffle_rank
        |FROM l JOIN o USING (shard)""".stripMargin,

    "t_mix_sources" ->
      """WITH c AS (SELECT source, count(*) AS cnt,
        |                  CAST(floor(sqrt(count(*))) AS BIGINT) * 4 AS quota
        |           FROM documents GROUP BY source),
        |k AS (SELECT d.source, count(*) AS n_kept
        |      FROM documents d JOIN c USING (source)
        |      WHERE (((d.doc_id * 2654435761) % 1000000007) % 1000000) * c.cnt
        |            < 1000000 * c.quota
        |      GROUP BY d.source)
        |SELECT c.source, c.cnt AS n_docs, c.quota,
        |       coalesce(k.n_kept, 0)::BIGINT AS n_kept
        |FROM c LEFT JOIN k USING (source)""".stripMargin,

    "t_pii_redact" ->
      """WITH raw AS (
        |  SELECT doc_id,
        |         'user' || doc_id::VARCHAR || '@' || source || '.org tel +1-555-' ||
        |         lpad(((doc_id * 7919) % 10000)::VARCHAR, 4, '0') ||
        |         ' ip 10.' || (doc_id % 256)::VARCHAR || '.' ||
        |         ((doc_id * 31) % 256)::VARCHAR || '.7 ' || substr(text, 1, 40) ||
        |         CASE WHEN doc_id % 3 = 0 THEN ' alt bob@mail.net' ELSE '' END AS contact
        |  FROM documents)
        |SELECT doc_id,
        |       len(regexp_extract_all(contact, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
        |       len(regexp_extract_all(contact, '\+1-555-[0-9]{4}')) AS n_phones,
        |       len(regexp_extract_all(contact, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS n_ips,
        |       regexp_replace(regexp_replace(regexp_replace(contact,
        |         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |         '\+1-555-[0-9]{4}', '<PHONE>', 'g'),
        |         '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g') AS redacted
        |FROM raw""".stripMargin,

    "t_doc_chunking" ->
      s"""WITH $chunkCteSql
         |SELECT doc_id, chunk_id, start_tok, chunk_tokens, chunk_fp FROM chunks""".stripMargin,

    "t_chunk_dedup" ->
      s"""WITH $chunkCteSql
         |SELECT chunk_fp, chunk_tokens, count(*) AS n_copies,
         |       count(DISTINCT doc_id) AS n_docs, min(doc_id) AS first_doc
         |FROM chunks GROUP BY 1, 2 HAVING count(*) > 1""".stripMargin,

    "t_seq_packing" -> s"WITH ${packCteSql("documents")} $packSelectSql",

    "t_filter_pipeline" ->
      s"""WITH RECURSIVE $minhashCte,
         |$clusterCte,
         |$verdictCteSql
         |SELECT source, verdict, count(*) AS n_docs
         |FROM v GROUP BY 1, 2""".stripMargin,

    "x_pipeline_e2e" ->
      s"""WITH RECURSIVE $minhashCte,
         |$clusterCte,
         |$verdictCteSql,
         |src AS (SELECT d.* FROM documents d
         |        JOIN (SELECT doc_id FROM v WHERE verdict = 'kept') k USING (doc_id)),
         |${packCteSql("src")} $packSelectSql""".stripMargin
  )

  /** Packing CTE chain (`pk_t`, `pk_c`) + final SELECT — mirrors
    * [[packManifest]]; parameterized by the doc-source relation so the
    * t_seq_packing and x_pipeline_e2e oracles share one definition. */
  private def packCteSql(src: String): String =
    s"""pk_t AS (
       |  SELECT doc_id, ((doc_id * 2654435761) % 1000000007) % 8 AS shard,
       |         len(string_split(text, ' '))::BIGINT AS n_tok
       |  FROM $src WHERE text IS NOT NULL),
       |pk_c AS (SELECT doc_id, shard, n_tok,
       |              sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id) AS cum
       |         FROM pk_t)""".stripMargin
  private lazy val packSelectSql: String =
    """SELECT shard, ((cum - 1) // 2048)::BIGINT AS pack_id, count(*) AS n_docs,
      |       sum(n_tok)::BIGINT AS sum_tokens,
      |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM pk_c GROUP BY 1, 2""".stripMargin

  /** Per-doc verdict CTE (`v`) — mirrors [[verdictFrame]]; requires the
    * minhash + cluster CTEs upstream. Shared by the t_filter_pipeline
    * and x_pipeline_e2e oracles. */
  private lazy val verdictCteSql: String =
    s"""base AS (
       |  SELECT doc_id, source, lang, ${chSql("text")} AS fp, length(text) AS len,
       |         len(string_split(text, ' ')) AS n_tok,
       |         len(list_distinct(string_split(text, ' '))) AS n_uniq,
       |         ${Seq(enStop, deStop, esStop, frStop, zhStop).map(stopSql).mkString(" + ")} AS s_total,
       |         $langCaseSql AS pred_lang
       |  FROM documents),
       |canon AS (SELECT fp, len, min(doc_id) AS canonical_id FROM base GROUP BY fp, len),
       |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
       |tc AS (SELECT doc_id, token, count(*) AS cnt FROM tok GROUP BY 1, 2),
       |rep AS (SELECT doc_id, max(cnt) AS top_cnt, sum(cnt) AS n_tokens FROM tc GROUP BY doc_id),
       |v AS (SELECT b.doc_id, b.source,
       |             CASE WHEN b.doc_id <> c.canonical_id THEN 'dup'
       |                  WHEN cl.cluster IS NOT NULL AND b.doc_id <> cl.cluster THEN 'near_dup'
       |                  WHEN b.s_total > 0 AND b.pred_lang <> b.lang THEN 'lang_mismatch'
       |                  WHEN b.n_uniq * 2 < b.n_tok THEN 'low_quality'
       |                  WHEN r.top_cnt * 5 > r.n_tokens THEN 'repetitive'
       |                  ELSE 'kept' END AS verdict
       |      FROM base b JOIN canon c USING (fp, len) JOIN rep r USING (doc_id)
       |           LEFT JOIN clu cl USING (doc_id))""".stripMargin
}
