package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared aggregate helpers. */
object Aggregates {
  /** Per-group mode with pinned tie-break (highest count, then lowest
    * value — deterministic under Spark shuffles; the reference's pandas
    * idxmax / Counter.most_common tie-breaks are insertion-order
    * dependent: src/transpiler.py:986-992, inference_trie.py:96-98 —
    * SURVEY §7.4 risk #3 says pin it explicitly).
    *
    * Two shuffle-free-after-partial aggregations, no window: counts per
    * (group, value), then max_by(value, (count, -value)) per group.
    */
  def mode(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame =
    modeFromCounts(
      df.groupBy((groupCols :+ valueCol).map(col): _*)
        .agg(count(lit(1)).as("cnt")),
      groupCols, valueCol, "cnt")

  /** The pinned tie-break applied to PRE-COUNTED (group, value, cnt)
    * rows — the single definition both [[mode]] and the mergeable
    * [[KvIndexState]] finalize through, so append and rebuild can never
    * disagree on a tied key. min over (-cnt, value) == highest count,
    * then lowest value — works for numeric AND string value columns
    * (no negation of the value). */
  def modeFromCounts(
      counted: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      cntCol: String): DataFrame =
    counted
      .groupBy(groupCols.map(col): _*)
      .agg(
        min_by(col(valueCol), struct(-col(cntCol), col(valueCol))).as(valueCol)
      )
}

/** The learned key–value index: exact probe + field-wise prefix
  * fallback (ref: src/inference_trie.py:60-98, src/transpiler.py
  * :1004-1099; SURVEY §2.9).
  *
  * Spark-first design: instead of the reference's row-at-a-time
  * dynamic-SQL `prefix_search`, every prefix length L gets a small
  * precomputed aggregate table at build time. The probe then takes one
  * of two bitwise-identical forms ([[KvProbeSpec]] pins them):
  *
  *  - **compiled** (default, index ≤ [[KvModel.MaxCompiledEntries]]
  *    entries): the collected maps embed in the plan as a reference
  *    object ([[graft.plans.KvScorerRef]], like the kNN/tree kernels)
  *    and the whole cascade is ONE whole-stage-codegen projection —
  *    zero joins, zero exchanges on the probe side at any input size;
  *  - **join cascade** (indexes too large to embed): BROADCAST hash
  *    joins + one coalesce — fully parallel, no iteration, and the only
  *    shuffle in the whole serve path is whatever the caller's plan
  *    already needed.
  *
  * At 100 TB the probe side streams; the index sides are bounded by the
  * key space (small by construction — that is the point of the paper).
  */
final case class KvModel(
    task: Task,
    keyLen: Int,
    kv: DataFrame,                      // (key string, value double)
    prefixes: Seq[(Int, DataFrame)],    // len -> (prefix string, value double), len = keyLen-1 .. 1
    globalValue: Double,                // trie-root fallback
    maxCompiledEntries: Long = KvModel.MaxCompiledEntries,
    // |kv| when the builder already materialized it (fromKv's cache
    // count; Persist.load's count) — lets the compiled-vs-join decision
    // skip its own count jobs (r16: the size probe was 3 extra driver
    // jobs per model build, paid by every model-building query row)
    kvCountHint: Option[Long] = None
) {
  /** The index entries as a typed Dataset (SURVEY §1.2 fixed shape). */
  def entries: org.apache.spark.sql.Dataset[Types.KVEntry] = {
    import kv.sparkSession.implicits._
    kv.select(col("key"), col("value")).as[Types.KVEntry]
  }

  /** The embedded-cascade kernel when the index fits the size cap —
    * collected ONCE per model (the tables are cached + key-space-
    * bounded), then reused by every probe this model serves.
    *
    * r16 (guide §1.2/§5 — fewer driver jobs per model build): the old
    * size probe COUNTED kv + every prefix table (up to keyLen driver
    * jobs) before a compiled model then COLLECTED the same tables
    * again. Now the gate is the kv count alone — known for free when
    * the builder materialized the cache ([[kvCountHint]]) — and the
    * collect itself measures the total: |prefix_l| ≤ |kv| for every l,
    * so a transient over-collect is bounded by keyLen·cap entries
    * (a few MB) even when the total lands above the cap and the model
    * falls back to the join cascade. The compiled/join DECISION is
    * unchanged (total entries ≤ cap) and the two paths are bitwise
    * identical anyway (KvProbeSpec), so no declared result can move. */
  @transient private lazy val compiledRef: Option[graft.plans.KvScorerRef] = {
    val kvN = kvCountHint.getOrElse(kv.count())
    if (kvN > maxCompiledEntries) None
    else {
      val local = toLocalScorer
      val entries = local.kv.size.toLong +
        local.prefixes.iterator.map(_._2.size.toLong).sum
      if (entries <= maxCompiledEntries) Some(new graft.plans.KvScorerRef(local))
      else None
    }
  }

  /** Append `predName` to `input` by probing the index with `key`.
    * Exact hit wins; else the longest non-empty prefix aggregate; else
    * the global aggregate (trie-root DFS, inference_trie.py:91-98).
    * Compiled single-projection form when the index fits
    * [[maxCompiledEntries]]; broadcast-join cascade otherwise — same
    * values bit for bit either way (a NULL key resolves to the global
    * aggregate on both paths).
    */
  def probe(input: DataFrame, key: Column, predName: String = "prediction"): DataFrame =
    compiledRef match {
      case Some(ref) =>
        input.withColumn(predName,
          coalesce(graft.plans.KvProbe.column(key, ref), lit(globalValue)))
      case None => joinProbe(input, key, predName)
    }

  /** The broadcast-join cascade form of [[probe]] (always correct; the
    * scale path for indexes too large to embed in the task binary). */
  def joinProbe(input: DataFrame, key: Column, predName: String = "prediction"): DataFrame = {
    val keyed = input.withColumn("__key", key)
    val exact = keyed.join(
      broadcast(kv.select(col("key").as("__key"), col("value").as("__v_exact"))),
      Seq("__key"), "left")
    val cascaded = prefixes.foldLeft(exact) { case (df, (l, tbl)) =>
      df.join(
        broadcast(tbl.select(col("prefix").as(s"__p_$l"), col("value").as(s"__v_$l"))),
        Keys.prefix(col("__key"), l) === col(s"__p_$l"), "left")
        .drop(s"__p_$l")
    }
    val fallbackCols = prefixes.map { case (l, _) => col(s"__v_$l") }
    val pred = coalesce((col("__v_exact") +: fallbackCols) :+ lit(globalValue): _*)
    cascaded
      .withColumn(predName, pred)
      .drop("__key" +: "__v_exact" +: prefixes.map { case (l, _) => s"__v_$l" }: _*)
  }

  /** Collect the (bounded-by-key-space) kv + prefix tables ONCE into
    * plain maps for driver-local point lookups — the reference's
    * standalone-trie single-row use case (transpiler.py:3117-3215;
    * SURVEY §1.1).
    *
    * r17 (guide §1.2/§2.6 — overlap independent jobs): the kv and each
    * prefix-table collect are INDEPENDENT actions over tiny cached
    * frames, but they used to run sequentially — keyLen driver jobs
    * back to back, each paying full job latency for ~100 rows; the
    * x_index_lifecycle phase profile measured the sequential collects
    * at 1.3 s warm, the row's single biggest phase. Submitting them
    * from a thread pool overlaps the latencies (Spark's scheduler runs
    * concurrent jobs fine; job-description props are thread-local).
    * Each map's CONTENT is untouched — same Spark-computed tables,
    * same rows — so compiled ≡ join parity (KvProbeSpec) is unchanged. */
  def toLocalScorer: LocalScorer = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    val kvF = Future(kv.select(col("key"), col("value"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap)
    val pfxFs = prefixes.map { case (l, t) =>
      Future(l -> t.select(col("prefix"), col("value"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap)
    }
    val kvMap = Await.result(kvF, Duration.Inf)
    val pfxMaps = pfxFs.map(Await.result(_, Duration.Inf))
    LocalScorer(kvMap, pfxMaps, globalValue)
  }
}

/** Driver-local single-row scorer: exact hit, then longest non-empty
  * field-wise prefix, then the global fallback — the same cascade as
  * [[KvModel.probe]], microseconds per lookup, no Spark job. */
final case class LocalScorer(
    kv: Map[String, Double],
    prefixes: Seq[(Int, Map[String, Double])], // longest first, like probe
    globalValue: Double) {

  def scoreKey(key: String): Double =
    kv.get(key) match {
      case Some(v) => v
      case None =>
        var i = 0
        while (i < prefixes.length) {
          val (l, m) = prefixes(i)
          val hit = m.get(LocalScorer.prefix(key, l))
          if (hit.isDefined) return hit.get
          i += 1
        }
        globalValue
    }
}

object LocalScorer {
  /** First `n` '.'-separated fields — `Keys.prefix` (substring_index)
    * driver-side: the whole key when it has ≤ n fields. */
  def prefix(key: String, n: Int): String = {
    var idx = -1
    var seen = 0
    while (seen < n) {
      val next = key.indexOf('.', idx + 1)
      if (next < 0) return key
      idx = next
      seen += 1
    }
    key.substring(0, idx)
  }
}

/** Mergeable sufficient statistics for INCREMENTAL index maintenance —
  * the reference's retrain-vs-reuse story (its trie is rebuilt from
  * scratch per retrain; here the aggregates are decomposable, so new
  * data merges in without rescanning the base corpus):
  *
  *  - mean tasks (regression/binary): per-key (sum, cnt) — merged by
  *    addition, value = sum/cnt. Identical to avg() over base ∪ delta
  *    because both are one exact merge-tree away from the same total.
  *  - multi-class (mode): per-(key, pred) cnt — merged by addition,
  *    value = the same pinned-tie argmax [[Aggregates.mode]] computes.
  *
  * append(delta) ≡ rebuild(base ∪ delta): mode counts are integers, so
  * multi-class equality is exact always; mean sums are doubles, so the
  * equality is BITWISE when predictions are integer-valued (0/1 labels,
  * class ids, integer-scaled scores — every shipped lifecycle) and
  * otherwise agrees the way any two Spark avg() runs do (identical up
  * to FP summation order, which partitioning already makes
  * nondeterministic — round the served value, as the declared queries
  * do). `x_index_append`'s oracle IS the rebuild, so the equivalence is
  * hash-checked end to end. At 100 TB this is the
  * difference between an O(delta) daily ingest and an O(corpus) rescan:
  * the state is key-space-bounded (small by construction), the delta
  * pass is one partial aggregate.
  */
final case class KvIndexState(task: Task, keyLen: Int, stats: DataFrame) {

  /** Merge new (key, pred) rows into the state: one partial aggregate
    * over the delta, one key-keyed merge — the base data never rescans. */
  def append(keyed: DataFrame): KvIndexState =
    copy(stats = KvIndexState.merge(
      stats.unionByName(KvIndexState.partial(keyed, task)), task))

  /** Finalize into a servable [[KvModel]] (prefix tables + global
    * fallback derive from the kv exactly like a fresh build). */
  def toModel(balanceRatio: Option[Double] = None): KvModel = {
    val kv = task match {
      case Task.MultiClass =>
        Aggregates.modeFromCounts(stats, Seq("key"), "pred", "cnt")
          .withColumnRenamed("pred", "value")
      case _ =>
        stats.select(col("key"), (col("sum") / col("cnt")).as("value"))
    }
    KvIndexBuilder.fromKv(kv, keyLen, task, balanceRatio)
  }
}

object KvIndexState {
  /** Build the initial state from (key, pred) rows. */
  def build(keyed: DataFrame, keyLen: Int, task: Task): KvIndexState =
    KvIndexState(task, keyLen, partial(keyed, task))

  private def partial(keyed: DataFrame, task: Task): DataFrame = task match {
    case Task.MultiClass =>
      keyed.groupBy(col("key"), col("pred").cast("double").as("pred"))
        .agg(count(lit(1)).as("cnt"))
    case _ =>
      // count(pred), NOT count(*): a NULL prediction must be excluded
      // from BOTH the sum and the count, exactly like the rebuild's
      // avg() — counting it would shrink the merged mean.
      keyed.groupBy("key")
        .agg(sum(col("pred").cast("double")).as("sum"),
          count(col("pred").cast("double")).as("cnt"))
  }

  private def merge(stats: DataFrame, task: Task): DataFrame = task match {
    case Task.MultiClass =>
      stats.groupBy("key", "pred").agg(sum("cnt").as("cnt"))
    case _ =>
      stats.groupBy("key").agg(sum("sum").as("sum"), sum("cnt").as("cnt"))
  }
}

object KvModel {
  /** Above this many total index entries the probe falls back from the
    * plan-embedded kernel to broadcast joins: the reference object
    * rides every task binary, so it must stay a few MB at most —
    * 2^17 (key, double) entries is ~4-8 MB serialized, comfortably
    * under the broadcast threshold the join path would use anyway. */
  val MaxCompiledEntries: Long = 1L << 17
}

object KvIndexBuilder {
  /** Build the KV index from an encoded training DataFrame.
    *
    * @param encoded  DataFrame with LongType bin columns `keyCols` and
    *                 a numeric prediction column `predCol` (the trained
    *                 model's predictions on train — transpiler.py:573).
    * @param balanceRatio optional class-balance reweighting
    *                 (`min(value*ratio, 1)`, transpiler.py:3080-3081).
    *
    * Aggregation per key: mean for regression/binary, mode for
    * multi-class (transpiler.py:986-996). Prefix tables aggregate over
    * DISTINCT KEYS (one row per kv entry), not raw rows — matching the
    * trie's DFS over leaves (inference_trie.py:73-98).
    */
  def build(
      encoded: DataFrame,
      keyCols: Seq[String],
      predCol: String,
      task: Task,
      balanceRatio: Option[Double] = None
  ): KvModel = {
    val keyed = encoded.select(
      Keys.keyColumn(keyCols.map(col)).as("key"),
      col(predCol).cast("double").as("pred"))
    buildFromKeyed(keyed, keyCols.length, task, balanceRatio)
  }

  /** Build from an already-keyed DataFrame with columns (key, pred). */
  def buildFromKeyed(
      keyed: DataFrame,
      keyLen: Int,
      task: Task,
      balanceRatio: Option[Double] = None
  ): KvModel = {
    val kvRaw = task match {
      case Task.MultiClass =>
        Aggregates.mode(keyed, Seq("key"), "pred").withColumnRenamed("pred", "value")
      case _ =>
        keyed.groupBy("key").agg(avg("pred").as("value"))
    }
    fromKv(kvRaw, keyLen, task, balanceRatio)
  }

  /** Finalize a (key, value) kv relation into a servable model:
    * balance reweight, then the prefix fallback tables and global
    * aggregate — shared by the fresh build and [[KvIndexState.toModel]]. */
  private[core] def fromKv(
      kvRaw: DataFrame,
      keyLen: Int,
      task: Task,
      balanceRatio: Option[Double]
  ): KvModel = {
    val kv = balanceRatio match {
      case Some(r) => kvRaw.withColumn("value", least(col("value") * r, lit(1.0)))
      case None    => kvRaw
    }
    val kvCached = kv.cache()
    val kvN = kvCached.count() // materialize once; every probe broadcasts from here

    val prefixes = (keyLen - 1 to 1 by -1).map { l =>
      val pfx = kvCached.select(Keys.prefix(col("key"), l).as("prefix"), col("value"))
      val tbl = task match {
        case Task.MultiClass =>
          Aggregates.mode(pfx, Seq("prefix"), "value")
        case _ =>
          pfx.groupBy("prefix").agg(avg("value").as("value"))
      }
      l -> tbl.cache()
    }

    val globalValue = task match {
      case Task.MultiClass =>
        Aggregates.mode(kvCached.select(col("value")), Seq.empty, "value")
          .head().getDouble(0)
      case _ =>
        kvCached.agg(avg("value")).head().getDouble(0)
    }
    KvModel(task, keyLen, kvCached, prefixes, globalValue,
      kvCountHint = Some(kvN))
  }
}
