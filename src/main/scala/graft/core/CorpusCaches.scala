package graft.core

import org.apache.spark.sql.SparkSession

/** Eviction discipline for (session, corpus)-keyed memos of PERSISTED
  * data (ADVICE r12: `benchSetMemo` persisted a DataFrame per corpus
  * and never unpersisted, so a multi-corpus session accumulated cached
  * sets without bound — the slow growth the bench JVM's 8g→24g heap
  * bump papered over). A session works one corpus at a time (verify,
  * bench, the scale sweeps), so on a corpus SWITCH the previous
  * corpus's entries are dead weight: evict them — unpersist the
  * storage, drop the key — before building the new one. Same-corpus
  * re-invocations still hit the memo, which is the whole point of the
  * caching (pay the derivation once, serve every later action).
  *
  * Concurrency contract (ADVICE r13): evict-then-getOrElseUpdate is
  * NOT atomic. If two corpora are queried concurrently in ONE session,
  * thread B's corpus switch can remove/unpersist the entry thread A
  * just built or is consuming. Correctness survives — an unpersisted
  * DataFrame recomputes, a removed memo entry rebuilds — but the memo
  * thrashes and persisted data vanishes mid-action. The
  * one-corpus-at-a-time assumption matches every harness in this repo
  * (verify, bench, the scale sweeps are all sequential per session);
  * a future concurrent-multi-corpus caller must key its sessions
  * per corpus (e.g. `SparkSession.newSession()`) instead of relying
  * on this memo.
  */
object CorpusCaches {

  /** `getOrElseUpdate` on a (session, corpus)-keyed memo that first
    * evicts the session's entries for OTHER corpora via `release`
    * (unpersist / cleanup for the value type). `companions` are
    * sibling memos DERIVED from this one (e.g. a bloom filter built
    * from the cached set) — their stale-corpus keys are dropped in the
    * same sweep, so the corpus-switch cleanup covers every
    * (session, corpus) memo of the family (ADVICE r13: bloomMemo
    * entries for evicted corpora were never released). Companion
    * values are plain driver objects (arrays, frames already
    * checkpoint-managed by the ContextCleaner); removal drops the
    * strong reference, which is all the cleanup they need.
    */
  def cachedPerCorpus[T](
      memo: scala.collection.concurrent.TrieMap[(SparkSession, String), T],
      s: SparkSession, d: String,
      companions: Seq[scala.collection.concurrent.TrieMap[(SparkSession, String), _]] = Nil)(
      build: => T)(release: T => Unit): T = {
    memo.keysIterator
      .filter { case (ks, kd) => (ks eq s) && kd != d }
      .foreach(k => memo.remove(k).foreach(release))
    companions.foreach { c =>
      c.keysIterator
        .filter { case (ks, kd) => (ks eq s) && kd != d }
        .foreach(c.remove)
    }
    memo.getOrElseUpdate((s, d), build)
  }
}
