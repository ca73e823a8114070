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
  */
object CorpusCaches {

  /** `getOrElseUpdate` on a (session, corpus)-keyed memo that first
    * evicts the session's entries for OTHER corpora via `release`
    * (unpersist / cleanup for the value type). */
  def cachedPerCorpus[T](
      memo: scala.collection.concurrent.TrieMap[(SparkSession, String), T],
      s: SparkSession, d: String)(build: => T)(release: T => Unit): T = {
    memo.keysIterator
      .filter { case (ks, kd) => (ks eq s) && kd != d }
      .foreach(k => memo.remove(k).foreach(release))
    memo.getOrElseUpdate((s, d), build)
  }
}
