package graft.queries

/** Registry slot for oracles generated from FITTED model literals.
  *
  * Verify dumps `oracle_sql.json` AFTER running every query, so by then
  * a slot holds the exact literals the parquet outputs were computed
  * from. Slots are keyed by sfDir: if one JVM ever fits the same model
  * family against TWO dirs (a spec suite, say), `only` returns None and
  * the dynamic oracle is OMITTED — the driver degrades that query to
  * its rows-only check instead of comparing against literals from the
  * wrong dir's fit. One-dir processes (Verify, Bench, the driver) always
  * get their oracle.
  */
final class DynOracleSlot[T] {
  private val byDir = scala.collection.concurrent.TrieMap.empty[String, T]
  def put(dir: String, v: T): Unit = byDir.put(dir, v)
  /** The payload iff exactly one dir was fitted in this JVM. */
  def only: Option[T] = byDir.toSeq match {
    case Seq((_, v)) => Some(v)
    case _ => None
  }
}
