package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Compound-key assembly: '.'-joined bin indices in selected-feature
  * order, e.g. "2.0.5.11" (ref: src/transpiler.py:940-983, 1132-1166).
  */
object Keys {
  /** Build the compound key from already-encoded (LongType) bin columns. */
  def keyColumn(binCols: Seq[Column]): Column =
    concat_ws(".", binCols.map(_.cast("string")): _*)

  /** First `n` '.'-separated fields of a key — the field-wise prefix of
    * the trie semantics (src/inference_trie.py:84-98), NOT the
    * char-wise prefix of prefix_search.sql (SURVEY §2.9 divergence).
    */
  def prefix(key: Column, n: Int): Column = substring_index(key, ".", n)
}
