package graft.plans

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Bloom-filter membership over Catalyst's own sketch expressions
  * (the machinery behind Spark's runtime row-level filtering) — for
  * set-membership probes whose reference set is too large to broadcast
  * as exact hashes but fits comfortably as a bit array: `numBits` is
  * chosen by the CALLER from the expected item count, and the built
  * filter is embedded as a BINARY LITERAL, so the probe side is a pure
  * fused projection — no join, no shuffle, no broadcast exchange.
  * False positives only, never false negatives — the safe direction
  * for decontamination (over-flagging is reviewable; leakage is not).
  */
object BloomExprs {

  /** Aggregate a LongType column into serialized bloom-filter bytes
    * (driver-held; size = numBits/8 — keep it literal-sized). */
  def buildBloom(df: DataFrame, c: Column, expectedItems: Long, numBits: Long): Array[Byte] = {
    val agg = GraftColumnBridge.column(
      new BloomFilterAggregate(GraftColumnBridge.expression(c),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression())
    df.agg(agg.as("bf")).head().getAs[Array[Byte]](0)
  }

  /** Membership probe against literal bloom bytes — foldable left side
    * (BloomFilterMightContain requires a constant or scalar subquery),
    * so the whole probe stays inside whole-stage codegen. */
  def mightContain(bloomBytes: Array[Byte], c: Column): Column =
    GraftColumnBridge.column(BloomFilterMightContain(
      Literal(bloomBytes), GraftColumnBridge.expression(c)))
}
