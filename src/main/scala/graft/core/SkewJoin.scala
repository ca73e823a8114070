package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling join: salt the hot keys on the big side, replicate the
  * small side per salt, join on (key, salt). Complements AQE's
  * runtime skew-split (on by default in Spark 4) for the case AQE can't
  * fix — a broadcast-ineligible small side with a few pathological hot
  * keys on the probe side.
  *
  * Deterministic salting: salt = pmod(hash of a caller-chosen
  * discriminator column, factor) — NOT rand(), so retries/speculative
  * tasks compute identical results.
  */
object SkewJoin {
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      discriminator: String,
      saltFactor: Int = 8,
      joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0)
    // right/full outer would duplicate unmatched small-side rows once
    // per salt replica — only probe-side-preserving joins are salt-safe.
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti").contains(joinType.toLowerCase),
      s"saltedJoin does not support joinType=$joinType")
    val salted = big.withColumn("__salt", pmod(hash(col(discriminator)), lit(saltFactor)))
    val replicated = small
      .withColumn("__salt", explode(lit((0 until saltFactor).toArray)))
    salted
      .join(replicated, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
