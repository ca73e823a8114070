package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The Knuth-multiply integer Bernoulli hash shared by every
  * sampling / splitting / sharding query (t_balanced_sample,
  * t_split_assign, t_mix_sources, s3_sharded_export): bucket(id) in
  * [0, mod) from `((id * Mult) % P) % mod` — pure integer ops, so
  * retries, AQE re-plans and the DuckDB oracle agree bit-exactly.
  * ONE definition: rescaling the constant or rewording the overflow
  * guard happens here, not at each call site.
  */
object Hashing {
  /** Knuth's multiplicative constant; id * Mult must stay in Long. */
  val Mult = 2654435761L

  /** `((id * Mult) % TextHash.P) % mod` — non-negative for ids >= 0. */
  def bucket(id: Column, mod: Long): Column =
    pmod((id * lit(Mult)) % lit(TextHash.P), lit(mod))

  /** Fail loudly BEFORE the multiply can wrap: Spark Longs wrap
    * silently (and pmod would "rescue" the negative) while DuckDB's
    * checked BIGINT multiply throws — a silent wrap would hash-mismatch
    * instead of erroring. */
  def requireNoOverflow(maxId: Long, name: String): Unit =
    require(maxId <= Long.MaxValue / Mult,
      s"$name: max id $maxId would overflow the Long hash multiply — " +
        "rescale Hashing.Mult first")
}
