package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The Knuth-multiply integer Bernoulli hash shared by every
  * sampling / splitting / sharding query (t_balanced_sample,
  * t_split_assign, t_mix_sources, s3_sharded_export): bucket(id) in
  * [0, mod) from `(((id % P) * Mult) % P) % mod` — pure integer ops, so
  * retries, AQE re-plans and the DuckDB oracle agree bit-exactly.
  * ONE definition: rescaling the constant happens here, not at each
  * call site.
  */
object Hashing {
  /** Knuth's multiplicative constant. */
  val Mult = 2654435761L

  /** `(((id % P) * Mult) % P) % mod`, canonicalized non-negative.
    * The id is reduced mod P BEFORE the multiply: since P < 2^30 and
    * Mult < 2^32, the product stays under 2^62 for EVERY Long id —
    * no overflow at any corpus size (the unreduced `id * Mult` wraps
    * silently past id ~3.5e9 — or throws under ANSI — which is ~3 B
    * keys, well inside a 100 TB corpus). Modular arithmetic makes the
    * reduced form bit-identical to the unreduced one wherever the
    * latter was valid, so every oracle mirror (which keeps the
    * unreduced spelling over gate-SF ids < P) is unchanged. */
  def bucket(id: Column, mod: Long): Column = bucket(id, lit(mod))

  /** Same hash with a per-row modulus column (sub-bucket splits whose
    * fan-out is data-dependent, e.g. the ANN bucket-occupancy cap). */
  def bucket(id: Column, mod: Column): Column =
    pmod(((id % lit(TextHash.P)) * lit(Mult)) % lit(TextHash.P), mod)
}
