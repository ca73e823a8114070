package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic integer-only text hashing shared by the dedup /
  * fingerprint operators. Everything here is pure-integer arithmetic
  * over code points so the DuckDB oracle (SqlGen.TextSql) reproduces it
  * BIT-EXACTLY — no murmur/xxhash (engines differ), no floats.
  *
  * The hash/signature columns are custom codegen'd Catalyst
  * expressions ([[graft.plans.TextVectorExprs]]) — the earlier
  * `transform`/`aggregate` HOF formulation was CodegenFallback and
  * dominated the dedup bench tail. Semantics are identical; the DuckDB
  * oracle SQL is unchanged.
  */
object TextHash {
  /** Modulus prime: h stays < 2^30, products stay < 2^63. */
  val P = 1000000007L

  /** Polynomial rolling hash over code points: fold (h*31 + ord(c)) % P. */
  def charHash(s: Column): Column = graft.plans.TextVectorExprs.polyHash(s)

  /** MinHash permutation k: (a_k * h + b_k) % P. */
  def perm(h: Column, k: Int): Column = (h * permA(k) + permB(k)) % P

  /** 16 fixed odd multipliers / offsets (shared with the SQL oracle). */
  val permA: Array[Long] = Array(3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59)
  val permB: Array[Long] = Array(1, 8, 15, 22, 29, 36, 43, 50, 57, 64, 71, 78, 85, 92, 99, 106)
  val NumPerms  = 16
  val NumBands  = 4
  val RowsPerBand = 4

  /** Whitespace tokens (single-space convention of the testdata). */
  def tokens(text: Column): Column = split(text, " ")

  /** 16-bit SimHash computed in-row over distinct tokens. */
  def simhashColumn(text: Column): Column = graft.plans.TextVectorExprs.simhash16(text)

  /** DISTINCT word 3-gram shingles in first-occurrence order;
    * documents with fewer than 3 tokens yield an EMPTY array. */
  def shingles(text: Column): Column = graft.plans.TextVectorExprs.shingleSet(text)

  /** Full 16-permutation MinHash signature as array<long>; NULL for
    * documents with fewer than 3 tokens (no shingles). */
  def minhashSignature(text: Column): Column = graft.plans.TextVectorExprs.minhashSig(text)
}
