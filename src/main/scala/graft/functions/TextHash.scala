package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic integer-only text hashing shared by the dedup /
  * fingerprint operators. Everything here is pure-integer arithmetic
  * over code points so the DuckDB oracle (SqlGen.TextSql) reproduces it
  * BIT-EXACTLY — no murmur/xxhash (engines differ), no floats.
  *
  * All expressions are codegen'd higher-order functions — no UDFs, no
  * shuffles; the hash of a 100-token document is one fused projection.
  */
object TextHash {
  /** Modulus prime: h stays < 2^30, products stay < 2^63. */
  val P = 1000000007L

  /** Polynomial rolling hash over code points: fold (h*31 + ord(c)) % P. */
  def charHash(s: Column): Column =
    aggregate(
      transform(split(s, ""), c => ascii(c).cast("long")),
      lit(0L),
      (h, x) => (h * 31L + x) % P)

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
  def simhashColumn(text: Column): Column = {
    val hashes = transform(array_distinct(tokens(text)), t => charHash(t))
    (0 until 16).map { j =>
      val bitSum = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, j) % 2 === 1, 1L).otherwise(-1L))
      when(bitSum > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Word 3-gram shingles; documents with fewer than 3 tokens yield an
    * EMPTY array (a bare sequence(0, size-3) would descend through
    * negative indices and crash element_at at runtime).
    */
  def shingles(text: Column): Column = {
    val w = tokens(text)
    when(size(w) < 3, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), size(w) - 3),
        i => concat_ws(" ",
          element_at(w, i + 1), element_at(w, i + 2), element_at(w, i + 3))))
  }
}
