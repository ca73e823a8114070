package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The row-local TermFreqs kernel must be EXACTLY the shuffle form it
  * replaces in t_doc_similarity — `explode(split(text, ' '))` then
  * `groupBy(doc_id, t).count()` — as a (doc_id, t, tf) multiset,
  * including split's empty-field semantics (leading/trailing/adjacent
  * separators produce "" tokens; "" produces one "" token), multi-byte
  * UTF-8 tokens, and the real corpus. Output order inside a row is
  * pinned to token binary order (determinism: the expression's output
  * must not depend on map iteration order).
  */
class TermFreqsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def check(df: org.apache.spark.sql.DataFrame): Unit = {
    val kernel = df
      .select(col("doc_id"), explode(graft.plans.TermFreqs.column(col("text"))).as("kv"))
      .select(col("doc_id"), col("kv.t"), col("kv.tf"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val shuffled = df
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(kernel == shuffled)
  }

  test("kernel equals explode+groupBy on engineered edge cases") {
    import spark.implicits._
    val cases = Seq(
      "",                        // one "" token
      " ",                       // two "" tokens -> ("", 2)
      "a",                       // single token
      "a a a",                   // repeats collapse with tf 3
      "a  b",                    // empty field between a and b
      " lead trail ",            // leading + trailing empties
      "the the cat",             // mixed repeats
      "héllo wörld héllo",       // multi-byte tokens, repeat
      "x " * 1000 + "y")         // long doc, 1000 repeats + empties
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    check(cases)
  }

  test("kernel equals explode+groupBy on the sf0.001 corpus") {
    check(Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text")))
  }

  test("array_freqs decomposition equals count + count_distinct on bigrams") {
    // the t_bpe_pair_counts rewrite: sum(per-doc tf) == count(*) and
    // count(*) over docs == count_distinct(doc_id), per pair
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val bigrams = expr(
      """zip_with(slice(toks, 1, size(toks) - 1),
        |         slice(toks, 2, size(toks) - 1),
        |         (a, b) -> concat(a, ' ', b))""".stripMargin)
    val kernel = docs
      .select(col("doc_id"), explode(graft.plans.TermFreqs.arrayColumn(bigrams)).as("kv"))
      .groupBy(col("kv.t").as("pair"))
      .agg(sum(col("kv.tf")).as("tf"), count(lit(1)).as("df"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val shuffled = docs
      .select(col("doc_id"), explode(bigrams).as("pair"))
      .groupBy("pair")
      .agg(count(lit(1)).as("tf"), count_distinct(col("doc_id")).as("df"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(kernel == shuffled && kernel.nonEmpty)
  }

  test("array_freqs refuses null elements loudly") {
    import spark.implicits._
    val ex = intercept[Exception] {
      Seq(Tuple1(Seq[String]("a", null, "b")))
        .toDF("arr")
        .select(graft.plans.TermFreqs.arrayColumn(col("arr")))
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("array_freqs")), ex.toString)
  }

  test("entries are sorted by token binary order and distinct") {
    import spark.implicits._
    val rows = Seq((0L, "b a c a b a"))
      .toDF("doc_id", "text")
      .select(graft.plans.TermFreqs.column(col("text")).as("tfs"))
      .selectExpr("transform(tfs, x -> x.t) AS ts", "transform(tfs, x -> x.tf) AS ns")
      .collect().head
    assert(rows.getSeq[String](0) == Seq("a", "b", "c"))
    assert(rows.getSeq[Long](1) == Seq(3L, 2L, 1L))
  }
}
