package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The one-pass TokenCounts kernel must be EXACTLY the three
  * expressions it replaces — `size(split(text, " "))`,
  * `size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))`,
  * `length(text)` — on run boundaries, empties, uppercase, unicode
  * (incl. multi-byte and astral code points), and the real corpus.
  */
class TokenCountSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def check(df: org.apache.spark.sql.DataFrame): Unit = {
    val both = df
      .select(col("text"), graft.plans.TokenCounts.column(col("text")).as("tc"))
      .select(col("text"),
        col("tc.ws_tokens"), col("tc.bpe_tokens"), col("tc.n_chars"),
        size(split(col("text"), " ")).as("e_ws"),
        size(regexp_extract_all(col("text"),
          lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).as("e_bpe"),
        length(col("text")).as("e_chars"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val t = r.getString(0)
      val show = if (t == null) "NULL" else t.take(40)
      assert(r.getInt(1) == r.getInt(4), s"ws_tokens on '$show'")
      assert(r.getInt(2) == r.getInt(5), s"bpe_tokens on '$show'")
      assert(r.getInt(3) == r.getInt(6), s"n_chars on '$show'")
    }
  }

  test("kernel equals the regex forms on engineered edge cases") {
    import spark.implicits._
    val cases = Seq(
      "",                       // split("") -> [""], 1 ws token
      " ",                      // two empty fields
      "   ",                    // runs of spaces
      "abc",
      "abc def  ghi ",          // trailing space, double space
      "a1b2 33x",               // letter/digit run boundaries
      "ABC Def",                // uppercase = one token per char
      "hello, world! 42",
      "héllo wörld",            // 2-byte code points
      "日本語 テスト",            // 3-byte code points
      "aéb",               // run broken by a non-ASCII char
      "emoji 😀 end", // astral (4-byte) code point
      "tabs\tand\nnewlines",
      "123456789",
      "!!!???...",
      "a" * 500 + " " + "9" * 500)
    check(cases.toDF("text"))
  }

  test("kernel equals the regex forms on the documents corpus") {
    check(Tables.documents(spark, "/root/testdata/sf0.001").select("text"))
  }
}
