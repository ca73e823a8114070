package graft

import graft.core.CorpusCaches
import org.scalatest.funsuite.AnyFunSuite

/** Eviction discipline of the (session, corpus)-keyed memo family:
  * same-corpus hits are served from the memo, a corpus switch evicts
  * the session's OTHER-corpus entries through the release callback,
  * companion memos (values derived from the primary, e.g. bloom
  * filters) are swept in the same pass (ADVICE r13), and other
  * sessions' entries are never touched.
  */
class CorpusCachesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  type Memo[T] = scala.collection.concurrent.TrieMap[
    (org.apache.spark.sql.SparkSession, String), T]

  test("same-corpus re-invocation hits the memo; corpus switch evicts + releases") {
    val memo: Memo[String] = scala.collection.concurrent.TrieMap.empty
    var builds = 0
    var released = List.empty[String]
    def get(d: String) = CorpusCaches.cachedPerCorpus(memo, spark, d)({
      builds += 1; s"value-$d"
    })(v => released ::= v)

    assert(get("corpusA") == "value-corpusA" && builds == 1)
    assert(get("corpusA") == "value-corpusA" && builds == 1, "memo hit, no rebuild")
    assert(released.isEmpty)
    // switch: A must be released and removed, B built
    assert(get("corpusB") == "value-corpusB" && builds == 2)
    assert(released == List("value-corpusA"))
    assert(memo.keySet == Set((spark, "corpusB")))
  }

  test("companion memos are swept for stale corpora in the same eviction (ADVICE r13)") {
    val memo: Memo[String] = scala.collection.concurrent.TrieMap.empty
    val companion: Memo[Array[Byte]] = scala.collection.concurrent.TrieMap.empty
    def get(d: String) = CorpusCaches.cachedPerCorpus(
      memo, spark, d, companions = Seq(companion))(s"v-$d")(_ => ())

    get("corpusA")
    companion.put((spark, "corpusA"), Array[Byte](1))
    get("corpusA") // same corpus: companion survives
    assert(companion.contains((spark, "corpusA")))
    get("corpusB") // switch: companion's stale-corpus entry swept
    assert(!companion.contains((spark, "corpusA")),
      "stale-corpus companion entry must be dropped on the switch")
  }

  test("another session's entries are never evicted") {
    val memo: Memo[String] = scala.collection.concurrent.TrieMap.empty
    val other = spark.newSession()
    CorpusCaches.cachedPerCorpus(memo, spark, "corpusA")("mine")(_ => ())
    CorpusCaches.cachedPerCorpus(memo, other, "corpusB")("theirs")(_ => ())
    // my corpus switch must leave the other session's entry alone
    CorpusCaches.cachedPerCorpus(memo, spark, "corpusC")("mine2")(_ => ())
    assert(memo.contains((other, "corpusB")))
    assert(!memo.contains((spark, "corpusA")))
  }
}
