package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** t_doc_similarity's tf stage is regime-switched on corpus size
  * (explode+groupBy below DocSimKernelBytes, the row-local TermFreqs
  * kernel above — VERDICT r15 Next #1). The switch must be invisible
  * in the OUTPUT: both regimes produce the identical top-50 row list,
  * bitwise — integer dot products and the (dot desc, doc_a, doc_b)
  * total order leave no room for ties or float drift to hide a
  * divergence. TermFreqsSpec pins the tf stage itself; this spec pins
  * the full query across the switch on real corpus data.
  */
class DocSimRegimeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def rows(kernelTf: Boolean): Seq[(Long, Long, Long, Long)] = {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.01")
    AnalyticsQueries.docSimilarity(docs, kernelTf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
  }

  test("both tf regimes produce the identical ordered top-50") {
    val small = rows(kernelTf = false)
    val big = rows(kernelTf = true)
    assert(small.nonEmpty, "empty result would vacuously pass")
    assert(small == big)
  }
}
