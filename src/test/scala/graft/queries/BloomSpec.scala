package graft.queries

import graft.TestSpark
import graft.plans.BloomExprs
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bloom-filter membership (plans.BloomExprs): the properties the
  * rows-only t_decontaminate_bloom row rests on — zero false
  * negatives, a false-positive rate matching the 16-bits/item sizing,
  * and partition-layout-independent filter bytes (bloom merge is
  * bitwise OR, so the aggregate commutes).
  */
class BloomSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def bloomOf(ids: Seq[Long], parts: Int): Array[Byte] = {
    val df = ids.toDF("h").repartition(parts)
    BloomExprs.buildBloom(df, col("h"), ids.length.toLong, ids.length * 16L)
  }

  test("no false negatives; fpp is in the 16-bits-per-item regime") {
    val members = (0L until 2000L).map(_ * 7919L + 13L)
    val bloom = bloomOf(members, 4)
    val probe = (members ++ (0L until 20000L).map(_ * 104729L + 104730L))
      .toDF("h")
    val flagged = probe
      .select(col("h"), BloomExprs.mightContain(bloom, col("h")).as("hit"))
      .collect().collect { case r if r.getBoolean(1) => r.getLong(0) }.toSet
    assert(members.forall(flagged.contains), "every member must hit")
    val nonMembers = 20000
    val fp = flagged.size - members.toSet.size
    // expected ≈ 0.6185^16 ≈ 5e-4; allow 20x slack before failing loud
    assert(fp.toDouble / nonMembers < 0.01,
      s"false-positive rate ${fp.toDouble / nonMembers} out of regime")
  }

  test("filter bytes are partition-layout independent") {
    val members = (0L until 500L).map(_ * 31L)
    val a = bloomOf(members, 1)
    val b = bloomOf(members, 7)
    assert(java.util.Arrays.equals(a, b),
      "bloom aggregate must not depend on partitioning (bitwise-OR merge)")
  }

  test("declared bloom decontamination catches every exact hit") {
    val out = TextQueries.defs("t_decontaminate_bloom")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty, "sf0.001 corpus has contaminated docs")
    assert(out.forall(_.getAs[Boolean]("bloom_caught")),
      "bloom must flag every exactly-contaminated doc (no false negatives)")
    assert(out.forall(r => r.getAs[Long]("exact_hits") > 0),
      "declared rows are exactly the contaminated docs")
  }
}
