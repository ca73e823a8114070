package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located join via bucketing — the pre-partitioning technique for
  * repeated big-big joins at 100 TB: both sides bucketed on the join
  * key with the same bucket count join with ZERO shuffle exchanges
  * (each task reads matching buckets from both sides).
  */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bucketed tables join without any shuffle exchange") {
    val facts = (1 to 10000).map(i => (i.toLong % 500, i.toDouble)).toDF("k", "v")
    val dims  = (0 until 500).map(i => (i.toLong, s"dim_$i")).toDF("k", "name")

    spark.sql("DROP TABLE IF EXISTS graft_facts_b")
    spark.sql("DROP TABLE IF EXISTS graft_dims_b")
    facts.write.bucketBy(8, "k").sortBy("k").saveAsTable("graft_facts_b")
    dims.write.bucketBy(8, "k").sortBy("k").saveAsTable("graft_dims_b")

    // disable broadcast so the bucket layout (not a broadcast) is what
    // avoids the shuffle — the big-big join case.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("graft_facts_b")
        .join(spark.table("graft_dims_b"), "k")
        .groupBy("name").agg(sum("v").as("sv"))
      assert(j.count() == 500)
      val shuffles = j.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      // one exchange for the final groupBy is allowed; the JOIN itself
      // must not shuffle either side (2 scans -> sort-merge on buckets).
      assert(shuffles.size <= 1, s"unexpected shuffles: ${shuffles.size}")
      val plan = j.queryExecution.executedPlan.toString()
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 10485760L)
      spark.sql("DROP TABLE IF EXISTS graft_facts_b")
      spark.sql("DROP TABLE IF EXISTS graft_dims_b")
    }
  }
}
