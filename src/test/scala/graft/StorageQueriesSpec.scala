package graft

import graft.queries.StorageQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Driver-facing storage-layout queries: results must equal the plain
  * (layout-free) computation, and the layout assertions inside the
  * queries (PartitionFilters present; zero shuffle exchanges) must hold
  * on real testdata — they `require()` internally, so building the
  * DataFrame is itself the plan-shape check.
  */
class StorageQueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("s6_ctas_partition_prune: pruned read-back equals direct filter") {
    val res = StorageQueries.defs("s6_ctas_partition_prune")(spark, sf)
    val row = res.head()
    val direct = Tables.orders(spark, sf)
      .filter(col("o_orderstatus") === "F")
      .agg(count(lit(1)).as("cnt"),
        (sum(round(col("o_totalprice") * 100).cast("long")) / 100.0).as("revenue"))
      .head()
    assert(row.getAs[Long]("cnt") == direct.getAs[Long]("cnt"))
    assert(row.getAs[Double]("revenue") == direct.getAs[Double]("revenue"))
  }

  test("j_skew_salted: salted shuffle join equals plain join") {
    val res = StorageQueries.defs("j_skew_salted")(spark, sf)
    val e = Tables.events(spark, sf)
    val direct = e.groupBy("event_type").agg(count(lit(1)).as("type_freq"))
      .join(e, "event_type")
      .select("event_id", "event_type", "type_freq")
    assert(res.count() == direct.count())
    assert(res.join(direct, Seq("event_id", "event_type", "type_freq")).count() == direct.count())
  }

  test("s3_sharded_export: all shards written, balanced, totals preserved") {
    val rows = StorageQueries.defs("s3_sharded_export")(spark, sf).collect()
    assert(rows.length == 8, "one summary row per shard")
    val counts = rows.map(_.getAs[Long]("n_docs"))
    assert(counts.sum == Tables.documents(spark, sf).count())
    assert(counts.max <= counts.min * 3 / 2,
      s"shards unbalanced: ${counts.mkString(",")}")
    val totalChars = Tables.documents(spark, sf)
      .agg(sum("n_chars")).head().getLong(0)
    assert(rows.map(_.getAs[Long]("sum_chars")).sum == totalChars)
  }

  test("s2_bucketed_smb_join: shuffle-free result equals plain join") {
    val res = StorageQueries.defs("s2_bucketed_smb_join")(spark, sf)
    val o = Tables.orders(spark, sf)
    val l = Tables.lineitem(spark, sf)
    val direct = o.join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy("o_orderkey")
      .agg(count(lit(1)).as("cnt"),
        (sum(round(col("l_extendedprice") * 100).cast("long")) / 100.0).as("revenue"))
    assert(res.count() == direct.count())
    assert(res.join(direct, Seq("o_orderkey", "cnt", "revenue")).count() == direct.count())
  }
}
