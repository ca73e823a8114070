package graft

import graft.core.{NumericBins, Task, TmpDirs}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fitted-artifact persistence (S5): save → load must reproduce every
  * serve-time constant bit for bit, and the reloaded index must probe
  * identically to the in-memory one — including the prefix-fallback and
  * global-fallback paths, which only fire on keys unseen at fit time.
  */
class PersistSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val trained = {
    val df = Tables.lineitem(spark, sf).select(
      col("l_orderkey"), col("l_linenumber"),
      col("l_quantity"), col("l_discount"), col("l_returnflag"),
      (col("l_extendedprice") > 30000.0).cast("double").as("target"))
    InferDbPipeline.fitWithModel(df, InferDbPipeline.Config(
      features = Seq("l_quantity", "l_discount", "l_returnflag"),
      categorical = Set("l_returnflag"),
      target = "target", task = Task.Classification, maxBins = 5,
      // non-default fit-time fields: the round-trip must carry them too
      // (a reloaded config falling back to defaults would re-fit a
      // different model on refresh)
      tolerance = 1.01, maxFeatures = 2, maxCandidates = 7,
      balanceRatio = Some(1.5), maxOneHot = 16))._1
  }

  private lazy val reloaded = {
    val dir = TmpDirs.scratch("persist_spec", sf)
    trained.save(dir)
    InferDbPipeline.load(spark, dir)
  }

  test("fitted constants round-trip exactly") {
    assert(reloaded.selected == trained.selected)
    // the ENTIRE config, including fit-time-only fields
    assert(reloaded.config == trained.config)
    assert(java.lang.Double.doubleToRawLongBits(reloaded.kv.globalValue) ==
      java.lang.Double.doubleToRawLongBits(trained.kv.globalValue))
    assert(reloaded.bins == trained.bins ||
      // NumericBins holds an Array — compare content, not reference
      trained.bins.forall { case (f, spec) => (spec, reloaded.bins(f)) match {
        case (NumericBins(a), NumericBins(b)) => a.sameElements(b)
        case (x, y) => x == y
      }})
    val kvA = trained.kv.kv.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val kvB = reloaded.kv.kv.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(kvA == kvB)
  }

  test("reloaded index probes identically, including fallback paths") {
    // probe frame widened beyond the training distribution so unseen
    // keys exercise prefix + global fallbacks on both sides
    val probe = Tables.lineitem(spark, sf).select(
      col("l_orderkey"), col("l_linenumber"),
      (col("l_quantity") * 3.0).as("l_quantity"),
      col("l_discount"), col("l_returnflag"))
    val a = trained.transform(probe, "p")
      .select("l_orderkey", "l_linenumber", "p").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val b = reloaded.transform(probe, "p")
      .select("l_orderkey", "l_linenumber", "p").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(a.nonEmpty && a.size == b.size)
    a.foreach { case (k, v) =>
      assert(java.lang.Double.doubleToRawLongBits(v) ==
        java.lang.Double.doubleToRawLongBits(b(k)), s"row $k: $v vs ${b(k)}")
    }
  }

  test("local scorer from the reloaded artifact agrees with the in-memory one") {
    val sa = trained.toLocalScorer
    val sb = reloaded.toLocalScorer
    val inputs = Seq(
      Seq[Any](10.0, 0.05, "R"), Seq[Any](45.0, 0.0, "N"),
      Seq[Any](999.0, 0.99, "Z"), Seq[Any](null, null, null))
      // only the SELECTED features feed the scorer
      .map(_.take(trained.selected.length))
    inputs.foreach { in =>
      assert(java.lang.Double.doubleToRawLongBits(sa(in)) ==
        java.lang.Double.doubleToRawLongBits(sb(in)))
    }
  }
}
