package graft.core

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Fitted-artifact persistence (S5 made real — the reference
  * joblib-dumps the fitted pipeline/trie and measures the artifact,
  * src/transpiler.py:3188-3194, :3266-3273; here the artifact IS a set
  * of relations, so it saves as parquet + a one-row meta relation).
  *
  * Layout under `dir`:
  *   meta/        one row: task, key_len, global_value, iv, selected,
  *                features, categorical, target, max_bins, model
  *   bins/        one row per fitted feature: (feature, kind,
  *                splits array<double>, cat_keys, cat_vals) — parquet
  *                doubles round-trip EXACTLY (no decimal detour), so
  *                the reloaded bin splits serve the identical bits the
  *                in-memory pipeline fitted.
  *   kv/          the (key, value) index relation
  *   prefix_<l>/  the per-length prefix fallback aggregates
  *
  * A reloaded [[graft.InferDbPipeline.Fitted]] probes bit-identically
  * to the in-memory one by construction: every constant the serve plan
  * embeds (splits, kv rows, fallbacks) round-trips through parquet
  * unchanged. At 100 TB the save is a handful of broadcast-sized
  * writes; the load is metadata-only until the first probe broadcasts.
  */
object Persist {
  private def taskName(t: Task): String = t match {
    case Task.Regression => "regression"
    case Task.Classification => "classification"
    case Task.MultiClass => "multiclass"
  }
  private def taskOf(s: String): Task = s match {
    case "regression" => Task.Regression
    case "classification" => Task.Classification
    case "multiclass" => Task.MultiClass
    case other => throw new IllegalArgumentException(s"unknown task '$other'")
  }

  def save(f: graft.InferDbPipeline.Fitted, dir: String): Unit = {
    val spark = f.kv.kv.sparkSession
    import spark.implicits._
    // index relations: tiny (key-space-bounded) — one file each
    f.kv.kv.select(col("key"), col("value"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/kv")
    f.kv.prefixes.foreach { case (l, t) =>
      t.select(col("prefix"), col("value"))
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/prefix_$l")
    }
    f.bins.toSeq.sortBy(_._1).map {
      case (feat, NumericBins(splits)) =>
        (feat, "numeric", splits.toSeq, Seq.empty[String], Seq.empty[Int])
      case (feat, CategoricalBins(m)) =>
        val kv = m.toSeq.sortBy(_._1)
        (feat, "categorical", Seq.empty[Double], kv.map(_._1), kv.map(_._2))
    }.toDF("feature", "kind", "splits", "cat_keys", "cat_vals")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/bins")
    // EVERY Config field persists — a reloaded config silently falling
    // back to defaults (balanceRatio, populatePaths, …) would re-fit a
    // different model than the one that was saved if reused for a
    // refresh, even though serving alone wouldn't notice.
    val c = f.config
    Seq((taskName(c.task), f.kv.keyLen, f.kv.globalValue, f.iv,
        f.selected, c.features, c.categorical.toSeq.sorted,
        c.target, c.maxBins, c.model,
        c.tolerance, c.maxFeatures, c.maxCandidates, c.balanceRatio,
        c.mlpHidden, c.maxOneHot, c.populatePaths))
      .toDF("task", "key_len", "global_value", "iv", "selected",
        "features", "categorical", "target", "max_bins", "model",
        "tolerance", "max_features", "max_candidates", "balance_ratio",
        "mlp_hidden", "max_one_hot", "populate_paths")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** Persist a [[KvIndexState]] (the mergeable sufficient statistics)
    * so tomorrow's ingest can `loadState(...).append(delta)` without
    * rescanning today's corpus — the cross-session form of incremental
    * maintenance. Sums/counts round-trip parquet exactly, so
    * load-then-append equals never-saved append bit for bit. */
  def saveState(st: KvIndexState, dir: String): Unit = {
    st.stats.coalesce(1).write.mode("overwrite").parquet(s"$dir/stats")
    // task + keyLen are DRIVER-side scalars: a java.util.Properties
    // sidecar costs zero Spark jobs where the old one-row parquet meta
    // relation paid a full write job on save and a head() job on load
    // (r16, guide §1.2 — x_index_lifecycle runs this round trip inside
    // its timed region). The stats relation stays parquet — it is the
    // actual data artifact and must round-trip doubles exactly.
    val props = new java.util.Properties()
    props.setProperty("task", taskName(st.task))
    props.setProperty("key_len", st.keyLen.toString)
    // Hadoop FS API (not java.io): the state dir may be hdfs://or
    // s3a:// on a real deployment, same substrate the stats parquet
    // already targets
    val p = new org.apache.hadoop.fs.Path(dir, "state_meta.properties")
    val fs = p.getFileSystem(
      st.stats.sparkSession.sparkContext.hadoopConfiguration)
    val os = fs.create(p, true)
    try props.store(os, "graft KvIndexState meta") finally os.close()
  }

  def loadState(spark: SparkSession, dir: String): KvIndexState = {
    val props = new java.util.Properties()
    val p = new org.apache.hadoop.fs.Path(dir, "state_meta.properties")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val is = fs.open(p)
    try props.load(is) finally is.close()
    KvIndexState(
      taskOf(props.getProperty("task")),
      props.getProperty("key_len").toInt,
      spark.read.parquet(s"$dir/stats"))
  }

  def load(spark: SparkSession, dir: String): graft.InferDbPipeline.Fitted = {
    val meta = spark.read.parquet(s"$dir/meta").head()
    def strs(r: Row, field: String): Seq[String] =
      r.getAs[scala.collection.Seq[String]](field).toSeq
    val task = taskOf(meta.getAs[String]("task"))
    val keyLen = meta.getAs[Int]("key_len")
    val bins: Map[String, BinSpec] = spark.read.parquet(s"$dir/bins").collect().map { r =>
      val feat = r.getAs[String]("feature")
      val spec: BinSpec = r.getAs[String]("kind") match {
        case "numeric" =>
          NumericBins(r.getAs[scala.collection.Seq[Double]]("splits").toArray)
        case "categorical" =>
          CategoricalBins(strs(r, "cat_keys")
            .zip(r.getAs[scala.collection.Seq[Int]]("cat_vals")).toMap)
        case other => throw new IllegalArgumentException(s"unknown bin kind '$other'")
      }
      feat -> spec
    }.toMap
    // cache + materialize like KvIndexBuilder: every probe broadcasts
    // from these, so they must not re-read parquet per probe
    val kv = spark.read.parquet(s"$dir/kv").cache()
    val kvN = kv.count()
    val prefixes = (keyLen - 1 to 1 by -1).map { l =>
      val t = spark.read.parquet(s"$dir/prefix_$l").cache()
      t.count()
      l -> t
    }
    val config = graft.InferDbPipeline.Config(
      features = strs(meta, "features"),
      categorical = strs(meta, "categorical").toSet,
      target = meta.getAs[String]("target"),
      task = task,
      maxBins = meta.getAs[Int]("max_bins"),
      model = meta.getAs[String]("model"),
      tolerance = meta.getAs[Double]("tolerance"),
      maxFeatures = meta.getAs[Int]("max_features"),
      maxCandidates = meta.getAs[Int]("max_candidates"),
      balanceRatio = Option(meta.getAs[java.lang.Double]("balance_ratio")).map(_.doubleValue),
      mlpHidden = meta.getAs[Int]("mlp_hidden"),
      maxOneHot = meta.getAs[Int]("max_one_hot"),
      populatePaths = meta.getAs[Boolean]("populate_paths"))
    graft.InferDbPipeline.Fitted(
      config, bins, strs(meta, "selected"), meta.getAs[Double]("iv"),
      KvModel(task, keyLen, kv, prefixes, meta.getAs[Double]("global_value"),
        kvCountHint = Some(kvN)))
  }
}
