package graft

import org.apache.spark.sql.SparkSession

/** One place for session construction so Verify, Bench and tests agree
  * on the configs that affect correctness and local-mode performance.
  */
object Sessions {
  def local(appName: String, defaultCpus: String = "4"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", defaultCpus)
    val spark = SparkSession.builder()
      .appName(appName)
      .master(s"local[$cpus]")
      // graft's SQL kernels + the bin_index→range optimizer rule
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      // Let AQE SIZE the shuffles instead of pinning them at |cpus|:
      // exchanges start at 256 partitions and coalesce down to the
      // 64 MB advisory target, so a 60 M-row join gets real
      // parallelism + spill-friendly chunks while a 6 k-row test
      // shuffle still collapses to a handful of tasks. This is the
      // local-mode analog of sizing spark.sql.shuffle.partitions to
      // the data at cluster scale (the r10 sf10 run measured the
      // pinned-32 x_pagerank at 13.4x for 10x data — spill onset).
      // Streaming state stores ignore this (they pin
      // spark.sql.shuffle.partitions at checkpoint creation).
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.ts is parquet TIMESTAMP(NANOS) — unsupported natively;
      // read as epoch-nanos long, converted in Tables.events.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // keep saveAsTable metadata out of the working directory (the
      // bucketed-layout queries pass explicit data paths; this catches
      // the empty spark-warehouse/ dir the in-memory catalog creates)
      .config("spark.sql.warehouse.dir", graft.core.TmpDirs.warehouseDir)
      // Broadcast threshold stays default (10 MB) — all index/dim
      // sides we broadcast are far below it at any SF because they are
      // bounded by key-space/dimension size, not data size.
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
