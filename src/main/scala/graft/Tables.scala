package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All engine operators take a plain `DataFrame` — these helpers only
  * centralize the path convention `<sfDir>/<table>.parquet`. Reads are
  * plain parquet scans so Catalyst pushes filters/column pruning into
  * the scan (verified via `.explain("formatted")`: `PushedFilters`,
  * `ReadSchema`).
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** CSV ingest (S1 parity with the reference's standalone readers,
    * the experiments/standalone python scripts lines 25-32, which read
    * CSV): header
    * row + explicit schema. Never schema-infer at scale — inference is
    * a full extra pass over the data; callers pass the DDL they expect
    * and malformed rows fail loud (FAILFAST) instead of silently
    * nulling. CSV is row-oriented so column pruning cannot reach the
    * reader the way parquet's does — treat CSV as an ingest format and
    * convert to parquet for anything queried twice. */
  def loadCsv(spark: SparkSession, path: String, schemaDdl: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("mode", "FAILFAST")
      .schema(schemaDdl)
      .csv(path)

  /** JSONL ingest with the same contract as [[loadCsv]]: explicit
    * schema (inference is a full extra pass AND type-unstable — an
    * all-integer sample turns a double column into BIGINT), FAILFAST
    * on malformed lines. Like CSV, JSONL is an ingest format: row-
    * oriented, no column pruning, no predicate pushdown — land it,
    * convert to parquet, query the parquet. */
  def loadJson(spark: SparkSession, path: String, schemaDdl: String): DataFrame =
    spark.read
      .option("mode", "FAILFAST")
      .schema(schemaDdl)
      .json(path)

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's reader
    * rejects; sessions set `spark.sql.legacy.parquet.nanosAsLong=true`
    * (see [[graft.Sessions]]) so it arrives as epoch-nanos LongType and
    * is converted here. INTEGER division (`div`) — `/ 1000` would be
    * double true-division, and at epoch-nanos magnitude (1.7e18) the
    * double ulp is 256 ns, silently shifting ~13% of values by 1 µs.
    * Floor-to-µs matches how µs-resolution engines read the same file.
    */
  private def fixNanos(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    if (df.schema("ts").dataType == LongType)
      // `div` truncates toward zero; floor-correct for pre-epoch values
      df.withColumn("ts", timestamp_micros(
        expr("ts div 1000 - (CASE WHEN ts % 1000 < 0 THEN 1 ELSE 0 END)")))
    else df
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = fixNanos(load(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
