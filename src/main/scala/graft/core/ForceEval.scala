package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Full-evaluation checksum for timing: `.count()` on a projection lets
  * Catalyst's ColumnPruning delete the projected expressions (the stage
  * would time only the scan), so timed evaluation must consume EVERY
  * column. One shared helper so the subtlety lives in one place.
  */
object ForceEval {
  /** Evaluate every column of `df` (hash-checksum aggregate); returns
    * (rows, checksum). */
  def checksum(df: DataFrame): (Long, Long) = {
    val r = df.select(hash(df.columns.map(col): _*).as("__h"))
      .agg(count(lit(1)).as("n"), coalesce(sum(col("__h")), lit(0L)).as("chk"))
      .head()
    (r.getLong(0), r.getLong(1))
  }
}
