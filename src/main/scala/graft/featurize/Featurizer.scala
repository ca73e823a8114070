package graft.featurize

import graft.functions.Fns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Composable featurizers (SURVEY §7.1 `featurize/` module) — the
  * Spark shape of the reference's NYC/Hits featurizer classes
  * (src/featurizers): a featurizer is a list of named column
  * expressions (+ optional broadcast lookup joins), so composing
  * featurizers is list concatenation and the whole thing stays inside
  * one fused projection.
  */
trait Featurizer {
  /** Named feature expressions appended to the input. */
  def features: Seq[(String, Column)]

  /** Optional lookup joins applied BEFORE the feature projection
    * (route-frequency style dictionaries — broadcast, T10/J4). */
  def lookups(df: DataFrame): DataFrame = df

  def apply(df: DataFrame): DataFrame = {
    val withLookups = lookups(df)
    features.foldLeft(withLookups) { case (d, (n, c)) => d.withColumn(n, c) }
  }

  /** Compose: this featurizer's output feeds `other`. */
  def andThen(other: Featurizer): Featurizer = {
    val self = this
    new Featurizer {
      def features: Seq[(String, Column)] = self.features ++ other.features
      override def lookups(df: DataFrame): DataFrame =
        other.lookups(self.lookups(df))
    }
  }
}

/** Datetime features with PG-convention conventions (F1-F3). */
final case class DateTimeFeaturizer(ts: Column) extends Featurizer {
  def features: Seq[(String, Column)] = Seq(
    "f_hour" -> hour(ts),
    "f_month" -> month(ts),
    "f_dow" -> Fns.pgDow(ts),
    "f_is_weekend" -> Fns.isWeekend(ts))
}

/** Spherical distance to a fixed point + coarse lat/lon grid cell
  * (F7/F15 — the geo half of the NYC featurizer).
  */
final case class GeoFeaturizer(lat: Column, lon: Column, refLat: Double, refLon: Double)
    extends Featurizer {
  def features: Seq[(String, Column)] = Seq(
    "f_dist_km" -> Fns.sphericalDistanceKm(lat, lon, lit(refLat), lit(refLon)),
    "f_grid" -> (floor((lat + 90.0) / 45.0) * 10 + floor((lon + 180.0) / 90.0)).cast("long"))
}

/** IQR-style outlier imputation with a fitted replacement expression
  * (T9): values outside [lo, hi] are replaced by `replacement`.
  */
final case class OutlierImputer(c: Column, lo: Double, hi: Double, replacement: Column)
    extends Featurizer {
  def features: Seq[(String, Column)] = Seq(
    "f_imputed" -> when(c < lo || c > hi, replacement).otherwise(c))
}
