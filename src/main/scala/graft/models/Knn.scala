package graft.models

import org.apache.spark.ml.Model
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.ml.param.ParamMap
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructType}

/** k-nearest-neighbor model over a bounded, deterministic reference
  * sample — the last member of the reference's standalone model zoo
  * (ref: experiments/standalone/standalone_experiments.py:10-17,
  * KNeighborsClassifier).
  *
  * Spark-first strategy: sklearn's kNN holds the whole train set and
  * scans it per query; a faithful distributed copy is an all-pairs
  * join, which is exactly what dies at 100 TB. Instead the reference
  * set is a deterministic `sampleN`-row sample collected to the driver
  * and compiled into a [[graft.plans.KnnRef]] embedded in the plan, so
  * serving is ONE whole-stage-codegen projection — per row a primitive
  * top-k scan over the sample ([[graft.plans.KnnVote]]) — with ZERO
  * shuffles and no state beyond the plan-time reference. For large
  * reference sets the honest scale path is the ANN family (SRP-LSH /
  * IVF queries); this model is the exact-within-sample analog that
  * slots into the index lifecycle.
  *
  * Vote semantics: regression = mean of the k nearest labels;
  * classification = majority vote over the k nearest, ties broken by
  * the smallest label (distance ties already ranked by label asc) —
  * fully deterministic.
  */
final class KnnModel(
    override val uid: String,
    val sample: Seq[(Seq[Double], Double)],
    val k: Int,
    featuresCol: String,
    predictionCol: String,
    regression: Boolean)
  extends Model[KnnModel] {

  require(sample.nonEmpty, "kNN needs a non-empty reference sample")

  override def copy(extra: ParamMap): KnnModel = this
  override def transformSchema(schema: StructType): StructType =
    // nullable: a null features vector yields a null prediction
    schema.add(predictionCol, DoubleType, nullable = true)

  override def transform(df: Dataset[_]): DataFrame = {
    val ref = new graft.plans.KnnRef(
      sample.map(_._1.toArray).toArray, sample.map(_._2).toArray, k, regression)
    df.withColumn(predictionCol,
      graft.plans.KnnVote.column(vector_to_array(col(featuresCol)), ref))
  }
}

object KnnModel {
  /** Deterministic fit: sample = the `sampleN` rows with the smallest
    * xxhash64(features, label) — stable across runs, partitionings and
    * retries (TakeOrdered, no full shuffle). */
  def fit(
      data: DataFrame,
      featuresCol: String,
      labelCol: String,
      predictionCol: String,
      regression: Boolean,
      k: Int = 5,
      sampleN: Int = 256): KnnModel = {
    val rows = data
      .select(vector_to_array(col(featuresCol)).as("f"),
        col(labelCol).cast("double").as("l"))
      .orderBy(xxhash64(col("f"), col("l")), col("l"))
      .limit(sampleN)
      .collect()
      .map(r => (r.getSeq[Double](0), r.getDouble(1)))
      .toSeq
    new KnnModel(Identifiable.randomUID("knn"), rows, k,
      featuresCol, predictionCol, regression)
  }
}
