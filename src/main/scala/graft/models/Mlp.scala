package graft.models

import graft.functions.Fns
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Two-layer MLP scoring (ref: src/transpiler.py:1696-1835,
  * sql_scripts/nn_inference.sql): hidden = relu(x·W0 + b0),
  * out = sigmoid(hidden·W1 + b1) (binary) or argmax (multi-class).
  *
  * Spark-first strategy: weights are constants at plan time, so the
  * whole network is ONE fused codegen'd projection — no COO explode, no
  * per-layer shuffle. The reference's GEMM-join chain
  * (nn_inference.sql:15-40) is kept as [[gemmJoin]] for parity tests;
  * at scale the fused form is strictly better (0 shuffles vs 2 joins +
  * 2 aggregations per layer).
  */
final case class MlpModel(
    w0: Array[Array[Double]], // [in][hidden]
    b0: Array[Double],        // [hidden]
    w1: Array[Array[Double]], // [hidden][out]
    b1: Array[Double],        // [out]
    hiddenActivation: String = "relu" // "relu" (reference) | "sigmoid" (MLlib MLP)
) {
  require(Set("relu", "sigmoid").contains(hiddenActivation),
    s"unknown hidden activation '$hiddenActivation'")
  private def inDim = w0.length
  private def hDim  = b0.length
  private def outDim = b1.length

  def hiddenExprs(features: Seq[Column]): Seq[Column] = {
    require(features.length == inDim, "feature arity mismatch")
    (0 until hDim).map { j =>
      val z = features.zipWithIndex.collect {
        case (f, i) if w0(i)(j) != 0.0 => f.cast("double") * lit(w0(i)(j))
      }.reduceOption(_ + _).getOrElse(lit(0.0)) + lit(b0(j))
      if (hiddenActivation == "sigmoid") Fns.sigmoid(z) else Fns.relu(z)
    }
  }

  def outputExprs(features: Seq[Column]): Seq[Column] = {
    val h = hiddenExprs(features)
    (0 until outDim).map { k =>
      h.zipWithIndex.collect {
        case (hj, j) if w1(j)(k) != 0.0 => hj * lit(w1(j)(k))
      }.reduceOption(_ + _).getOrElse(lit(0.0)) + lit(b1(k))
    }
  }

  /** Binary-classification probability (single output unit). */
  def predictProba(features: Seq[Column]): Column = {
    require(outDim == 1)
    Fns.sigmoidRef(outputExprs(features).head)
  }

  /** Multi-class argmax over output units (nn_inference + W2 argmax);
    * ties -> lowest class index. */
  def predictClass(features: Seq[Column]): Column = {
    val scores = array(outputExprs(features): _*)
    (array_position(scores, array_max(scores)) - 1).cast("long")
  }

  /** Weights as a typed Dataset of [[graft.core.Types.NNWeight]]. */
  def weightEntries(spark: SparkSession): org.apache.spark.sql.Dataset[graft.core.Types.NNWeight] = {
    import spark.implicits._
    val l0 = for { i <- w0.indices; j <- 0 until hDim }
      yield graft.core.Types.NNWeight(0, i, j, w0(i)(j), b0(j))
    val l1 = for { j <- w1.indices; k <- 0 until outDim }
      yield graft.core.Types.NNWeight(1, j, k, w1(j)(k), b1(k))
    (l0 ++ l1).toDS()
  }

  /** Weights as the reference's relation shape (id, row, col, val, bias)
    * — id 0 = layer 0, id 1 = layer 1 (transpiler.py:1702-1729). */
  def weightsRelation(spark: SparkSession): DataFrame =
    weightEntries(spark).toDF()
      .select(col("layer").as("id"), col("row"), col("col"),
        col("value").as("val"), col("bias"))

  /** Reference-shaped GEMM-join plan over COO input (row_id, col_id,
    * val): two broadcast joins + two aggregations. Parity path only.
    */
  def gemmJoin(coo: DataFrame, spark: SparkSession): DataFrame = {
    // weight column renamed: both COO and the weight relation carry
    // `val`, which would be AMBIGUOUS_REFERENCE after the join.
    val w = weightsRelation(spark).withColumnRenamed("val", "wval").cache()
    val l0 = coo.filter(col("val") =!= 0.0)
      .join(broadcast(w.filter(col("id") === 0)), col("col_id") === col("row"))
      .groupBy(col("row_id"), col("col").as("h"))
      .agg(Fns.relu(sum(col("val") * col("wval")) + first(col("bias"))).as("hval"))
    l0.join(broadcast(w.filter(col("id") === 1)), col("h") === col("row"))
      .groupBy(col("row_id"), col("col").as("out_id"))
      .agg((sum(col("hval") * col("wval")) + first(col("bias"))).as("z"))
  }
}

object MlpModel {
  /** Extract a TRAINED MLlib MLP's weights into the fused scorer
    * (transpiler.py:1696-1835 transpiles trained MLPs the same way).
    *
    * MLlib's FeedForwardTopology stores each affine layer as a
    * column-major (out × in) matrix followed by its bias vector, with
    * SIGMOID hidden activation and softmax on top — so the extracted
    * model uses `hiddenActivation = "sigmoid"`, and [[MlpModel
    * .predictClass]]'s argmax over the raw output units equals the
    * MLlib prediction (softmax is monotone).
    */
  def fromMlpClassifier(
      m: org.apache.spark.ml.classification.MultilayerPerceptronClassificationModel): MlpModel = {
    val layers = m.getLayers
    require(layers.length == 3,
      s"fused extraction supports exactly one hidden layer; got layers=${layers.mkString(",")}")
    val nIn = layers(0); val nHid = layers(1); val nOut = layers(2)
    val v = m.weights.toArray
    require(v.length == nHid * nIn + nHid + nOut * nHid + nOut,
      s"weight vector length ${v.length} does not match layers ${layers.mkString(",")}")
    val w0 = Array.tabulate(nIn, nHid)((i, j) => v(j + i * nHid))
    val b0 = Array.tabulate(nHid)(j => v(nHid * nIn + j))
    val off = nHid * nIn + nHid
    val w1 = Array.tabulate(nHid, nOut)((j, k) => v(off + k + j * nOut))
    val b1 = Array.tabulate(nOut)(k => v(off + nOut * nHid + k))
    MlpModel(w0, b0, w1, b1, hiddenActivation = "sigmoid")
  }
}
