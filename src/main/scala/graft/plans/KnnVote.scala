package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Compiled kNN reference sample: feature matrix + labels, with a
  * single-pass top-k vote. One instance per fitted
  * [[graft.models.KnnModel]]; embedded in the plan as a reference
  * object, so the whole model evaluates inside whole-stage codegen with
  * primitive arithmetic — no per-neighbor struct allocation, no
  * interpreted HOF lambdas, no shuffle.
  *
  * Ordering: neighbors ranked by (distance asc, label asc) — fully
  * deterministic. Vote: regression = mean of the k labels;
  * classification = majority with ties to the smallest label.
  */
final class KnnRef(
    val feats: Array[Array[Double]],
    val labels: Array[Double],
    val k: Int,
    val regression: Boolean) extends Serializable {
  require(feats.length == labels.length && feats.nonEmpty)
  require(feats.forall(_.length == feats(0).length),
    "kNN reference sample has inconsistent feature widths")
  private val kk = math.min(k, feats.length)
  private val dim = feats(0).length

  def vote(x: ArrayData, xFloat: Boolean): Double = {
    val d = x.numElements()
    if (d != dim) throw new IllegalArgumentException(
      s"knn_vote: query vector has $d dims, fitted sample has $dim — " +
        "the serve frame's assembler must match the fit")
    val bestD = new Array[Double](kk)
    val bestL = new Array[Double](kk)
    java.util.Arrays.fill(bestD, Double.PositiveInfinity)
    var n = 0
    while (n < feats.length) {
      val f = feats(n)
      var s = 0.0
      var i = 0
      while (i < dim) {
        val xi = if (xFloat) x.getFloat(i).toDouble else x.getDouble(i)
        val diff = xi - f(i)
        s += diff * diff
        i += 1
      }
      val lab = labels(n)
      // NaN distances (NaN feature) fail both comparisons and skip —
      // handled after the loop; insertion into the (dist, label)-sorted
      // top-k arrays otherwise
      if (s < bestD(kk - 1) || (s == bestD(kk - 1) && lab < bestL(kk - 1))) {
        var j = kk - 1
        while (j > 0 && (bestD(j - 1) > s || (bestD(j - 1) == s && bestL(j - 1) > lab))) {
          bestD(j) = bestD(j - 1); bestL(j) = bestL(j - 1); j -= 1
        }
        bestD(j) = s; bestL(j) = lab
      }
      n += 1
    }
    // slots never filled (all distances NaN, or +Inf from Inf features)
    // must not vote with their 0.0 initializer: vote over the filled
    // prefix, NaN when nothing is comparable (sklearn would error;
    // NaN propagates visibly instead of a confident phantom class)
    var m = kk
    while (m > 0 && java.lang.Double.isInfinite(bestD(m - 1))) m -= 1
    if (m == 0) return Double.NaN
    if (regression) {
      var s = 0.0; var j = 0
      while (j < m) { s += bestL(j); j += 1 }
      s / m
    } else {
      // majority over m labels, ties to the smallest label (O(k²), k tiny)
      var winner = bestL(0); var winCnt = 0
      var i = 0
      while (i < m) {
        var c = 0; var j = 0
        while (j < m) { if (bestL(j) == bestL(i)) c += 1; j += 1 }
        if (c > winCnt || (c == winCnt && bestL(i) < winner)) { winner = bestL(i); winCnt = c }
        i += 1
      }
      winner
    }
  }
}

/** features array<float|double> -> kNN vote against the embedded
  * [[KnnRef]] sample. */
case class KnnVote(child: Expression, ref: KnnRef) extends UnaryExpression {
  override def dataType: DataType = DoubleType

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, false) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"knn_vote requires array<float|double NOT NULL>, got ${other.sql}")
  }

  override def nullSafeEval(x: Any): Any = ref.vote(x.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refName = ctx.addReferenceObj("knnRef", ref, classOf[KnnRef].getName)
    defineCodeGen(ctx, ev, c => s"$refName.vote($c, $isFloat)")
  }

  override protected def withNewChildInternal(c: Expression): KnnVote = copy(child = c)
  override def prettyName: String = "knn_vote"
}

object KnnVote {
  def column(features: Column, ref: KnnRef): Column =
    GraftColumnBridge.column(KnnVote(GraftColumnBridge.expression(features), ref))
}
