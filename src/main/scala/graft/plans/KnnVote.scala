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
  private val kk = math.min(k, feats.length)

  def vote(x: ArrayData, xFloat: Boolean): Double = {
    val bestD = new Array[Double](kk)
    val bestL = new Array[Double](kk)
    java.util.Arrays.fill(bestD, Double.PositiveInfinity)
    val d = x.numElements()
    var n = 0
    while (n < feats.length) {
      val f = feats(n)
      val lim = math.min(d, f.length)
      var s = 0.0
      var i = 0
      while (i < lim) {
        val xi = if (xFloat) x.getFloat(i).toDouble else x.getDouble(i)
        val diff = xi - f(i)
        s += diff * diff
        i += 1
      }
      val lab = labels(n)
      // insertion into the (dist, label)-sorted top-k arrays
      if (s < bestD(kk - 1) || (s == bestD(kk - 1) && lab < bestL(kk - 1))) {
        var j = kk - 1
        while (j > 0 && (bestD(j - 1) > s || (bestD(j - 1) == s && bestL(j - 1) > lab))) {
          bestD(j) = bestD(j - 1); bestL(j) = bestL(j - 1); j -= 1
        }
        bestD(j) = s; bestL(j) = lab
      }
      n += 1
    }
    if (regression) {
      var s = 0.0; var j = 0
      while (j < kk) { s += bestL(j); j += 1 }
      s / kk
    } else {
      // majority over kk labels, ties to the smallest label (O(k²), k tiny)
      var winner = bestL(0); var winCnt = 0
      var i = 0
      while (i < kk) {
        var c = 0; var j = 0
        while (j < kk) { if (bestL(j) == bestL(i)) c += 1; j += 1 }
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
