package graft.plans

import org.apache.spark.ml.tree.{CategoricalSplit, ContinuousSplit, InternalNode, LeafNode, Node}
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Compiled tree-ensemble scorer: every fitted tree flattened into
  * array-encoded nodes (feature / threshold / left / right / leaf
  * value) and traversed with a while-loop — one reference object per
  * ensemble, embedded in the plan like [[KnnRef]], so a 500-tree
  * production model costs O(depth) primitive compares per tree per row
  * with CONSTANT generated-code size. The nested `when`-chain encoding
  * ([[graft.models.TreeServe.column]]) is semantically identical but
  * its codegen grows with node count — the SURVEY §7.4 wide-CASE risk;
  * this is the array/loop form that replaces it in the serve path
  * (the reference transpiles trees to CASE SQL, src/transpiler.py's
  * model transpilation — the oracle side keeps that form).
  *
  * Bitwise parity with the `when`-chain: traversal picks the SAME leaf
  * constant (MLlib semantics — go left iff feature <= threshold; a NaN
  * feature fails the compare and goes right, exactly like Spark's
  * `when` on a NaN/NULL-as-NaN input), and the score accumulates
  * leaf(t)·weight(t) left-to-right — the same association as
  * `gbtRawExpr`'s reduce, so even continuous outputs are bit-identical.
  * TreeEnsembleSpec pins this against TreeServe.column per row.
  */
final class TreeEnsembleRef(
    val feat: Array[Int],      // per node: feature slot, or -1 for leaf
    val thresh: Array[Double], // per node: split threshold (continuous internal only)
    val left: Array[Int],
    val right: Array[Int],
    val value: Array[Double],  // per node: leaf prediction (leaf only)
    val roots: Array[Int],     // root node index per tree
    val weights: Array[Double],
    // per node: SORTED left-branch category values for a nominal split,
    // or null for continuous/leaf nodes — membership via binary search
    // (Double.compare order), the array/loop form of MLlib's
    // CategoricalSplit.shouldGoLeft set lookup
    val cats: Array[Array[Double]]) extends Serializable {
  require(roots.length == weights.length && roots.nonEmpty)
  require(cats.length == feat.length)
  private val dim = if (feat.isEmpty) 0 else feat.max + 1

  def score(x: ArrayData): Double = {
    val d = x.numElements()
    if (d < dim) throw new IllegalArgumentException(
      s"tree_ensemble_score: query vector has $d dims, fitted trees read slot ${dim - 1}")
    var sum = 0.0
    var t = 0
    while (t < roots.length) {
      var cur = roots(t)
      var f = feat(cur)
      while (f >= 0) {
        val v = x.getDouble(f)
        val goLeft =
          if (cats(cur) != null) java.util.Arrays.binarySearch(cats(cur), v) >= 0
          else v <= thresh(cur)
        cur = if (goLeft) left(cur) else right(cur)
        f = feat(cur)
      }
      sum += value(cur) * weights(t)
      t += 1
    }
    sum
  }
}

object TreeEnsembleRef {
  /** Flatten fitted MLlib tree roots (continuous AND nominal splits —
    * a nominal node stores its sorted left-category array) into the
    * array encoding, preserving tree order for the weighted sum. */
  def fromNodes(rootNodes: Seq[Node], ws: Array[Double]): TreeEnsembleRef = {
    require(rootNodes.length == ws.length,
      s"${rootNodes.length} trees vs ${ws.length} weights")
    val feat = scala.collection.mutable.ArrayBuffer.empty[Int]
    val thresh = scala.collection.mutable.ArrayBuffer.empty[Double]
    val left = scala.collection.mutable.ArrayBuffer.empty[Int]
    val right = scala.collection.mutable.ArrayBuffer.empty[Int]
    val value = scala.collection.mutable.ArrayBuffer.empty[Double]
    val cats = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    def add(n: Node): Int = n match {
      case l: LeafNode =>
        val i = feat.length
        feat += -1; thresh += 0.0; left += -1; right += -1; value += l.prediction
        cats += null
        i
      case in: InternalNode =>
        val i = feat.length
        in.split match {
          case c: ContinuousSplit =>
            feat += c.featureIndex; thresh += c.threshold; cats += null
          case c: CategoricalSplit =>
            feat += c.featureIndex; thresh += 0.0; cats += c.leftCategories.sorted
          case other => throw new IllegalArgumentException(
            s"TreeEnsembleRef: unsupported split type $other")
        }
        left += -1; right += -1; value += 0.0
        val li = add(in.leftChild)
        val ri = add(in.rightChild)
        left(i) = li; right(i) = ri
        i
    }
    val roots = rootNodes.map(add).toArray
    new TreeEnsembleRef(feat.toArray, thresh.toArray, left.toArray,
      right.toArray, value.toArray, roots, ws.clone(), cats.toArray)
  }

  /** features array<double NOT NULL> -> Σ weightᵢ·treeᵢ(features).
    * Callers with nullable feature columns coalesce to NaN first (NaN
    * routes right at every split — the same branch Spark's `when` takes
    * on a NULL condition, so the chain and the loop stay in lockstep). */
  def column(features: Column, ref: TreeEnsembleRef): Column =
    GraftColumnBridge.column(
      TreeEnsembleScore(GraftColumnBridge.expression(features), ref))
}

/** The Catalyst expression: stays inside whole-stage codegen via a
  * single reference-object call, like [[KnnVote]]. */
case class TreeEnsembleScore(child: Expression, ref: TreeEnsembleRef)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, false) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"tree_ensemble_score requires array<double NOT NULL>, got ${other.sql}")
  }

  override def nullSafeEval(x: Any): Any = ref.score(x.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refName = ctx.addReferenceObj("treeEnsembleRef", ref,
      classOf[TreeEnsembleRef].getName)
    defineCodeGen(ctx, ev, c => s"$refName.score($c)")
  }

  override protected def withNewChildInternal(c: Expression): TreeEnsembleScore =
    copy(child = c)
  override def prettyName: String = "tree_ensemble_score"
}
