package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, DoubleType, IntegerType, LongType}

/** Optimizer rule: `bin_index(x, s…) = k` → a RANGE predicate on `x`.
  *
  * Why it matters: InferDB-style serving filters on TRANSLATED values
  * (bin indexes, key components). As written, such a predicate is an
  * opaque function call — the parquet reader cannot skip a single row
  * group on it. The equivalent range predicate on the RAW column rides
  * the existing pushdown machinery all the way into `PushedFilters`
  * (row-group min/max skipping — at 100 TB, the difference between
  * scanning a bin's worth of data and scanning everything). This is
  * the one place the engine needs a `Rule[LogicalPlan]` rather than a
  * better expression: the win comes from REWRITING the plan so
  * built-in pushdown applies, not from faster evaluation.
  *
  * The rewrite is an exact expression-level equivalence in ALL
  * contexts (filter, projection, nested boolean):
  *   - k == len  (the overflow bin, which also receives NULL and NaN
  *     inputs):            x >= s(len-1) OR x IS NULL
  *     (NaN >= s is true under Spark's NaN-largest comparison order,
  *     matching BinIndex's NaN → overflow)
  *   - 0 < k < len:        x IS NOT NULL AND x >= s(k-1) AND x < s(k)
  *   - k == 0:             x IS NOT NULL AND x < s(0)
  *   - k out of [0, len]:  false
  * The IS NOT NULL conjunct keeps three-valued logic exact: a NULL x
  * must yield FALSE (its bin is len), never NULL — `false AND NULL`
  * is false, so the conjunction collapses correctly even under NOT(…).
  *
  * Runs inside the operator-optimization fixed point (injected via
  * [[GraftExtensions]]), so constant folding has already collapsed the
  * literal side (including analyzer-inserted casts) by the time it
  * matches.
  */
object BinRangeRewrite extends Rule[LogicalPlan] {

  private def litK(e: Expression): Option[Long] = e match {
    case Literal(v: Long, LongType) => Some(v)
    case Literal(v: Int, IntegerType) => Some(v.toLong)
    case _ => None
  }

  private def range(b: BinIndex, k: Long): Option[Expression] = {
    val s = b.splits
    val len = s.length
    if (len == 0 || !b.child.deterministic) None
    else if (k < 0 || k > len) Some(Literal(false, BooleanType))
    else if (k == len)
      Some(Or(GreaterThanOrEqual(b.child, Literal(s(len - 1), DoubleType)),
        IsNull(b.child)))
    else {
      val upper = LessThan(b.child, Literal(s(k.toInt), DoubleType))
      val body =
        if (k == 0) upper
        else And(GreaterThanOrEqual(b.child, Literal(s(k.toInt - 1), DoubleType)), upper)
      Some(And(IsNotNull(b.child), body))
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case eq @ EqualTo(b: BinIndex, lit) =>
      litK(lit).flatMap(range(b, _)).getOrElse(eq)
    case eq @ EqualTo(lit, b: BinIndex) =>
      litK(lit).flatMap(range(b, _)).getOrElse(eq)
  }
}
