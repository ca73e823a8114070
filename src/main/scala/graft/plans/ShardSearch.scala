package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shard id for a composite (string, double, long, long) sort key
  * against FROZEN literal bounds: pid = #bounds <= key, by a runtime
  * binary search — the deterministic total-order partitioner behind
  * [[graft.queries.AnalyticsQueries.distributionWindows]].
  *
  * Why an expression and not a `when` tree: the bounds are per-corpus
  * (driver-sampled), so an unrolled comparison tree over 100+ bound
  * literals is thousands of Catalyst nodes — at the 100x corpus it
  * overflowed Janino's 64 KB method limit and dropped the WHOLE stage
  * out of whole-stage codegen (the r13 first cut measured 2x slower
  * than the form it replaced). This is the [[BinIndex]] lesson applied
  * to a composite key: constant generated-code size regardless of
  * bound count, one O(log n) search per row, stays inside codegen.
  *
  * Ordering matches Spark's own: strings binary (UTF8String.compareTo),
  * doubles with NaN largest and NaN = NaN, and -0.0 == 0.0 (both sides
  * normalize -0.0 before Double.compare). Inputs must be NON-NULL —
  * same contract the caller's tie-compression pass already documents.
  */
final class ShardBounds(
    val g: Array[UTF8String], val q: Array[Double],
    val ok: Array[Long], val ln: Array[Long]) extends Serializable {
  def size: Int = g.length

  /** key >= bounds(m), in Spark's ordering. */
  def keyGe(kg: UTF8String, kq: Double, kok: Long, kln: Long, m: Int): Boolean = {
    val c0 = kg.compareTo(g(m))
    if (c0 != 0) return c0 > 0
    // + 0.0 folds -0.0 into 0.0; Double.compare then matches Spark's
    // NaN-largest / NaN-self-equal comparison semantics
    val c1 = java.lang.Double.compare(kq + 0.0, q(m))
    if (c1 != 0) return c1 > 0
    if (kok != ok(m)) return kok > ok(m)
    kln >= ln(m)
  }

  /** #bounds <= key: the shard id in [0, size]. */
  def search(kg: UTF8String, kq: Double, kok: Long, kln: Long): Int = {
    var lo = 0
    var hi = size
    while (lo < hi) {
      val m = (lo + hi) >>> 1
      if (keyGe(kg, kq, kok, kln, m)) lo = m + 1 else hi = m
    }
    lo
  }
}

case class ShardSearch(g: Expression, q: Expression, ok: Expression,
    ln: Expression, bounds: ShardBounds) extends Expression {

  override def children: Seq[Expression] = Seq(g, q, ok, ln)
  override def nullable: Boolean = false
  override def dataType: DataType = IntegerType
  override def foldable: Boolean = false

  override def checkInputDataTypes() = {
    val want = Seq(StringType, DoubleType, LongType, LongType)
    if (children.map(_.dataType) == want)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"shard_search needs (STRING, DOUBLE, BIGINT, BIGINT), got " +
        children.map(_.dataType.sql).mkString(", "))
  }

  // The non-null contract fails LOUDLY and identically in both
  // execution modes (ADVICE r13): interpreted eval used to NPE while
  // codegen silently passed the slot's default value (-1.0/0) into
  // search() and produced a wrong pid. Nullable-TYPED children are
  // fine (parquet columns are nullable by default); a null VALUE is
  // the contract violation.
  private def nullViolation(which: String): Nothing =
    throw new IllegalArgumentException(
      s"shard_search: null $which input violates the non-null contract " +
        "documented at the call site (distributionWindows tie pass)")

  override def eval(input: InternalRow): Any = {
    val vg = g.eval(input); if (vg == null) nullViolation("group")
    val vq = q.eval(input); if (vq == null) nullViolation("quantity")
    val vok = ok.eval(input); if (vok == null) nullViolation("orderkey")
    val vln = ln.eval(input); if (vln == null) nullViolation("linenumber")
    bounds.search(vg.asInstanceOf[UTF8String], vq.asInstanceOf[Double],
      vok.asInstanceOf[Long], vln.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("shardBounds", bounds, classOf[ShardBounds].getName)
    val gg = g.genCode(ctx); val qq = q.genCode(ctx)
    val kk = ok.genCode(ctx); val ll = ln.genCode(ctx)
    // mirror eval's loud contract check: a nullable child that
    // evaluates to null must throw, not feed the slot default into
    // search() (silent wrong pid). Non-nullable children emit nothing.
    def guard(c: Expression, e: ExprCode, which: String): String =
      if (c.nullable)
        s"""if (${e.isNull}) throw new IllegalArgumentException(
           |  "shard_search: null $which input violates the non-null contract");
           |""".stripMargin
      else ""
    val guards = guard(g, gg, "group") + guard(q, qq, "quantity") +
      guard(ok, kk, "orderkey") + guard(ln, ll, "linenumber")
    ev.copy(
      code = code"""
        ${gg.code}
        ${qq.code}
        ${kk.code}
        ${ll.code}
        ${guards}
        final int ${ev.value} =
          $b.search(${gg.value}, ${qq.value}, ${kk.value}, ${ll.value});
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ShardSearch =
    copy(g = newChildren(0), q = newChildren(1),
      ok = newChildren(2), ln = newChildren(3))

  override def prettyName: String = "shard_search"
}

object ShardSearch {
  /** Bounds from driver rows of (string, double, long, long) — sorted
    * by the caller (Spark-side orderBy), -0.0 normalized here. */
  def bounds(rows: Seq[org.apache.spark.sql.Row]): ShardBounds =
    new ShardBounds(
      rows.map(r => UTF8String.fromString(r.getString(0))).toArray,
      rows.map(r => r.getDouble(1) + 0.0).toArray,
      rows.map(_.getLong(2)).toArray,
      rows.map(_.getLong(3)).toArray)

  def column(g: Column, q: Column, ok: Column, ln: Column, b: ShardBounds): Column =
    GraftColumnBridge.column(ShardSearch(
      GraftColumnBridge.expression(g), GraftColumnBridge.expression(q),
      GraftColumnBridge.expression(ok), GraftColumnBridge.expression(ln), b))
}
