package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled KV-probe cascade: the collected (key-space-bounded) kv +
  * prefix maps embedded in the plan as a reference object — the serve
  * path becomes ONE whole-stage-codegen projection doing a hash-lookup
  * cascade per row, replacing keyLen broadcast hash joins + coalesce
  * ([[graft.core.KvModel.probe]]'s join form, which stays as the
  * fallback for indexes too large to embed). Same cascade order as the
  * joins — exact hit, then longest-to-shortest field-wise prefix, then
  * the global aggregate — over the same collected doubles, so the two
  * forms are bitwise identical (KvProbeSpec pins it).
  *
  * Scale shape: the reference object rides the task binary exactly like
  * [[KnnRef]]/[[TreeEnsembleRef]] — one copy per executor, zero join
  * overhead, and the probe side needs no exchange at any input size.
  * (The reference serves this cascade as dynamic SQL per row,
  * src/inference_trie.py:60-98; the join form mirrors its batch SQL,
  * this kernel is the point-lookup form applied to the batch path.)
  */
final class KvScorerRef(val scorer: graft.core.LocalScorer) extends Serializable {
  def score(key: UTF8String): Double = scorer.scoreKey(key.toString)
}

/** key string -> cascaded index value (never null on non-null input —
  * the global aggregate answers every miss). */
case class KvProbeScore(child: Expression, ref: KvScorerRef) extends UnaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kv_probe requires a STRING key, got ${other.sql}")
  }

  override def nullSafeEval(k: Any): Any = ref.score(k.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refName = ctx.addReferenceObj("kvScorerRef", ref, classOf[KvScorerRef].getName)
    defineCodeGen(ctx, ev, c => s"$refName.score($c)")
  }

  override protected def withNewChildInternal(c: Expression): KvProbeScore =
    copy(child = c)
  override def prettyName: String = "kv_probe"
}

object KvProbe {
  def column(key: Column, ref: KvScorerRef): Column =
    GraftColumnBridge.column(KvProbeScore(GraftColumnBridge.expression(key), ref))
}
