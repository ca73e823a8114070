package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled multinomial-Naive-Bayes text classifier — the 6th zoo
  * member's serve half (reference model list:
  * /root/reference/experiments/standalone_experiments.py:10-17 covers
  * tabular models; NB is the text-side analog a corpus pipeline
  * actually deploys for cheap lang/quality routing). One instance per
  * fitted MLlib NaiveBayesModel: the fitted log-priors and
  * log-conditionals embed in the plan as a reference object, the doc
  * tokenizes ONCE per row, counts accumulate over the fitted
  * vocabulary via a hash probe, and each class score folds in VOCAB
  * ORDER with the intercept added LAST — exactly the left-associated
  * chain [[graft.queries.SqlGen.linearExact]] emits, so the DuckDB
  * oracle reproduces every score bitwise (zero-count terms contribute
  * ±0.0, which is an exact additive identity here, so the kernel may
  * skip them). Argmax takes the FIRST maximum — MLlib's
  * Vectors.argmax rule.
  */
final class NbRef(
    val vocab: Array[String],
    val logTheta: Array[Array[Double]], // class-major: logTheta(c)(i)
    val logPi: Array[Double],
    val labels: Array[String]) extends Serializable {
  require(logTheta.length == logPi.length && logPi.length == labels.length,
    "NbRef: class count mismatch between theta/pi/labels")
  require(logTheta.forall(_.length == vocab.length),
    "NbRef: theta width != vocabulary size")

  @transient private lazy val index: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](vocab.length * 2)
    var i = 0
    while (i < vocab.length) { m.put(vocab(i), Integer.valueOf(i)); i += 1 }
    m
  }

  def predict(text: UTF8String): UTF8String = {
    val toks = text.toString.split(" ", -1)
    val counts = new Array[Int](vocab.length)
    var t = 0
    while (t < toks.length) {
      val idx = index.get(toks(t))
      if (idx != null) counts(idx.intValue()) += 1
      t += 1
    }
    var best = 0
    var bestScore = Double.NegativeInfinity
    var c = 0
    while (c < logPi.length) {
      val th = logTheta(c)
      var s = 0.0
      var i = 0
      while (i < counts.length) {
        if (counts(i) != 0) s += counts(i).toDouble * th(i)
        i += 1
      }
      s += logPi(c)
      if (s > bestScore) { bestScore = s; best = c } // first max wins
      c += 1
    }
    UTF8String.fromString(labels(best))
  }
}

/** text -> predicted class label against the embedded [[NbRef]]. */
case class NbPredict(child: Expression, ref: NbRef) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nb_predict requires STRING, got ${child.dataType.sql}")
  override def nullSafeEval(s: Any): Any = ref.predict(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refName = ctx.addReferenceObj("nbRef", ref, classOf[NbRef].getName)
    defineCodeGen(ctx, ev, c => s"$refName.predict($c)")
  }
  override protected def withNewChildInternal(c: Expression): NbPredict = copy(child = c)
  override def prettyName: String = "nb_predict"
}

/** Shared fit/serve featurizer: per-doc token counts over a FIXED
  * vocabulary as array<long>, one tokenize + hash probe per row (the
  * fit assembles these into MLlib vectors; a HOF formulation would run
  * |vocab| interpreted filters per row). */
final class VocabCountsRef(val vocab: Array[String]) extends Serializable {
  @transient private lazy val index: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](vocab.length * 2)
    var i = 0
    while (i < vocab.length) { m.put(vocab(i), Integer.valueOf(i)); i += 1 }
    m
  }
  def counts(text: UTF8String): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val out = new Array[Long](vocab.length)
    var t = 0
    while (t < toks.length) {
      val idx = index.get(toks(t))
      if (idx != null) out(idx.intValue()) += 1L
      t += 1
    }
    new GenericArrayData(out)
  }
}

case class VocabCounts(child: Expression, ref: VocabCountsRef) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vocab_counts requires STRING, got ${child.dataType.sql}")
  override def nullSafeEval(s: Any): Any = ref.counts(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refName = ctx.addReferenceObj("vocabRef", ref, classOf[VocabCountsRef].getName)
    defineCodeGen(ctx, ev, c => s"$refName.counts($c)")
  }
  override protected def withNewChildInternal(c: Expression): VocabCounts = copy(child = c)
  override def prettyName: String = "vocab_counts"
}

object NaiveBayesServe {
  def predictColumn(text: Column, ref: NbRef): Column =
    GraftColumnBridge.column(NbPredict(GraftColumnBridge.expression(text), ref))
  def countsColumn(text: Column, ref: VocabCountsRef): Column =
    GraftColumnBridge.column(VocabCounts(GraftColumnBridge.expression(text), ref))
}
