package graft.models

import org.apache.spark.ml.tree.{CategoricalSplit, ContinuousSplit, InternalNode, LeafNode, Node}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Serve a FITTED MLlib decision tree as one fused projection — the
  * tree is constants at plan time, so prediction is a nested
  * CASE/`when` chain, zero shuffles, fully inside whole-stage codegen.
  * This is the reference's model-transpilation idea applied to trees
  * (src/transpiler.py transpiles fitted models into SQL expressions);
  * [[sql]] emits the DuckDB twin from the SAME recursion so the serve
  * path is oracle-checkable bit-for-bit: the only operations are
  * `<=` against exact-bits threshold literals and constant leaves —
  * no FP arithmetic to diverge between engines.
  *
  * MLlib split semantics (ml.tree.Node.predictImpl): a continuous
  * split goes LEFT iff feature(idx) <= threshold; a categorical
  * (nominal) split goes LEFT iff feature(idx) ∈ leftCategories. On
  * both engines a NULL/NaN feature fails the condition and routes
  * RIGHT (Spark `when` on a NULL condition takes `otherwise`; SQL
  * `NULL IN (...)` is NULL → ELSE), matching the compiled kernel's
  * coalesce-to-NaN path.
  */
object TreeServe {

  /** Fused prediction Column over raw feature columns (in the model's
    * feature-slot order). */
  def column(root: Node, features: Seq[Column]): Column = root match {
    case l: LeafNode => lit(l.prediction)
    case n: InternalNode =>
      val cond = n.split match {
        case c: ContinuousSplit =>
          features(c.featureIndex) <= lit(c.threshold)
        case c: CategoricalSplit =>
          features(c.featureIndex)
            .isin(c.leftCategories.sorted.map(v => v: Any): _*)
        case other => throw new IllegalArgumentException(
          s"TreeServe: unsupported split type $other")
      }
      when(cond, column(n.leftChild, features))
        .otherwise(column(n.rightChild, features))
  }

  /** DuckDB SQL for the same tree over feature SQL expressions —
    * thresholds/leaves/categories embedded as exact-bits '…'::DOUBLE
    * literals (bare decimals detour through DECIMAL and can mis-round
    * 1 ulp). */
  def sql(root: Node, featSql: Seq[String]): String = root match {
    case l: LeafNode => s"'${l.prediction}'::DOUBLE"
    case n: InternalNode =>
      val cond = n.split match {
        case c: ContinuousSplit =>
          s"${featSql(c.featureIndex)} <= '${c.threshold}'::DOUBLE"
        case c: CategoricalSplit =>
          val cs = c.leftCategories.sorted.map(v => s"'$v'::DOUBLE").mkString(", ")
          s"${featSql(c.featureIndex)} IN ($cs)"
        case other => throw new IllegalArgumentException(
          s"TreeServe: unsupported split type $other")
      }
      s"(CASE WHEN $cond " +
        s"THEN ${sql(n.leftChild, featSql)} ELSE ${sql(n.rightChild, featSql)} END)"
  }

  /** Node count — a size guard for oracle generation (a pathological
    * tree would bloat the dumped SQL). */
  def nodeCount(root: Node): Long = root match {
    case n: InternalNode => 1L + nodeCount(n.leftChild) + nodeCount(n.rightChild)
    case _ => 1L
  }
}
