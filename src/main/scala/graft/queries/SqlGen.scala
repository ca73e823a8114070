package graft.queries

/** DuckDB-oracle SQL generators kept in lockstep with the Spark-side
  * expression builders (graft.core.Binning / graft.models.*) — the
  * splits/coefficients/weights constants are shared, so both sides are
  * generated from ONE source of truth.
  */
object SqlGen {

  /** CASE-chain bin index — mirrors NumericBins.toColumn exactly
    * (first split strictly greater wins; NULL/overflow -> len). */
  def binCase(c: String, splits: Seq[Double]): String =
    if (splits.isEmpty) "0"
    else splits.zipWithIndex.map { case (s, i) => s"WHEN $c < $s THEN $i" }
      .mkString("(CASE ", " ", s" ELSE ${splits.length} END)")

  /** Compound key: '.'-joined bin indices (Keys.keyColumn). */
  def keyExpr(colsAndSplits: Seq[(String, Seq[Double])]): String =
    colsAndSplits.map { case (c, s) => binCase(c, s) }
      .mkString(" || '.' || ")

  /** Linear combination Σ w_i·term_i + b — mirrors LinearModel.linearExpr
    * including zero-coefficient pruning. */
  def linear(terms: Seq[String], coefs: Seq[Double], intercept: Double): String = {
    val ts = terms.zip(coefs).collect { case (t, w) if w != 0.0 => s"($t) * $w" }
    (if (ts.isEmpty) "0.0" else ts.mkString(" + ")) + s" + $intercept"
  }

  /** Overflow-clamped exp — mirrors Fns.crazyExp. */
  def crazyExp(x: String): String =
    s"(CASE WHEN ($x) < 0 THEN 0.0 WHEN ($x) < 700 THEN exp($x) ELSE exp(700) END)"

  /** Reference sigmoid 1/(1+crazy_exp(-z)) — mirrors Fns.sigmoidRef. */
  def sigmoidRef(z: String): String =
    s"(1.0 / (1.0 + ${crazyExp(s"-($z)")}))"

  def relu(z: String): String = s"greatest(0.0, $z)"
}
