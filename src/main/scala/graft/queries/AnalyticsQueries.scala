package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse-analytics surface beyond the reference's operator list:
  * pivot/unpivot reshaping, multi-level grouping (CUBE + grouping_id),
  * distribution windows (ntile / percent_rank / cume_dist), fuzzy
  * dimension matching (edit distance), and collocation mining (PMI-style
  * lift). Each query keeps the engine-exact emission rules (integer
  * counts, single fixed-order double chains, total-order tie-breaks) so
  * the DuckDB oracle matches bitwise.
  */
object AnalyticsQueries {
  type Q = (SparkSession, String) => DataFrame

  /** The pivoted event-type set, pinned so the output schema is static
    * (never derived from a distinct scan — at 100 TB a dynamic pivot is
    * an extra full pass AND a nondeterministic schema). */
  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** Collocation min support: keeps the candidate set tiny at every SF
    * while the top-k cares only about the head anyway. */
  private val MinSupport = 3

  val defs: Map[String, Q] = Map(
    // P8 — pivot (long → wide): per-user event-type counts as fixed
    // columns. One groupBy shuffle on user_id with map-side partials;
    // the pivot itself is a projection over conditional aggregates, so
    // adding pivoted columns never adds passes. Missing combinations
    // surface as NULL from Spark's pivot-count; filled to 0 to match
    // the relational FILTER form (and any sane consumer's expectation).
    "p8_pivot" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy("user_id")
        .pivot("event_type", EventTypes)
        .agg(count(lit(1)))
        .na.fill(0L, EventTypes)),

    // P9 — unpivot (wide → long): three measure columns of lineitem
    // melted to (measure, val) rows via the stack generator — a
    // row-local expansion (zero shuffle, 3× row count), the schema-
    // normalization step before generic per-measure pipelines.
    "p9_unpivot" -> ((s, d) =>
      Tables.lineitem(s, d).selectExpr(
        "l_orderkey", "l_linenumber",
        "stack(3, 'quantity', l_quantity, 'discount', l_discount, 'tax', l_tax) AS (measure, val)")),

    // A17 — CUBE + grouping_id: all four aggregation levels of
    // (returnflag, linestatus) in ONE pass (Spark expands the grouping
    // sets before the shuffle, so partial aggregation still applies);
    // gid disambiguates "NULL because rolled up" from a data NULL —
    // the reporting-cube contract. Sum of integer-valued quantities is
    // exact in double (< 2^53), same convention as a12_rollup.
    "a17_grouping_sets" -> ((s, d) =>
      Tables.lineitem(s, d)
        .cube("l_returnflag", "l_linestatus")
        .agg(grouping_id().as("gid"), count(lit(1)).as("cnt"),
          sum("l_quantity").as("sum_qty"))),

    // W6 — distribution windows: quartile (ntile), percent_rank and
    // cume_dist per returnflag over a TOTAL order (quantity + unique
    // key tie-break), so ranks are deterministic and the ratio outputs
    // — (rank-1)/(n-1) and rank/n, one integer division each — are
    // bitwise-identical across engines. 3 partitions here is the demo
    // shape (same note as w1): at scale the partition key is whatever
    // the analysis groups by; per-partition sort is the inherent cost.
    "w6_ntile" -> ((s, d) => {
      val w = Window.partitionBy("l_returnflag")
        .orderBy("l_quantity", "l_orderkey", "l_linenumber")
      Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
    }),

    // J13 — fuzzy dimension match (the typo-normalization join):
    // every customer's corrupted segment label (deterministic one-char
    // deletion at position custkey % len — a pure row function, so
    // retries and the oracle reproduce it) is matched to the clean
    // 5-value segment dimension by MINIMUM edit distance. The dim is
    // broadcast (5 rows) and each row evaluates |dim| levenshtein
    // calls — linear in the fact side, never pairwise across facts,
    // which is the only fuzzy-join shape that survives 100 TB (for
    // fuzzy FACT-fact matching, block first — the LSH/minhash family
    // above). min_by on (dist, seg) pins ties.
    "j13_fuzzy_join" -> ((s, d) => {
      val cust = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"))
        .withColumn("pos", (col("c_custkey") % length(col("c_mktsegment"))).cast("int"))
        .withColumn("dirty", expr(
          "concat(substr(c_mktsegment, 1, pos), substr(c_mktsegment, pos + 2))"))
      val segs = Tables.customer(s, d)
        .select(col("c_mktsegment").as("seg")).distinct()
      cust.crossJoin(broadcast(segs))
        .select(col("c_custkey"), col("dirty"), col("seg"),
          levenshtein(col("dirty"), col("seg")).cast("long").as("dist"))
        .groupBy("c_custkey", "dirty")
        .agg(min_by(struct(col("seg"), col("dist")),
          struct(col("dist"), col("seg"))).as("m"))
        .select(col("c_custkey"), col("dirty"),
          col("m.seg").as("matched"), col("m.dist").as("dist"))
        .filter(col("dist") <= 2)
    }),

    // Collocation mining — PMI-style lift over ADJACENT token bigrams:
    // bigrams come from zipping each token list with its own tail
    // (row-local slice+zip+explode, zero shuffle, no positional
    // self-join), counts aggregate map-side, and the lift
    //   (p(ab)/ (p(a)·p(b))) = (n_ab/N_bi) / ((n_a/N_tok)·(n_b/N_tok))
    // is emitted as one fixed-order double chain (each step an
    // exactly-rounded IEEE op, so both engines agree bitwise; ln-PMI
    // would differ in the last ulp — ratio form on purpose, same
    // reasoning as BM25's Robertson idf). Unigram side is vocabulary-
    // sized → broadcast joins; totals are 1-row cross joins (j6
    // shape). Top-50 by (lift desc, a, b) — a total order.
    "t_pmi_collocations" -> ((s, d) => {
      val toks = Tables.documents(s, d).select(split(col("text"), " ").as("lst"))
      val uni = toks.select(explode(col("lst")).as("t"))
        .groupBy("t").agg(count(lit(1)).as("n"))
      val bi = toks.select(
          expr("slice(lst, 1, size(lst) - 1)").as("la"),
          expr("slice(lst, 2, size(lst) - 1)").as("lb"))
        .select(explode(arrays_zip(col("la"), col("lb"))).as("z"))
        .select(col("z.la").as("a"), col("z.lb").as("b"))
      val nab = bi.groupBy("a", "b").agg(count(lit(1)).as("n_ab"))
        .filter(col("n_ab") >= MinSupport)
      val ntt = uni.agg(sum("n").as("n_tok"))
      val nbt = bi.agg(count(lit(1)).as("n_bi"))
      nab
        .join(broadcast(uni.select(col("t").as("a"), col("n").as("n_a"))), "a")
        .join(broadcast(uni.select(col("t").as("b"), col("n").as("n_b"))), "b")
        .crossJoin(broadcast(ntt)).crossJoin(broadcast(nbt))
        .select(col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"),
          (((col("n_ab").cast("double") / col("n_bi"))
            / (col("n_a").cast("double") / col("n_tok")))
            / (col("n_b").cast("double") / col("n_tok"))).as("lift"))
        .orderBy(col("lift").desc, col("a"), col("b"))
        .limit(50)
    })
  )

  val oracle: Map[String, String] = Map(
    "p8_pivot" -> {
      val cols = EventTypes.map(t =>
        s"count(*) FILTER (event_type = '$t') AS $t").mkString(",\n  ")
      s"""SELECT user_id,
         |  $cols
         |FROM events GROUP BY user_id""".stripMargin
    },
    "p9_unpivot" ->
      """SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS val FROM lineitem
        |UNION ALL SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
        |UNION ALL SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem""".stripMargin,
    "a17_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  GROUPING(l_returnflag, l_linestatus) AS gid,
        |  count(*) AS cnt, sum(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,
    "w6_ntile" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag,
        |  ntile(4) OVER w AS quartile,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_returnflag
        |             ORDER BY l_quantity, l_orderkey, l_linenumber)""".stripMargin,
    "j13_fuzzy_join" ->
      """WITH c AS (SELECT c_custkey, c_mktsegment,
        |    CAST(c_custkey % length(c_mktsegment) AS INT) AS pos
        |  FROM customer),
        |dirty AS (SELECT c_custkey,
        |    concat(substr(c_mktsegment, 1, pos), substr(c_mktsegment, pos + 2)) AS dirty
        |  FROM c),
        |segs AS (SELECT DISTINCT c_mktsegment AS seg FROM customer),
        |scored AS (SELECT c_custkey, dirty, seg,
        |    levenshtein(dirty, seg)::BIGINT AS dist
        |  FROM dirty CROSS JOIN segs)
        |SELECT c_custkey, dirty, seg AS matched, dist FROM (
        |  SELECT *, row_number() OVER (PARTITION BY c_custkey, dirty
        |                               ORDER BY dist, seg) AS rn
        |  FROM scored)
        |WHERE rn = 1 AND dist <= 2""".stripMargin,
    "t_pmi_collocations" ->
      s"""WITH toks AS (SELECT string_split(text, ' ') AS lst FROM documents),
         |uni AS (SELECT t, count(*) AS n
         |        FROM (SELECT unnest(lst) AS t FROM toks) GROUP BY t),
         |ntt AS (SELECT sum(n)::BIGINT AS n_tok FROM uni),
         |bi AS (SELECT z[1] AS a, z[2] AS b FROM (
         |  SELECT unnest(list_zip(lst[1:len(lst) - 1], lst[2:len(lst)])) AS z
         |  FROM toks)),
         |nab AS (SELECT a, b, count(*) AS n_ab FROM bi
         |        GROUP BY a, b HAVING count(*) >= $MinSupport),
         |nbt AS (SELECT count(*)::BIGINT AS n_bi FROM bi)
         |SELECT a, b, n_ab, ua.n AS n_a, ub.n AS n_b,
         |  ((CAST(n_ab AS DOUBLE) / n_bi)
         |   / (CAST(ua.n AS DOUBLE) / n_tok))
         |  / (CAST(ub.n AS DOUBLE) / n_tok) AS lift
         |FROM nab
         |JOIN uni ua ON nab.a = ua.t
         |JOIN uni ub ON nab.b = ub.t
         |CROSS JOIN nbt CROSS JOIN ntt
         |ORDER BY lift DESC, a, b LIMIT 50""".stripMargin
  )
}
