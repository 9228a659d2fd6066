package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.QueryDef.sql
import graft.core.Tables

/** Round-2 surface widening (NEXT.md backlog): UNPIVOT/stack, lateral
  * correlated subqueries, GROUPING SETS + grouping(), row-granularity MERGE
  * upsert, RANGE window frames, ordered-set/statistical aggregates, the
  * ranking-function family, regex scalar functions, edit-distance joins,
  * and date_trunc calendar rollups — every query DuckDB-oracle-checked.
  *
  * Dialect note: oracle SQL differs from the Spark text only where the two
  * dialects genuinely diverge (regexp_replace global flag, datediff arg
  * order); everything else is shared ANSI.
  */
object ExtendedQueries {

  def all: Seq[QueryDef] = Seq(
    q67Unpivot, q68LateralTopK, q69GroupingSets, q70VectorUpsert,
    q71RangeFrame, q72Stats, q73RankFamily, q74Regex,
    q75EditDistance, q76DateTrunc, q77GroupByAll, q78Exists, q80ListAgg,
    q81Recursive, q82MultisetOps, q87PartitionOverwrite)

  private def run(q: String)(s: SparkSession, d: String): DataFrame = {
    Tables.registerAll(s, d)
    s.sql(q)
  }

  /** UNPIVOT via the stack() generator (wide → long measure table).
    * Scale: stack is a Generate — no shuffle, streams through the scan. */
  val q67Unpivot: QueryDef = sql(
    "q67_unpivot",
    """SELECT l_orderkey, l_linenumber, measure, value FROM (
      |  SELECT l_orderkey, l_linenumber, 'qty' AS measure, l_quantity AS value
      |  FROM lineitem WHERE l_orderkey < 400
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, 'price', l_extendedprice
      |  FROM lineitem WHERE l_orderkey < 400
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, 'disc', l_discount
      |  FROM lineitem WHERE l_orderkey < 400
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, 'tax', l_tax
      |  FROM lineitem WHERE l_orderkey < 400)
      |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") < 400)
      .selectExpr("l_orderkey", "l_linenumber",
        "stack(4, 'qty', l_quantity, 'price', l_extendedprice, " +
          "'disc', l_discount, 'tax', l_tax) AS (measure, value)")
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("measure"))
  }

  private val q68Sql =
    """SELECT n_name, t.c_name, t.c_acctbal
      |FROM nation, LATERAL (
      |  SELECT c_name, c_acctbal FROM customer
      |  WHERE c_nationkey = n_nationkey
      |  ORDER BY c_acctbal DESC, c_name LIMIT 2) t
      |ORDER BY n_name, t.c_acctbal DESC, t.c_name""".stripMargin

  /** Correlated LATERAL subquery with per-row LIMIT (top-2 per nation) —
    * Catalyst decorrelates to a ranked join. */
  val q68LateralTopK: QueryDef = sql("q68_lateral_topk", q68Sql)(run(q68Sql))

  private val q69Sql =
    """SELECT o_orderstatus, o_orderpriority,
      |       grouping(o_orderstatus) AS g_status,
      |       grouping(o_orderpriority) AS g_prio,
      |       count(*) AS n,
      |       floor(sum(o_totalprice) * 100 + 0.5) / 100 AS total
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY g_status, g_prio,
      |         o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  /** Explicit GROUPING SETS with grouping() disambiguation (rollup/cube's
    * general form; one Expand, one aggregation). */
  val q69GroupingSets: QueryDef = sql("q69_grouping_sets", q69Sql)(run(q69Sql))

  /** Row-granularity MERGE upsert on the vector store (NEXT.md: beyond
    * partition overwrite): changed rows replace same-key rows, unmatched
    * change rows insert. Scale: one shuffle on the key — anti-join + union,
    * no driver round-trips. */
  val q70VectorUpsert: QueryDef = sql(
    "q70_vector_upsert",
    """WITH changes AS (
      |  SELECT vec_id, label + 100 AS label FROM embeddings WHERE vec_id % 7 = 0
      |  UNION ALL
      |  SELECT vec_id + 1000000, label + 5 FROM embeddings WHERE vec_id % 11 = 0),
      |merged AS (
      |  SELECT e.vec_id, e.label FROM embeddings e
      |  WHERE e.vec_id NOT IN (SELECT vec_id FROM changes)
      |  UNION ALL
      |  SELECT vec_id, label FROM changes)
      |SELECT vec_id, label FROM merged ORDER BY vec_id""".stripMargin) { (s, d) =>
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("label"))
    val updates = e.filter(pmod(col("vec_id"), lit(7)) === 0)
      .withColumn("label", col("label") + 100)
    val inserts = e.filter(pmod(col("vec_id"), lit(11)) === 0)
      .withColumn("vec_id", col("vec_id") + 1000000L)
      .withColumn("label", col("label") + 5)
    graft.sources.VectorStore
      .mergeUpsert(e, updates.unionByName(inserts), "vec_id")
      .select(col("vec_id"), col("label"))
      .orderBy(col("vec_id"))
  }

  /** RANGE window frame (value-based 30-day trailing sum/count — ties share
    * a frame, unlike ROWS). */
  val q71RangeFrame: QueryDef = QueryDef(
    "q71_range_frame",
    Some(() => """WITH t AS (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |         datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS days
      |  FROM orders WHERE o_custkey < 200)
      |SELECT o_custkey, o_orderkey, days,
      |       floor(sum(o_totalprice) OVER w * 100 + 0.5) / 100 AS sum_30d,
      |       count(*) OVER w AS n_30d
      |FROM t
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY days
      |             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, o_orderkey""".stripMargin),
    (s, d) => run(
      """WITH t AS (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         datediff(CAST(o_orderdate AS DATE), DATE '1992-01-01') AS days
        |  FROM orders WHERE o_custkey < 200)
        |SELECT o_custkey, o_orderkey, days,
        |       floor(sum(o_totalprice) OVER w * 100 + 0.5) / 100 AS sum_30d,
        |       count(*) OVER w AS n_30d
        |FROM t
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY days
        |             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin)(s, d))

  private val q72Sql =
    """SELECT l_returnflag,
      |       count(*) AS n,
      |       round(median(l_quantity), 4) AS med_qty,
      |       round(avg(l_quantity), 4) AS avg_qty,
      |       round(stddev_samp(l_quantity), 4) AS sd_qty,
      |       round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
      |       round(regr_slope(l_extendedprice, l_quantity), 4) AS slope
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** Statistical aggregate family (exact interpolated median, sample
    * stddev, correlation, regression slope). */
  val q72Stats: QueryDef = sql("q72_stats", q72Sql)(run(q72Sql))

  private val q73Sql =
    """SELECT o_custkey, o_orderkey,
      |       rank() OVER w AS rnk,
      |       dense_rank() OVER w AS drnk,
      |       round(percent_rank() OVER w, 6) AS prnk,
      |       round(cume_dist() OVER w, 6) AS cd,
      |       ntile(4) OVER w AS quartile
      |FROM orders WHERE o_custkey < 100
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Ranking-function family over a named window. */
  val q73RankFamily: QueryDef = sql("q73_rank_family", q73Sql)(run(q73Sql))

  /** Regex scalar functions. Oracle diverges only in DuckDB's explicit
    * global-replace flag (Spark regexp_replace is global by default). */
  val q74Regex: QueryDef = QueryDef(
    "q74_regex",
    Some(() => """SELECT p_partkey,
      |       regexp_extract(p_type, '(\w+)$', 1) AS last_word,
      |       regexp_replace(p_name, '[aeiou]', '', 'g') AS consonants,
      |       length(regexp_replace(p_name, '[^ ]', '', 'g')) + 1 AS n_words
      |FROM part
      |ORDER BY p_partkey""".stripMargin),
    (s, d) => run(
      """SELECT p_partkey,
        |       regexp_extract(p_type, '(\\w+)$', 1) AS last_word,
        |       regexp_replace(p_name, '[aeiou]', '') AS consonants,
        |       length(regexp_replace(p_name, '[^ ]', '')) + 1 AS n_words
        |FROM part
        |ORDER BY p_partkey""".stripMargin)(s, d))

  private val q75Sql =
    """SELECT a.t AS t_a, b.t AS t_b, levenshtein(a.t, b.t) AS dist
      |FROM (SELECT DISTINCT p_type AS t FROM part) a
      |JOIN (SELECT DISTINCT p_type AS t FROM part) b ON a.t < b.t
      |WHERE levenshtein(a.t, b.t) <= 6
      |ORDER BY t_a, t_b""".stripMargin

  /** Edit-distance self-join over the distinct type vocabulary (fuzzy-match
    * dedup building block; both engines implement classic Levenshtein).
    * Scale: distinct-first keeps the O(v²) comparison on the vocabulary
    * (150 values), never the row count. */
  val q75EditDistance: QueryDef = sql("q75_edit_distance", q75Sql)(run(q75Sql))

  private val q76Sql =
    """SELECT CAST(date_trunc('week', CAST(o_orderdate AS DATE)) AS DATE) AS wk,
      |       count(*) AS n,
      |       floor(sum(o_totalprice) * 100 + 0.5) / 100 AS total
      |FROM orders
      |GROUP BY wk
      |ORDER BY wk""".stripMargin

  /** Calendar rollup via date_trunc (ISO weeks start Monday in both
    * engines). */
  val q76DateTrunc: QueryDef = sql("q76_date_trunc", q76Sql)(run(q76Sql))

  private val q77Sql =
    """SELECT l_returnflag, l_linestatus, l_shipdate > TIMESTAMP '1995-01-01 00:00:00' AS recent,
      |       count(*) AS n, count(DISTINCT l_orderkey) AS n_orders
      |FROM lineitem
      |GROUP BY ALL
      |ORDER BY ALL""".stripMargin

  /** GROUP BY ALL / ORDER BY ALL inference (identical dialect extension in
    * both engines). */
  val q77GroupByAll: QueryDef = sql("q77_group_by_all", q77Sql)(run(q77Sql))

  private val q78Sql =
    """SELECT s_suppkey, s_name
      |FROM supplier
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_suppkey = s_suppkey AND l_quantity >= 45)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem
      |                  WHERE l_suppkey = s_suppkey
      |                    AND l_quantity >= 50 AND l_discount >= 0.1)
      |ORDER BY s_suppkey""".stripMargin

  /** Correlated EXISTS / NOT EXISTS (decorrelated to semi/anti joins). */
  val q78Exists: QueryDef = sql("q78_exists", q78Sql)(run(q78Sql))

  /** Ordered string aggregation — Spark `listagg … WITHIN GROUP`, DuckDB
    * `string_agg(… ORDER BY …)`. The order key (orderkey·100+linenumber)
    * is unique per group, so tie handling can't diverge. */
  val q80ListAgg: QueryDef = QueryDef(
    "q80_listagg",
    Some(() => """SELECT l_returnflag,
      |       string_agg(CAST(l_orderkey * 100 + l_linenumber AS VARCHAR), ','
      |                  ORDER BY l_orderkey * 100 + l_linenumber) AS line_ids
      |FROM lineitem
      |WHERE l_orderkey < 100
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin),
    (s, d) => run(
      """SELECT l_returnflag,
        |       listagg(CAST(l_orderkey * 100 + l_linenumber AS STRING), ',')
        |         WITHIN GROUP (ORDER BY l_orderkey * 100 + l_linenumber) AS line_ids
        |FROM lineitem
        |WHERE l_orderkey < 100
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin)(s, d))

  private[graft] val q81Sql =
    """WITH RECURSIVE ordered AS (
      |  SELECT o_custkey, o_orderkey,
      |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn
      |  FROM orders WHERE o_custkey < 60),
      |edges AS (
      |  SELECT a.o_custkey, a.o_orderkey AS src, b.o_orderkey AS dst
      |  FROM ordered a JOIN ordered b
      |    ON a.o_custkey = b.o_custkey AND b.rn = a.rn + 1),
      |walk(o_custkey, o_orderkey, depth) AS (
      |  SELECT o_custkey, o_orderkey, 1 AS depth FROM ordered WHERE rn = 1
      |  UNION ALL
      |  SELECT e.o_custkey, e.dst, w.depth + 1
      |  FROM walk w JOIN edges e
      |    ON e.o_custkey = w.o_custkey AND e.src = w.o_orderkey
      |  WHERE w.depth < 6)
      |SELECT o_custkey, o_orderkey, depth FROM walk
      |ORDER BY o_custkey, depth""".stripMargin

  /** Depth-capped per-customer order-chain walk. Round 8: the Spark side
    * moved from the recursive CTE (one join + one driver scheduling round
    * PER DEPTH STEP — 63 jobs with AQE stage materializations, the
    * worst-scheduling query in the round-7 audit) to POINTER DOUBLING
    * ([[graft.operators.PathDoubling]]): ⌈log₂ 6⌉ = 3 plan-construction
    * rounds, zero driver actions until the sink — one declarative plan.
    * The DuckDB oracle keeps the recursive-CTE formulation, so the hash
    * check is two INDEPENDENT algorithms agreeing; Spark's own WITH
    * RECURSIVE surface stays pinned against this output in
    * RecursiveSqlSpec. */
  val q81Recursive: QueryDef = sql("q81_recursive", q81Sql) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val ordered = Tables.orders(s, d)
      .filter(col("o_custkey") < 60)
      .select(col("o_custkey"), col("o_orderkey"),
        row_number().over(
          Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))).as("rn"))
    val edges = ordered.alias("a")
      .join(ordered.select(col("o_custkey").as("ck"), col("o_orderkey").as("nxt"),
          col("rn").as("rn2")).alias("b"),
        col("a.o_custkey") === col("b.ck") && col("b.rn2") === col("a.rn") + 1)
      .select(col("a.o_custkey").as("key"),
        col("a.o_orderkey").as("src"), col("b.nxt").as("dst"))
    val starts = ordered.filter(col("rn") === 1)
      .select(col("o_custkey").as("key"), col("o_orderkey").as("node"))
    graft.operators.PathDoubling.walk(starts, edges, maxDepth = 6)
      .select(col("key").as("o_custkey"), col("node").as("o_orderkey"),
        col("depth").cast("int").as("depth"))
      .orderBy(col("o_custkey"), col("depth"))
  }

  private val q82Sql =
    """WITH a AS (SELECT l_suppkey AS k FROM lineitem WHERE l_quantity >= 40),
      |     b AS (SELECT l_suppkey AS k FROM lineitem WHERE l_discount >= 0.05),
      |     i AS (SELECT k FROM a INTERSECT ALL SELECT k FROM b),
      |     e AS (SELECT k FROM a EXCEPT ALL SELECT k FROM b)
      |SELECT 'i' AS src, k, count(*) AS n FROM i GROUP BY k
      |UNION ALL
      |SELECT 'e' AS src, k, count(*) AS n FROM e GROUP BY k
      |ORDER BY src, k
      |LIMIT 400 OFFSET 50""".stripMargin

  /** Multiset set ops (INTERSECT ALL / EXCEPT ALL) + LIMIT/OFFSET paging
    * after a total order — q12 covers the distinct variants. */
  val q82MultisetOps: QueryDef = sql("q82_multiset_ops", q82Sql)(run(q82Sql))

  /** Dynamic partition-overwrite idempotency through a REAL write-read
    * cycle (SURVEY ops 7-8, the reference's per-user DELETE+COPY,
    * assets/recent_history.py:127-178): stage a store partitioned by user,
    * overwrite a subset of user partitions with replacement rows, read the
    * store back. The oracle replays the overwrite as set algebra — rows of
    * untouched users + the replacement rows — so the driver hash-checks
    * that overwrite touched EXACTLY the staged partitions. */
  val q87PartitionOverwrite: QueryDef = sql(
    "q87_partition_overwrite",
    """WITH base AS (
      |  SELECT 'u' || CAST(vec_id % 10 AS VARCHAR) AS user_id,
      |         vec_id AS id, label
      |  FROM embeddings),
      |repl AS (
      |  SELECT user_id, id, label + 1000 AS label FROM base
      |  WHERE user_id IN ('u0', 'u1') AND id < 250)
      |SELECT user_id, id, label FROM base WHERE user_id NOT IN ('u0', 'u1')
      |UNION ALL
      |SELECT user_id, id, label FROM repl
      |ORDER BY user_id, id""".stripMargin) { (s, d) =>
    val base = Tables.embeddings(s, d).select(
      concat(lit("u"), pmod(col("vec_id"), lit(10))).as("user_id"),
      col("vec_id").as("id"), col("label"))
    val path = java.nio.file.Files
      .createTempDirectory("vstore_q87").toString + "/store"
    val store = new graft.sources.VectorStore(s, path)
    store.upsertUsers(base)
    store.upsertUsers(base
      .filter(col("user_id").isin("u0", "u1") && col("id") < 250)
      .withColumn("label", col("label") + 1000))
    store.load().select(col("user_id"), col("id"), col("label"))
      .orderBy(col("user_id"), col("id"))
  }
}
