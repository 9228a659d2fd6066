package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.QueryDef
import graft.QueryDef.sql
import graft.core.Tables

/** Relational core: scans, filters, joins, aggregations, windows, set ops,
  * sorts/limits — the generalized query surface of SURVEY.md §2.1–§2.7 over
  * the driver's star schema.
  *
  * Scale notes are attached per query; the common themes:
  *  - filters/projections sit directly on the parquet scan (pushdown+pruning);
  *  - dimension joins are explicitly `broadcast(...)` — at 100 TB the fact
  *    table never shuffles for a dim join;
  *  - fact-fact joins shuffle on their equi-keys and AQE picks the final
  *    partitioning at runtime.
  */
object RelationalQueries {

  def all: Seq[QueryDef] = Seq(
    q01PricingSummary, q02FilterPushdown, q03JoinTopkRevenue,
    q04BroadcastDimJoin, q05SemiJoin, q06AntiJoin, q07OuterJoinAgg,
    q08WindowTopk, q09WindowLagMs, q10Percentile, q11DistinctCounts,
    q12SetOps, q13RunningSum, q14ConditionalAgg, q15Rollup, q62Sketches,
    q99SketchBounds, q134KmvDistinct, q136HllRegisters, q137OrderStats,
    q245KmvSetops)

  /** TPC-H Q1-style pricing summary (SURVEY §2.4 ops 20,25; §2.2 op 9-11).
    * Scale: map-side partial aggregation → tiny shuffle (6 groups). */
  val q01PricingSummary: QueryDef = sql(
    "q01_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |       round(sum(l_quantity), 2) AS sum_qty,
      |       round(sum(l_extendedprice), 2) AS sum_base_price,
      |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |       round(avg(l_quantity), 4) AS avg_qty,
      |       round(avg(l_extendedprice), 4) AS avg_price,
      |       count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("2001-09-01 00:00:00").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        oround(sum(col("l_quantity")), 2).as("sum_qty"),
        oround(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        oround(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        oround(avg(col("l_quantity")), 4).as("avg_qty"),
        oround(avg(col("l_extendedprice")), 4).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Filter + projection; predicate and column pruning reach the parquet scan
    * (`PushedFilters`, `ReadSchema` — SURVEY §4). */
  val q02FilterPushdown: QueryDef = sql(
    "q02_filter_pushdown",
    """SELECT l_orderkey, l_partkey, l_linenumber,
      |       round(l_extendedprice * (1 - l_discount), 2) AS net_price
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00' AND l_discount > 0.05
      |ORDER BY l_orderkey, l_partkey, l_linenumber""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("2000-01-01 00:00:00").cast("timestamp")
        && col("l_discount") > 0.05)
      .select(col("l_orderkey"), col("l_partkey"), col("l_linenumber"),
        oround(col("l_extendedprice") * (lit(1) - col("l_discount")), 2).as("net_price"))
      .orderBy(col("l_orderkey"), col("l_partkey"), col("l_linenumber"))
  }

  /** TPC-H Q3-style revenue top-k: dim-filtered fact-fact join + agg + top-k.
    * Scale: customer filter broadcast; orders⋈lineitem shuffles on orderkey;
    * top-10 via ordered limit (TakeOrderedAndProject — no full sort). */
  val q03JoinTopkRevenue: QueryDef = sql(
    "q03_join_topk_revenue",
    """SELECT o_orderkey, o_orderdate,
      |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |              JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |GROUP BY o_orderkey, o_orderdate
      |ORDER BY revenue DESC, o_orderkey
      |LIMIT 10""".stripMargin) { (s, d) =>
    Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(oround(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** Snowflake dim join, explicitly broadcast (SURVEY §2.3 op 18). */
  val q04BroadcastDimJoin: QueryDef = sql(
    "q04_broadcast_dim_join",
    """SELECT r_name, n_name, count(*) AS n_cust,
      |       round(avg(c_acctbal), 4) AS avg_bal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |              JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"), oround(avg(col("c_acctbal")), 4).as("avg_bal"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** Left-semi join (EXISTS). */
  val q05SemiJoin: QueryDef = sql(
    "q05_semi_join",
    """SELECT o_orderkey, o_totalprice
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
    val l = Tables.lineitem(s, d).filter(col("l_quantity") >= 49)
    o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  /** Left-anti join (NOT EXISTS). Predicate: customers with no
    * finished (status-F) order — chosen over the bare "no order at all"
    * anti-join because that set is EMPTY at sf ≤ 0.01 (every generated
    * customer has an order), and a hash gate over zero rows proves
    * nothing about the join (VERDICT r13 item 5). This set is non-empty
    * at all three SFs (5 / 71 / 511 rows), so the gate exercises real
    * anti-join semantics everywhere. */
  val q06AntiJoin: QueryDef = sql(
    "q06_anti_join",
    """SELECT c_custkey, c_name
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** Left-outer join + null-aware aggregation. */
  val q07OuterJoinAgg: QueryDef = sql(
    "q07_outer_join_agg",
    """SELECT c_custkey, count(o_orderkey) AS n_orders,
      |       round(coalesce(sum(o_totalprice), 0), 2) AS total_spent
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"),
        oround(coalesce(sum(col("o_totalprice")), lit(0)), 2).as("total_spent"))
      .orderBy(col("c_custkey"))
  }

  /** Top-k per group via row_number (SURVEY §2.5 op 31 / §2.6 op 35). */
  val q08WindowTopk: QueryDef = sql(
    "q08_window_topk",
    """SELECT o_custkey, o_orderkey, o_totalprice, rn
      |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
      |             row_number() OVER (PARTITION BY o_custkey
      |                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |      FROM orders)
      |WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** LAG over ordered per-key rows + epoch-millis gap (SURVEY §2.5 op 29,
    * §2.8 op 46). Integer millis on both sides → exact compare. */
  val q09WindowLagMs: QueryDef = sql(
    "q09_window_lag_ms",
    """SELECT o_custkey, o_orderkey,
      |       epoch_ms(o_orderdate) - lag(epoch_ms(o_orderdate))
      |         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS gap_ms
      |FROM orders
      |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        (epochMs(col("o_orderdate")) - lag(epochMs(col("o_orderdate")), 1).over(w)).as("gap_ms"))
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
      .drop("o_orderdate")
  }

  /** Exact percentile with linear interpolation — Spark `percentile` ≡
    * DuckDB/Postgres `percentile_cont` (SURVEY §2.4 op 22). */
  val q10Percentile: QueryDef = sql(
    "q10_percentile",
    """SELECT l_returnflag,
      |       round(CAST(percentile_cont(0.1) WITHIN GROUP (ORDER BY l_quantity) AS DOUBLE), 4) AS p10_qty,
      |       round(CAST(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity) AS DOUBLE), 4) AS p50_qty,
      |       round(CAST(percentile_cont(0.9) WITHIN GROUP (ORDER BY l_extendedprice) AS DOUBLE), 4) AS p90_price
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        oround(expr("percentile(l_quantity, 0.1)"), 4).as("p10_qty"),
        oround(expr("percentile(l_quantity, 0.5)"), 4).as("p50_qty"),
        oround(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90_price"))
      .orderBy(col("l_returnflag"))
  }

  /** Exact distinct counts (dedup-by-key building block, SURVEY §2.4 op 26). */
  val q11DistinctCounts: QueryDef = sql(
    "q11_distinct_counts",
    """SELECT count(DISTINCT l_partkey) AS n_parts,
      |       count(DISTINCT l_suppkey) AS n_supps,
      |       count(DISTINCT l_orderkey) AS n_orders
      |FROM lineitem""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_orderkey")).as("n_orders"))
  }

  /** Set op: INTERSECT (distinct) — SURVEY §2.7. */
  val q12SetOps: QueryDef = sql(
    "q12_setops",
    """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |INTERSECT
      |SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 100000
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    val a = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val b = Tables.orders(s, d).filter(col("o_totalprice") > 100000)
      .select(col("o_custkey").as("c_custkey"))
    a.intersect(b).orderBy(col("c_custkey"))
  }

  /** Running sum over a fully-specified window order — identical accumulation
    * order on both engines → identical doubles (SURVEY §2.5). */
  val q13RunningSum: QueryDef = sql(
    "q13_running_sum",
    """SELECT l_suppkey, l_orderkey, l_linenumber,
      |       round(sum(l_extendedprice) OVER (PARTITION BY l_suppkey
      |             ORDER BY l_shipdate, l_orderkey, l_linenumber, l_extendedprice
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_rev
      |FROM lineitem
      |ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber, l_extendedprice""".stripMargin) { (s, d) =>
    // l_extendedprice tiebreak: (l_orderkey, l_linenumber) is NOT unique in
    // the synthetic data (sf0.1 has a pair equal on all three sort keys with
    // different prices) -- the window order must be total or the engines
    // accumulate in different orders
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.lineitem(s, d)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_shipdate"),
        col("l_extendedprice"),
        oround(sum(col("l_extendedprice")).over(w), 2).as("running_rev"))
      .orderBy(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"),
        col("l_linenumber"), col("l_extendedprice"))
      .drop("l_shipdate", "l_extendedprice")
  }

  /** Conditional aggregation (TPC-H Q14-style promo share). */
  val q14ConditionalAgg: QueryDef = sql(
    "q14_conditional_agg",
    """SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
      |                             THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
      |             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_share
      |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin) { (s, d) =>
    val net = col("l_extendedprice") * (lit(1) - col("l_discount"))
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
      .agg(oround(lit(100.0) * sum(when(col("p_type") === "PROMO", net).otherwise(lit(0)))
        / sum(net), 4).as("promo_share"))
  }

  /** ROLLUP grouping sets (subtotals + grand total). */
  val q15Rollup: QueryDef = sql(
    "q15_rollup",
    """SELECT r_name, n_name, count(*) AS n_cust, round(sum(c_acctbal), 2) AS total_bal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |              JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP(r_name, n_name)
      |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"), oround(sum(col("c_acctbal")), 2).as("total_bal"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
  }

  /** Sketch / approximate aggregates, bounds-flag oracle since round 10
    * (previously rows-only: raw HLL/KLL estimates are engine-pinned and can
    * never hash-match an exact engine, but their error BOUNDS can — the q99
    * mechanism, applied here to q62's own surface: p10/p50/p90 percentile
    * sketches and the three cardinality sketches). Exact counterparts ride
    * along as hash-checked columns; each `*_within` flag asserts
    * |estimate − exact| inside the documented bound (HLL++ rsd 0.05 → 25%
    * = 5σ, wide enough that near-boundary estimator drift in a future
    * Spark/datagen cannot fail the hash compare on an accuracy fluke
    * (ADVICE r10) while a broken sketch still trips it; approx_percentile accuracy 10000 → rank error ≪ the bracketing
    * exact-percentile window), and DuckDB replays the exact side pinning
    * every flag at 1.
    * Scale: sketches are THE 100 TB cardinality/quantile answer — fixed
    * memory, one pass, mergeable partials; the same per-distinct-key
    * sub-aggregate split as q99 (no 4-way Expand shuffle). */
  val q62Sketches: QueryDef = sql(
    "q62_sketches",
    """SELECT count(DISTINCT l_partkey) AS n_parts,
      |       count(DISTINCT l_suppkey) AS n_supps,
      |       count(DISTINCT l_orderkey) AS n_orders,
      |       1 AS parts_within, 1 AS supps_within, 1 AS orders_within,
      |       1 AS p10_within, 1 AS p50_within, 1 AS p90_within
      |FROM lineitem""".stripMargin) { (s, d) =>
    val li = Tables.lineitem(s, d)
    def within(est: org.apache.spark.sql.Column, exact: org.apache.spark.sql.Column) =
      (abs(est - exact) <= exact * 0.25).cast("int")
    val parts = li.agg(countDistinct(col("l_partkey")).as("n_parts"),
      approx_count_distinct(col("l_partkey")).as("ap"))
    val supps = li.agg(countDistinct(col("l_suppkey")).as("n_supps"),
      approx_count_distinct(col("l_suppkey")).as("asup"))
    val orders = li.agg(countDistinct(col("l_orderkey")).as("n_orders"),
      expr("hll_sketch_estimate(hll_sketch_agg(l_orderkey))").as("ao"))
    val quant = li.agg(
      expr("percentile(l_quantity, array(0.02, 0.1, 0.18, 0.4, 0.5, 0.6, 0.82, 0.9, 0.98))").as("ps"),
      expr("approx_percentile(l_quantity, array(0.1, 0.5, 0.9))").as("aps"))
    parts.crossJoin(supps).crossJoin(orders).crossJoin(quant)
      .select(
        col("n_parts"), col("n_supps"), col("n_orders"),
        within(col("ap"), col("n_parts")).as("parts_within"),
        within(col("asup"), col("n_supps")).as("supps_within"),
        within(col("ao"), col("n_orders")).as("orders_within"),
        element_at(col("aps"), 1)
          .between(element_at(col("ps"), 1), element_at(col("ps"), 3))
          .cast("int").as("p10_within"),
        element_at(col("aps"), 2)
          .between(element_at(col("ps"), 4), element_at(col("ps"), 6))
          .cast("int").as("p50_within"),
        element_at(col("aps"), 3)
          .between(element_at(col("ps"), 7), element_at(col("ps"), 9))
          .cast("int").as("p90_within"))
  }

  /** q62's oracle companion (VERDICT r6 item 3): sketch ESTIMATES can't
    * hash-match an exact engine, but their error BOUNDS can — each
    * `*_within` flag asserts |estimate − exact| inside the bound Spark
    * documents for the sketch (HLL++ rsd 0.05 → 25% = 5σ; approx_percentile
    * accuracy 10000 → rank error ≪ the ±p10 value window), computed
    * Spark-side against Spark's own EXACT aggregates, while DuckDB replays
    * the exact aggregates and pins every flag at 1. A sketch breaking its
    * bound (or drifting exact parity) hash-mismatches here. One row, no
    * ORDER BY needed (q11 precedent).
    *
    * Scale: this is the pattern for validating sketches at 100 TB — run the
    * exact side once on a sample/sf, assert the bound, then trust the
    * fixed-memory sketch on the full data.
    *
    * Plan shape: one agg holding THREE count-distincts (+ sketches) plans
    * as a 5-way Expand — every input row duplicated per distinct group
    * through the shuffle (11s at sf0.1). Instead each distinct key gets its
    * own single-distinct sub-aggregate (a clean two-phase plan over ONE
    * pruned column) and the four 1-row results cross-join back — 4 cheap
    * column scans beat one 5× -volume Expand shuffle at any scale. */
  val q99SketchBounds: QueryDef = sql(
    "q99_sketch_bounds",
    """SELECT count(DISTINCT l_partkey) AS n_parts,
      |       count(DISTINCT l_suppkey) AS n_supps,
      |       count(DISTINCT l_orderkey) AS n_orders,
      |       round(quantile_cont(l_quantity, 0.5), 6) AS qty_p50,
      |       1 AS parts_within, 1 AS supps_within, 1 AS orders_within,
      |       1 AS p25_within, 1 AS p50_within, 1 AS p75_within
      |FROM lineitem""".stripMargin) { (s, d) =>
    val li = Tables.lineitem(s, d)
    def within(est: org.apache.spark.sql.Column, exact: org.apache.spark.sql.Column) =
      (abs(est - exact) <= exact * 0.25).cast("int")
    val parts = li.agg(countDistinct(col("l_partkey")).as("n_parts"),
      approx_count_distinct(col("l_partkey")).as("ap"))
    val supps = li.agg(countDistinct(col("l_suppkey")).as("n_supps"),
      approx_count_distinct(col("l_suppkey")).as("asup"))
    val orders = li.agg(countDistinct(col("l_orderkey")).as("n_orders"),
      expr("hll_sketch_estimate(hll_sketch_agg(l_orderkey))").as("ao"))
    val quant = li.agg(
      expr("percentile(l_quantity, array(0.15, 0.25, 0.35, 0.4, 0.5, 0.6, 0.65, 0.75, 0.85))").as("ps"),
      expr("approx_percentile(l_quantity, array(0.25, 0.5, 0.75))").as("aps"))
    parts.crossJoin(supps).crossJoin(orders).crossJoin(quant)
      .select(
        col("n_parts"), col("n_supps"), col("n_orders"),
        oround(element_at(col("ps"), 5), 6).as("qty_p50"),
        within(col("ap"), col("n_parts")).as("parts_within"),
        within(col("asup"), col("n_supps")).as("supps_within"),
        within(col("ao"), col("n_orders")).as("orders_within"),
        element_at(col("aps"), 1)
          .between(element_at(col("ps"), 1), element_at(col("ps"), 3))
          .cast("int").as("p25_within"),
        element_at(col("aps"), 2)
          .between(element_at(col("ps"), 4), element_at(col("ps"), 6))
          .cast("int").as("p50_within"),
        element_at(col("aps"), 3)
          .between(element_at(col("ps"), 7), element_at(col("ps"), 9))
          .cast("int").as("p75_within"))
  }

  /** KMV distinct sketch, ESTIMATE oracle-checked (the deterministic
    * counterpart to q62's engine-pinned HLL): per-event-type distinct-user
    * estimate from the k = 64 smallest shared 48-bit md5 hashes —
    * `operators.KmvSketch`'s thresholded two-pass keeps the shuffle at
    * O(groups·k) rows while producing the EXACT k-th minimum, so DuckDB
    * replays the whole estimator (hash, k-th min, (k−1)·2^48 DIV h(k))
    * bit-for-bit; the exact count rides along and the oracle pins the
    * |est−exact| ≤ exact/2 bound at 1 (q99's bound-flag pattern, ~4σ for
    * k = 64). Integer arithmetic end to end — no float in either plan. */
  val q134KmvDistinct: QueryDef = sql(
    "q134_kmv_distinct",
    """WITH h AS (
      |  SELECT DISTINCT event_type,
      |         ('0x' || substr(md5(CAST(user_id AS VARCHAR) || '|kmv-v1'), 1, 12))::BIGINT AS h
      |  FROM events),
      |r AS (
      |  SELECT event_type, h,
      |         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn,
      |         count(*) OVER (PARTITION BY event_type) AS nd
      |  FROM h),
      |kth AS (
      |  SELECT event_type, h AS kth_min,
      |         CASE WHEN nd < 64 THEN nd
      |              ELSE 17732923532771328 // h END AS est_users
      |  FROM r
      |  WHERE rn = CASE WHEN nd < 64 THEN nd ELSE 64 END),
      |e AS (SELECT event_type, count(DISTINCT user_id) AS n_users
      |      FROM events GROUP BY event_type)
      |SELECT e.event_type, kth.kth_min, kth.est_users, e.n_users,
      |       1 AS within_bound
      |FROM e JOIN kth USING (event_type)
      |ORDER BY event_type""".stripMargin) { (s, d) =>
    import graft.operators.KmvSketch
    val ev = Tables.events(s, d)
    val est = KmvSketch.estimateDistinct(ev, "event_type", "user_id", 64)
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"))
    est.join(exact, "event_type")
      .select(col("event_type"), col("kth_min"),
        col("est_distinct").as("est_users"), col("n_users"),
        (abs(col("est_distinct") - col("n_users")) * 2 <= col("n_users"))
          .cast("int").as("within_bound"))
      .orderBy(col("event_type"))
  }

  /** KMV SET-OPERATION estimates — `KmvSketch.setOpsEstimate`, the
    * Theta-sketch composition (Beyer et al. SIGMOD 2007) over q134's
    * deterministic md5 sketches: union cardinality, Jaccard, and
    * INTERSECTION estimated for (click-audience × each other event
    * type) from two 64-element artifacts — the audience-overlap /
    * join-size answer a planner wants BEFORE committing to a 100 TB
    * join, next to the exact values so the estimate-vs-truth gap is
    * hash-pinned data. The oracle replays both sketch builds, the
    * combined k-min cut, the θ-membership matches, and every estimator
    * division; exact counts come from the semi-join recompute. The
    * combined-min-set-IS-the-union-sketch law and the small-set
    * exactness boundary are pinned in KmvSketchSpec. */
  val q245KmvSetops: QueryDef = sql(
    "q245_kmv_setops",
    """WITH ah AS (
      |  SELECT DISTINCT
      |         ('0x' || substr(md5(CAST(user_id AS VARCHAR) || '|kmv-v1'),
      |                         1, 12))::BIGINT AS h
      |  FROM events WHERE event_type = 'click'),
      |am AS (SELECT h FROM ah ORDER BY h LIMIT 64),
      |bh AS (
      |  SELECT DISTINCT event_type,
      |         ('0x' || substr(md5(CAST(user_id AS VARCHAR) || '|kmv-v1'),
      |                         1, 12))::BIGINT AS h
      |  FROM events WHERE event_type <> 'click'),
      |bm AS (SELECT event_type, h FROM (
      |         SELECT event_type, h,
      |                row_number() OVER (PARTITION BY event_type
      |                                   ORDER BY h) AS rn
      |         FROM bh) WHERE rn <= 64),
      |cu AS (SELECT b.event_type, a.h
      |       FROM (SELECT DISTINCT event_type FROM bm) b CROSS JOIN am a
      |       UNION
      |       SELECT event_type, h FROM bm),
      |u AS (SELECT event_type, h FROM (
      |        SELECT event_type, h,
      |               row_number() OVER (PARTITION BY event_type
      |                                  ORDER BY h) AS rn
      |        FROM cu) WHERE rn <= 64),
      |st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_u,
      |              CAST(max(h) AS BIGINT) AS kth_min
      |       FROM u GROUP BY event_type),
      |mt AS (SELECT u.event_type, CAST(count(*) AS BIGINT) AS matches
      |       FROM u JOIN am ON am.h = u.h
      |              JOIN bm ON bm.event_type = u.event_type AND bm.h = u.h
      |       GROUP BY u.event_type),
      |es AS (SELECT st.event_type, st.n_u, st.kth_min,
      |              coalesce(mt.matches, 0) AS matches,
      |              CASE WHEN st.n_u < 64 THEN st.n_u
      |                   ELSE 17732923532771328 // st.kth_min END AS union_est
      |       FROM st LEFT JOIN mt ON mt.event_type = st.event_type),
      |fe AS (SELECT event_type, n_u, kth_min, matches,
      |              CAST(union_est AS BIGINT) AS union_est,
      |              CAST((matches * 1000000) // n_u AS BIGINT) AS jac_est_ppm,
      |              CAST((matches * union_est) // n_u AS BIGINT) AS inter_est
      |       FROM es),
      |na AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_a
      |       FROM events WHERE event_type = 'click'),
      |nb AS (SELECT event_type,
      |              CAST(count(DISTINCT user_id) AS BIGINT) AS n_b
      |       FROM events WHERE event_type <> 'click' GROUP BY event_type),
      |ni AS (SELECT event_type,
      |              CAST(count(DISTINCT user_id) AS BIGINT) AS n_inter_exact
      |       FROM events WHERE event_type <> 'click'
      |         AND user_id IN (SELECT user_id FROM events
      |                         WHERE event_type = 'click')
      |       GROUP BY event_type)
      |SELECT fe.event_type, n_u, kth_min, matches, union_est, jac_est_ppm,
      |       inter_est,
      |       CAST(n_a + n_b - n_inter_exact AS BIGINT) AS n_union_exact,
      |       n_inter_exact,
      |       CAST((n_inter_exact * 1000000)
      |            // (n_a + n_b - n_inter_exact) AS BIGINT) AS jac_exact_ppm
      |FROM fe JOIN nb USING (event_type) JOIN ni USING (event_type)
      |CROSS JOIN na
      |ORDER BY fe.event_type""".stripMargin) { (s, d) =>
    import graft.operators.KmvSketch
    val ev = Tables.events(s, d).select(col("event_type"), col("user_id"))
    val clickUsers = ev.filter(col("event_type") === "click")
    val aSk = KmvSketch.sketch(clickUsers.withColumn("g", lit(1L)), "g",
      "user_id", 64)
    val bSk = KmvSketch.sketch(ev.filter(col("event_type") =!= "click"),
      "event_type", "user_id", 64)
    // one 64-element click sketch fanned onto the 4 comparison groups —
    // a broadcast 1-row × 4-row product (the adjudicated scalar shape)
    val aF = bSk.select(col("event_type"))
      .crossJoin(broadcast(aSk.select(col("mins"))))
    val ops = KmvSketch.setOpsEstimate(aF, bSk, "event_type", 64)
    val aU = clickUsers.select(col("user_id")).distinct()
    val nA = aU.agg(count(lit(1)).as("n_a"))
    val nB = ev.filter(col("event_type") =!= "click")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_b"))
    val nI = ev.filter(col("event_type") =!= "click")
      .join(aU, Seq("user_id"), "left_semi")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_inter_exact"))
    ops.join(nB, "event_type").join(nI, "event_type")
      .crossJoin(broadcast(nA))
      .select(col("event_type"), col("n_u"), col("kth_min"), col("matches"),
        col("union_est"), col("jac_est_ppm"), col("inter_est"),
        (col("n_a") + col("n_b") - col("n_inter_exact")).as("n_union_exact"),
        col("n_inter_exact"),
        expr("(n_inter_exact * 1000000) div (n_a + n_b - n_inter_exact)")
          .as("jac_exact_ppm"))
      .orderBy(col("event_type"))
  }

  /** HyperLogLog register table, oracle-replayed (q62's `approx_count_
    * distinct` registers are engine-pinned; these are the textbook FFGM
    * registers over the shared 48-bit md5 hash, so DuckDB recomputes every
    * register AND the raw estimate bit-for-bit — see
    * [[graft.operators.HllSketch]] for the integer leading-zero trick
    * (`len(bin(x))`) and the dyadic-sum determinism argument).
    *
    * Scale: one pass, no distinct shuffle — registers are a partial-
    * aggregatable max, shuffle rows ≤ groups × 64; per-shard register
    * tables merge by the same max (HllSketchSpec pins the merge law). */
  val q136HllRegisters: QueryDef = sql(
    "q136_hll_registers",
    """WITH h AS (
      |  SELECT event_type,
      |         ('0x' || substr(md5(CAST(user_id AS VARCHAR) || '|hll-v1'), 1, 12))::BIGINT AS h
      |  FROM events),
      |r AS (
      |  SELECT event_type, h // 4398046511104 AS reg,
      |         CASE WHEN h % 4398046511104 = 0 THEN CAST(43 AS BIGINT)
      |              ELSE 43 - length(bin(h % 4398046511104)) END AS rho
      |  FROM h),
      |m AS (
      |  SELECT event_type, reg, CAST(max(rho) AS BIGINT) AS max_rho
      |  FROM r GROUP BY event_type, reg),
      |e AS (
      |  SELECT event_type, sum(power(2.0, -max_rho)) AS s,
      |         count(*) AS nreg
      |  FROM m GROUP BY event_type),
      |est AS (
      |  SELECT event_type,
      |         CAST(floor(0.709 * 4096.0 / (s + (64 - nreg))) AS BIGINT) AS raw_est,
      |         CAST(64 - nreg AS BIGINT) AS n_empty
      |  FROM e)
      |SELECT m.event_type, m.reg, m.max_rho, est.raw_est, est.n_empty
      |FROM m JOIN est USING (event_type)
      |ORDER BY event_type, reg""".stripMargin) { (s, d) =>
    import graft.operators.HllSketch
    val regs = HllSketch.registers(Tables.events(s, d), "event_type", "user_id")
    regs.join(broadcast(HllSketch.rawEstimate(regs, "event_type")), "event_type")
      .select(col("event_type"), col("reg"), col("max_rho"),
        col("raw_est"), col("n_empty"))
      .orderBy(col("event_type"), col("reg"))
  }

  /** Whole-table EXACT order statistics without a global sort — p50/p90/p99
    * of `o_totalprice` by histogram-locate + bucket-local top-k
    * ([[graft.operators.IterativeQuantile]]): the quantile path that still
    * works when the column has 10^11 rows and `ORDER BY` doesn't. Ranks use
    * pure integer math (`(p_ppm·n + 999999) div 10^6`) so no engine
    * `ceil(0.9·n)` float boundary can shift k, and the emitted value is an
    * existing data value (no arithmetic) — bit-exact against DuckDB's
    * row_number replay. */
  val q137OrderStats: QueryDef = sql(
    "q137_order_stats",
    """WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM orders),
      |ks AS (
      |  SELECT CAST(p_ppm AS BIGINT) AS p_ppm,
      |         (p_ppm * n + 999999) // 1000000 AS k
      |  FROM (VALUES (500000), (900000), (990000)) v(p_ppm), n),
      |o AS (
      |  SELECT o_totalprice AS v,
      |         row_number() OVER (ORDER BY o_totalprice) AS rn
      |  FROM orders)
      |SELECT ks.p_ppm, ks.k, o.v AS value
      |FROM ks JOIN o ON o.rn = ks.k
      |ORDER BY p_ppm""".stripMargin) { (s, d) =>
    import graft.operators.IterativeQuantile
    val orders = Tables.orders(s, d)
    val n = orders.count()
    val pk = Seq(500000L, 900000L, 990000L)
      .map(p => p -> ((p * n + 999999L) / 1000000L))
    import s.implicits._
    // distinct ranks: on tiny tables two percentiles can share a k, and a
    // duplicated k in orderStatistics' output would fan the join out past
    // the oracle's one-row-per-p_ppm shape
    IterativeQuantile.orderStatistics(orders, "o_totalprice",
        pk.map(_._2).distinct)
      .join(broadcast(pk.toDF("p_ppm", "k")), "k")
      .select(col("p_ppm"), col("k"), col("value"))
      .orderBy(col("p_ppm"))
  }
}
