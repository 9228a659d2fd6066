package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative DATA-QUALITY AUDIT — the Deequ shape (Schelter et al.,
  * VLDB 2018: "unit tests for data"): a rule set evaluated over a table
  * with SCAN SHARING as the design center — every row-level rule
  * (completeness, range/format compliance) becomes one conditional-sum
  * column inside a SINGLE aggregation pass, so auditing 40 rules over a
  * 100 TB table costs one scan, not forty; only set-level rules
  * (uniqueness, referential integrity) pay their own distinct/join,
  * because no row-local aggregate can answer them.
  *
  * Every metric lands on the ppm grid with a per-rule `min_ppm`
  * threshold and an integer pass flag — the gate a pipeline's
  * write-audit-publish step evaluates before promoting a batch
  * (ObservedMetrics is the always-on counter sibling; this is the
  * declarative rule engine). Deterministic end to end: counts and
  * truncating divisions only, so a SQL oracle replays every rule.
  */
object DataQuality {

  /** A row-level rule: fraction of rows satisfying `pred` (nulls fail —
    * Spark's `when` treats a NULL predicate as false, matching SQL's
    * CASE, so completeness is just `pred = col.isNotNull`). */
  final case class RowRule(name: String, pred: Column, minPpm: Long)

  /** All row-level rules in ONE pass: one conditional sum per rule in a
    * single aggregate, melted to (rule, n_rows, n_ok) rows. */
  def rowAudit(df: DataFrame, rules: Seq[RowRule]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    // names are spliced into a quoted stack() literal — restrict them so
    // a quote can neither break parsing nor inject expressions
    rules.foreach(r => require(r.name.matches("[A-Za-z0-9_.:/ -]+"),
      s"rule name '${r.name}' must match [A-Za-z0-9_.:/ -]+"))
    val aggs = count(lit(1)).as("__n") +:
      rules.zipWithIndex.map { case (r, i) =>
        sum(when(r.pred, 1L).otherwise(0L)).as(s"__ok_$i")
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = rules.zipWithIndex.map { case (r, i) =>
      s"'${r.name}', __ok_$i, ${r.minPpm}L"
    }.mkString(", ")
    one.select(col("__n"),
        expr(s"stack(${rules.size}, $stackArgs) AS (rule, n_ok, min_ppm)"))
      .select(col("rule"), col("__n").as("n_rows"), col("n_ok"),
        col("min_ppm"))
  }

  /** Set-level rule: `cols` form a unique key (n_ok = distinct count). */
  def uniqueness(df: DataFrame, name: String, cols: Seq[String],
      minPpm: Long): DataFrame =
    df.agg(count(lit(1)).as("n_rows"),
        countDistinct(cols.head, cols.tail: _*).as("n_ok"))
      .select(lit(name).as("rule"), col("n_rows"), col("n_ok"),
        lit(minPpm).as("min_ppm"))

  /** Set-level rule: `keyCol` values exist in `ref.refCol` (foreign-key
    * integrity; n_ok = rows whose key resolves — NULL keys do not). */
  def referential(df: DataFrame, keyCol: String, ref: DataFrame,
      refCol: String, name: String, minPpm: Long): DataFrame = {
    val keys = ref.select(col(refCol).as(keyCol)).distinct()
    df.select(col(keyCol)).join(keys, Seq(keyCol), "left_semi")
      .agg(count(lit(1)).as("n_ok"))
      .crossJoin(broadcast(df.agg(count(lit(1)).as("n_rows"))))
      .select(lit(name).as("rule"), col("n_rows"), col("n_ok"),
        lit(minPpm).as("min_ppm"))
  }

  /** Finish a union of rule frames: ppm metric + pass flag, rule order. */
  def report(metrics: DataFrame): DataFrame =
    metrics
      .withColumn("ok_ppm",
        when(col("n_rows") > 0, expr("(n_ok * 1000000) div n_rows"))
          .otherwise(lit(null).cast("long")))
      .withColumn("pass",
        (coalesce(col("ok_ppm"), lit(0L)) >= col("min_ppm")).cast("int"))
      .select(col("rule"), col("n_rows"), col("n_ok"), col("ok_ppm"),
        col("min_ppm"), col("pass"))
      .orderBy(col("rule"))
}
