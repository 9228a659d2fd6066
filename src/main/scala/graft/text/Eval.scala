package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier/ranker EVALUATION over integer scores — the measurement step
  * a curation pipeline runs after training a quality filter (q127/q153
  * produce scores; this answers "how well does the score separate the
  * classes?") before committing to a filtering threshold.
  *
  * AUC here is the exact Mann–Whitney U statistic: the probability that a
  * uniformly drawn positive outranks a uniformly drawn negative, ties
  * counting one half. Everything stays in integer arithmetic — scores are
  * required to be integral (the repo-wide ppm/ppb fixed-point discipline),
  * and the half-credit tie term is kept doubled (`u2 = 2·U`) so no
  * fraction ever materializes until the final ppm division.
  *
  * Reference behavioral analogue: the reference ranks/filter-scores
  * documents with model scores (assets/recent_history.py's quality and
  * similarity ranking stages); evaluating such a ranker against labels is
  * the standard published companion step (Hanley & McNeil 1982 — AUC via
  * rank sums), re-expressed as distributed aggregates.
  *
  * Scale shape (100 TB story): the corpus collapses FIRST to a
  * per-(group, score) histogram — one shuffle whose output cardinality is
  * bounded by |groups| × |distinct scores| (ppm scores ⇒ ≤ 10^6 per
  * group), never by row count. The pairwise U is then a running sum over
  * that histogram: a window per group over distinct scores. No pair of
  * documents is ever joined — U counts pairs without enumerating them.
  */
object Eval {

  /** Per-group exact AUC of an integral score column against a 0/1
    * positive flag.
    *
    * For each group g:
    * {{{
    *   u2(g)  = Σ_s pos(s) · (2·negBelow(s) + neg(s))        // 2·U, exact
    *   aucPpm = (10^6 · u2) div (2 · nPos · nNeg)            // truncating
    * }}}
    * where the sum runs over distinct score values s in ascending order.
    * Groups with no positives or no negatives keep `u2` but emit NULL
    * `auc_ppm` (undefined rather than silently 0 or 1).
    *
    * Output: one row per group —
    * `(group, n_pos, n_neg, u2, auc_ppm)`, all BIGINT.
    */
  def rankAucByGroup(df: DataFrame, groupCol: String, scoreCol: String,
      posCol: String): DataFrame = {
    val hist = df
      .groupBy(col(groupCol), col(scoreCol).cast("long").as("s"))
      .agg(
        sum(when(col(posCol) =!= 0, 1L).otherwise(0L)).as("pos_n"),
        sum(when(col(posCol) =!= 0, 0L).otherwise(1L)).as("neg_n"))
    // negBelow = negatives with strictly smaller score: running sum over
    // the ascending distinct-score order, shifted by the current bucket
    val w = Window.partitionBy(col(groupCol)).orderBy(col("s"))
    val withBelow = hist.withColumn("neg_below",
      coalesce(sum(col("neg_n")).over(w.rowsBetween(
        Window.unboundedPreceding, -1)), lit(0L)))
    withBelow
      .groupBy(col(groupCol))
      .agg(
        sum(col("pos_n")).as("n_pos"),
        sum(col("neg_n")).as("n_neg"),
        sum(col("pos_n") * (col("neg_below") * 2L + col("neg_n"))).as("u2"))
      .withColumn("auc_ppm",
        when(col("n_pos") > 0 && col("n_neg") > 0,
          expr("(u2 * 1000000) div (2 * n_pos * n_neg)"))
          .otherwise(lit(null).cast("long")))
      .select(col(groupCol), col("n_pos"), col("n_neg"), col("u2"),
        col("auc_ppm"))
  }

  /** Reliability diagram + expected calibration error over ppm
    * confidences — AUC's companion: AUC measures RANKING quality, ECE
    * measures whether the score's VALUE means what it claims
    * (Naeini et al. 2015's binned estimator). Equal-width confidence
    * buckets; per bucket the mean confidence vs the observed positive
    * rate, both in ppm.
    *
    * Integer-exactness trick: the standard
    * `ECE = Σ_b (n_b/N)·|acc_b − conf_b|` has the per-bucket n_b divide
    * out — `ECE_ppm = (Σ_b |acc_sum_b − conf_sum_b|) div N` on the raw
    * ppm SUMS, so nothing fractional ever materializes.
    *
    * Scale shape: one partial-aggregable groupBy onto ≤ `buckets` keys,
    * then a broadcast 1-row totals join (the q113 shape) — row count
    * never shuffles. */
  def calibration(df: DataFrame, confCol: String, posCol: String,
      buckets: Int = 10): DataFrame = {
    require(buckets >= 2, "need at least two buckets")
    val perBucket = df.select(
        least(lit(buckets - 1L),
          expr(s"(CAST($confCol AS BIGINT) * $buckets) div 1000000")).as("bucket"),
        col(confCol).cast("long").as("conf"),
        when(col(posCol) =!= 0, 1000000L).otherwise(0L).as("acc"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("conf")).as("conf_sum"),
        sum(col("acc")).as("acc_sum"))
    val totals = perBucket.agg(sum(col("n")).as("n_total"),
      sum(abs(col("conf_sum") - col("acc_sum"))).as("gap_total"))
    perBucket.crossJoin(broadcast(totals))
      .select(col("bucket"), col("n"),
        expr("conf_sum div n").as("conf_ppm"),
        expr("acc_sum div n").as("acc_ppm"),
        abs(col("conf_sum") - col("acc_sum")).as("gap_abs"),
        expr("gap_total div n_total").as("ece_ppm"))
  }
}
