package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-anonymous aggregate release with a generalization ladder — the
  * privacy gate a pipeline applies before publishing usage aggregates
  * derived from per-user data (the reference pipeline's per-user session
  * and interest tables are exactly the kind of source such a release
  * would summarize; cf. the per-user aggregation surfaces in
  * assets/recent_history.py).
  *
  * Semantics (Sweeney 2002's k-anonymity, ladder-released): the caller
  * supplies quasi-identifier LABELS from finest to coarsest. Level 0
  * cells whose release set holds ≥ k distinct users are released whole;
  * the remaining records regroup at level 1 over the REMAINDER ONLY, and
  * so on up the ladder. Counting on the remainder (not the full
  * population) is what makes the guarantee a theorem: every released row
  * aggregates ≥ k distinct users of the rows it actually covers, so no
  * released cell can be differenced against finer releases to isolate a
  * sub-k group. Records failing every rung are emitted as a suppression
  * audit row per coarsest label — event counts only, user counts masked
  * to NULL (a suppressed cell must not disclose its population).
  *
  * Scale shape: one aggregate + one anti-join per rung over a remainder
  * that only shrinks — ladder depth is a small constant, so the whole
  * release is O(depth) shuffles of (label, user) pairs and never joins
  * fact-to-fact. Distinct users per cell uses exact partial aggregation
  * (count-distinct over the grouped key), not a sketch: a privacy
  * threshold compared against an ESTIMATE would be unsound.
  */
object Anonymize {

  /** Release `df` under the k-anonymity ladder.
    *
    * @param ladder quasi-identifier label expressions, finest FIRST; each
    *               must be a non-null string column.
    * @return `(level, qi, n_events, n_users, suppressed)` — `level` is the
    *         rung index (ladder.length for the suppression audit rows),
    *         `n_users` NULL iff suppressed.
    */
  def kAnonymizeLadder(df: DataFrame, userCol: String, k: Int,
      ladder: Seq[org.apache.spark.sql.Column]): DataFrame = {
    require(k >= 2, s"k-anonymity needs k >= 2; got $k")
    require(ladder.nonEmpty, "empty generalization ladder")
    var remainder = df
    var released: Option[DataFrame] = None
    ladder.zipWithIndex.foreach { case (qi, level) =>
      val cells = remainder
        .groupBy(qi.as("qi"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col(userCol)).as("n_users"))
      val pass = cells.filter(col("n_users") >= k)
        .select(lit(level).as("level"), col("qi"),
          col("n_events"), col("n_users"),
          lit(0).as("suppressed"))
      released = Some(released.map(_.unionAll(pass)).getOrElse(pass))
      remainder = remainder.join(
        pass.select(col("qi").as("__pass_qi")),
        qi === col("__pass_qi"), "left_anti")
    }
    val audit = remainder
      .groupBy(ladder.last.as("qi"))
      .agg(count(lit(1)).as("n_events"))
      .select(lit(ladder.length).as("level"), col("qi"),
        col("n_events"), lit(null).cast("long").as("n_users"),
        lit(1).as("suppressed"))
    released.get.unionAll(audit)
  }
}
