package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust per-group outlier statistics — median / MAD (median absolute
  * deviation) instead of mean / stddev, the estimator family that
  * survives the exact heavy-tailed value distributions (a handful of
  * enormous values) that make z-scores useless for anomaly gating.
  *
  * Definitions are pinned to the LOWER median (the value at ascending
  * rank `(n+1) div 2`) on an integer value grid, so both engines select
  * the identical element — no interpolation, no float averaging of the
  * middle pair. Outlier rule: `dev > k·MAD` (Hampel's rule at k = 3
  * by default), all integer compares.
  *
  * Scale shape: two ranking windows per group (values, then absolute
  * deviations) + one aggregate — the same per-group-window shape as
  * q137's order statistics; for a group too large to window, q137's
  * histogram-locate iterative quantile substitutes for the rank step
  * with identical lower-median semantics. */
object RobustStats {

  /** Per-group robust summary over an INTEGRAL value column:
    * `(group, n, med_i, mad_i, n_out, out_id, out_dev)` — count, lower
    * median, MAD, Hampel outlier count at `k`, and the argmax-deviation
    * member (ties toward the smaller id). */
  def madSummary(df: DataFrame, groupCol: String, idCol: String,
      valueCol: String, k: Int = 3): DataFrame = {
    val g = col(groupCol)
    val base = df.select(g, col(idCol).cast("long").as("__id"),
      col(valueCol).cast("long").as("__v"))
    val w = Window.partitionBy(g)
    val ranked = base
      .withColumn("__rn", row_number().over(w.orderBy(col("__v"), col("__id"))))
      .withColumn("__n", count(lit(1)).over(w))
    val med = ranked.filter(col("__rn") === expr("(__n + 1) div 2"))
      .select(g, col("__v").as("__med"))
    val dev = base.join(med, groupCol)
      .withColumn("__dev", abs(col("__v") - col("__med")))
    val ranked2 = dev
      .withColumn("__rn2", row_number().over(w.orderBy(col("__dev"), col("__id"))))
      .withColumn("__n", count(lit(1)).over(w))
    val mad = ranked2.filter(col("__rn2") === expr("(__n + 1) div 2"))
      .select(g, col("__dev").as("__mad"))
    dev.join(mad, groupCol)
      .groupBy(g)
      .agg(
        count(lit(1)).as("n"),
        min(col("__med")).as("med_i"),
        min(col("__mad")).as("mad_i"),
        sum(when(col("__dev") > lit(k.toLong) * col("__mad"), 1L)
          .otherwise(0L)).as("n_out"),
        max(struct(col("__dev").as("d"), (-col("__id")).as("ni"))).as("__top"))
      .select(g, col("n"), col("med_i"), col("mad_i"), col("n_out"),
        (-col("__top.ni")).as("out_id"), col("__top.d").as("out_dev"))
  }
}
