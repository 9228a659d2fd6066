package graft.cluster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Neighborhood-preservation measurement for per-group dimensionality
  * reductions — the layout-quality statistic shared by the q93/q102
  * bounds oracles (PipelineQueries.clusterBounds) and the floor-evidence
  * tool (tools/MeasureUmapPreservation), kept in ONE place so the pinned
  * floor and the measured evidence can never drift apart. */
object LayoutQuality {

  /** Per-group k-NN preservation counts over a frame carrying
    * (`user_id`, `interest`, `embedding`, `reduced`): for every point,
    * its k nearest neighbors by raw cosine vs by reduced cosine (ties
    * broken by item id, rank computed per engine only — no cross-engine
    * float boundary).
    *
    * @return (user_id, inter, denom): Σ|kNN_raw ∩ kNN_red| and Σ|kNN_raw|
    *         in exact integer counts. Groups with a single point emit no
    *         row (no neighbors to preserve). */
  def preservation(labeled: DataFrame, k: Int): DataFrame = {
    import graft.functions.cosine_similarity
    val a = labeled.select(col("user_id"), col("interest").as("item"),
      col("embedding").as("e_a"), col("reduced").as("r_a"))
    val b = labeled.select(col("user_id"), col("interest").as("other"),
      col("embedding").as("e_b"), col("reduced").as("r_b"))
    val pairs = a.join(b, Seq("user_id"))
      .filter(col("item") =!= col("other"))
      .select(col("user_id"), col("item"), col("other"),
        (lit(1.0) - cosine_similarity(col("e_a"), col("e_b"))).as("d_raw"),
        (lit(1.0) - cosine_similarity(col("r_a"), col("r_b"))).as("d_red"))
    val wRaw = Window.partitionBy(col("user_id"), col("item"))
      .orderBy(col("d_raw"), col("other"))
    val wRed = Window.partitionBy(col("user_id"), col("item"))
      .orderBy(col("d_red"), col("other"))
    pairs
      .withColumn("rk_raw", row_number().over(wRaw))
      .withColumn("rk_red", row_number().over(wRed))
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("rk_raw") <= k && col("rk_red") <= k, 1L)
          .otherwise(0L)).as("inter"),
        sum(when(col("rk_raw") <= k, 1L).otherwise(0L)).as("denom"))
  }
}
