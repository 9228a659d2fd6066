package graft.cluster

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Farthest-point traversal (Gonzalez 1985 k-center seeding — the
  * 2-approximation for metric k-center, and the standard deterministic
  * alternative to k-means++ sampling) in pure integer fixed point, the
  * q154 training discipline applied to SEEDING: k-means++ draws randoms,
  * but the farthest-point rule is a pure function of the data, so the
  * whole traversal is exactly replayable across engines.
  *
  *   - vectors quantized once to the 1e-6 grid (the KmeansPpm convention);
  *   - center 0 = the smallest id (deterministic anchor);
  *   - center t = argmax over points of min squared-L2 distance to the
  *     chosen set, ties toward the smaller id;
  *   - the final coverage radius max_v min_c d²(v, c) — the quantity the
  *     2-approximation guarantee bounds — is emitted alongside.
  *
  * Scale shape: the min-distance frame `md(vid)` stays DISTRIBUTED and
  * is updated incrementally — each round joins the corpus against ONE
  * broadcast center (dims rows) and takes a `least`, never recomputing
  * distances to the whole chosen set (O(k·N·d) total work, k barriers);
  * driver state is one (vid, d²) row per round plus the dims-row center
  * vector. Caches are swapped per round and released in finally.
  */
object KCenter {

  /** Run the k-round traversal over `df(idCol, vecCol)`. Returns
    * (center_no, vec_id, sel_d2, radius_d2): the selection order, each
    * selected point's min-distance-to-predecessors at selection time
    * (0 for the anchor), and the final coverage radius replicated on
    * every row. */
  def farthestPoints(df: DataFrame, idCol: String, vecCol: String,
      k: Int = 4): DataFrame = {
    require(k >= 2, s"need at least 2 centers, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val qx = df.select(col(idCol).cast("long").as("vid"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("j", "e")))
      .select(col("vid"), col("j").cast("long").as("j"),
        graft.functions.fixed_point(col("e"), 1e6).as("x"))
      .cache()
    val caches = scala.collection.mutable.ArrayBuffer[DataFrame](qx)
    try {
      def centerVec(vid: Long): DataFrame =
        qx.filter(col("vid") === vid).select(col("j"), col("x").as("cx"))
      def distTo(vid: Long): DataFrame =
        qx.join(broadcast(centerVec(vid)), "j")
          .groupBy(col("vid"))
          .agg(sum((col("x") - col("cx")) * (col("x") - col("cx"))).as("d"))
      val first = qx.agg(min(col("vid"))).as[Long].head()
      var md = distTo(first).withColumnRenamed("d", "md").cache()
      caches += md
      var sel = Vector((0L, first, 0L))
      for (t <- 1 until k) {
        // one (vid, d²) row visits the driver per round
        val Array(bestVid, bestD) = md.orderBy(col("md").desc, col("vid"))
          .limit(1).as[(Long, Long)].head() match {
            case (v, d2) => Array(v, d2)
          }
        sel = sel :+ ((t.toLong, bestVid, bestD))
        val next = md.join(distTo(bestVid), "vid")
          .select(col("vid"), least(col("md"), col("d")).as("md")).cache()
        caches += next
        md = next
      }
      val radius = md.agg(max(col("md"))).as[Long].head()
      sel.map { case (t, v, d2) => (t, v, d2, radius) }
        .toDF("center_no", "vec_id", "sel_d2", "radius_d2")
        .orderBy(col("center_no"))
    } finally caches.foreach(_.unpersist())
  }
}
