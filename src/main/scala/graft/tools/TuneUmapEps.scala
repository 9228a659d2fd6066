package graft.tools

import graft.cluster.{LocalCluster, LocalUmap}
import org.apache.spark.sql.functions.col

/** Dev tool: sweep the q93 ε-cut threshold over UMAP-reduced sf0.01
  * embeddings (one JVM, one reduction per group, all thresholds reuse it).
  * `runMain graft.tools.TuneUmapEps <sfDir>` */
object TuneUmapEps {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.EngineConf.configure(
        org.apache.spark.sql.SparkSession.builder().master("local[8]"), 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rows = graft.core.Tables.embeddings(spark, args(0))
      .select(col("label"), col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Float](2).toArray))
    val byGroup = rows.groupBy(_._1).toSeq.sortBy(_._1)
    val reduced = byGroup.map { case (g, rs) =>
      val sorted = rs.sortBy(_._2)
      g -> LocalUmap.reduce(sorted.map(_._3), 8).map(_.map(_.toFloat))
    }
    for (eps <- Seq(0.02, 0.05, 0.1, 0.15, 0.2, 0.25, 0.3, 0.35, 0.45)) {
      val stats = reduced.map { case (g, vecs) =>
        val labels = LocalCluster.clusterVectors(vecs, eps, 5)
        val n = labels.count(_ >= 0)
        s"$g:${labels.filter(_ >= 0).distinct.length}c/${labels.count(_ == -1)}n"
      }
      println(f"eps=$eps%.2f  ${stats.mkString(" ")}")
    }
    spark.stop()
  }
}
