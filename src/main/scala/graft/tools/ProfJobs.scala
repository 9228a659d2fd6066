package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import scala.collection.concurrent.TrieMap

/** Dev tool: run a declared query and print EVERY Spark job with its
  * wall duration and call site — the fixed-cost attribution view the
  * q223/q224 shave needs (NEXT round-15 backlog item 2: "the residual is
  * per-action driver overhead (114/57 jobs)"). TimeQuery tells you a
  * query costs N jobs; this tells you which actions those jobs are.
  *
  * Args: sfDir query [query...]. */
object ProfJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    require(new java.io.File(sfDir).isDirectory,
      s"first arg must be an existing sf data dir, got '$sfDir'")
    val names = args.drop(1)
    require(names.nonEmpty, "usage: ProfJobs <sfDir> <query> [query...]")
    val spark = graft.core.EngineConf.configure(
        SparkSession.builder().master("local[32]"), 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = TrieMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = js.stageInfos.lastOption.map(_.name).getOrElse("?")
          .linesIterator.next()
        starts.put(js.jobId, (System.nanoTime(), site)): Unit
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        starts.remove(je.jobId).foreach { case (t0, site) =>
          done.add((je.jobId, (System.nanoTime() - t0) / 1e9, site)): Unit
        }
    })
    names.zipWithIndex.foreach { case (name, i) =>
      done.clear()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      import scala.jdk.CollectionConverters._
      val rows = done.asScala.toSeq.sortBy(_._1)
      println(f"== $name run#$i total $sec%.2f s, ${rows.size} jobs ==")
      rows.foreach { case (id, s, site) => println(f"  job $id%4d $s%7.3f s  $site") }
      val bySite = rows.groupBy(_._3).view
        .mapValues(r => (r.size, r.map(_._2).sum)).toSeq.sortBy(-_._2._2)
      println("  -- by call site --")
      bySite.foreach { case (site, (n, s)) => println(f"  $s%7.2f s  $n%3d jobs  $site") }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
