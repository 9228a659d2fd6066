package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time individual declared queries exactly like Bench does
  * (noop write, cache cleared between runs). Args: sfDir query [query...]
  * — each query may repeat to observe warm-vs-cold. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    // Guard against `runMain TimeQuery q01` silently treating the query
    // name as the data dir and timing nothing: the first arg must be a
    // directory that exists.
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    require(new java.io.File(sfDir).isDirectory,
      s"first arg must be an existing sf data dir, got '$sfDir' — usage: TimeQuery <sfDir> <query> [query...]")
    val names = args.drop(1)
    require(names.nonEmpty, "usage: TimeQuery <sfDir> <query> [query...]")
    val spark = graft.core.EngineConf.configure(
        SparkSession.builder().master("local[32]"), 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // count Spark jobs per query: every job is a driver scheduling
    // round-trip, so job count is the fixed-overhead (and stall-surface)
    // multiplier of a query independent of data volume
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })
    names.foreach { name =>
      jobs.set(0)
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"[time] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s  ${jobs.get()}%3d jobs")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
