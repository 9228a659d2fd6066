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
    // multiplier of a query independent of data volume. Attribution is by
    // job group (unique per invocation), not a reset-between-queries
    // counter — listener events arrive asynchronously, so a counter reset
    // races with in-flight onJobStart deliveries.
    val jobsByGroup = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val g = Option(js.properties).map(_.getProperty("spark.jobGroup.id")).orNull
        if (g != null) { jobsByGroup.merge(g, 1, (a, b) => a + b); () }
      }
    })
    names.zipWithIndex.foreach { case (name, i) =>
      val group = s"$name#$i"
      spark.sparkContext.setJobGroup(group, s"time $name")
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.clearJobGroup()
      Thread.sleep(200) // let the async listener bus drain before reading
      println(f"[time] $name%-28s $sec%.2f s  ${Option(jobsByGroup.get(group)).fold(0)(_.intValue)}%3d jobs")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
