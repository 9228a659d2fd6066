package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every declared query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":...,"queries":{...}}.
  *
  * Queries are forced through a `noop`-format write — a plain `.count()`
  * lets Catalyst prune every column the count doesn't need (a minhash
  * query "ran" 18× faster because the signatures were never computed).
  * noop materializes the full result with zero sink I/O, so the numbers
  * are the real operator cost. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.EngineConf.configure(
        SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JVM/codegen/parquet-footer costs don't land on the
    // alphabetically-first query
    try SparkEntry.queries.headOption.foreach(_._2(spark, sfDir)
      .write.format("noop").mode("overwrite").save())
    catch { case _: Throwable => }
    spark.catalog.clearCache()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
        }
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache() // no cross-query cache reuse in timings
      (name, sec, ok)
    }
    // A failed query must not make the bench look faster: it is recorded as
    // -1 in `queries`, listed in `failed`, and excluded from the total.
    val qs = results.map { case (k, v, ok) => "\"" + k + "\":" + (if (ok) v else -1) }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}"""
    // Belt and braces for the driver's parser: the JSON goes to stdout as
    // the last line (sbt epilogue suppressed via showSuccess := false in
    // build.sbt) AND to a file, so a stdout-parsing failure is recoverable.
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_OUT.json"))
    java.nio.file.Files.write(out, json.getBytes("UTF-8"))
    spark.stop()
    println(json)
  }
}
