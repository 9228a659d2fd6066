package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfQ99 {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.EngineConf.configure(
        SparkSession.builder().master("local[32]"), 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = graft.core.Tables.lineitem(spark, "/root/testdata/sf0.1")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame) =
      df.write.format("noop").mode("overwrite").save()
    time("warmup count")(li.count())
    time("3x countDistinct one agg")(noop(li.agg(
      countDistinct(col("l_partkey")), countDistinct(col("l_suppkey")), countDistinct(col("l_orderkey")))))
    time("1x countDistinct")(noop(li.agg(countDistinct(col("l_partkey")))))
    time("percentile x9")(noop(li.agg(expr("percentile(l_quantity, array(0.15,0.25,0.35,0.4,0.5,0.6,0.65,0.75,0.85))"))))
    time("approx trio")(noop(li.agg(
      approx_count_distinct(col("l_partkey")), approx_count_distinct(col("l_suppkey")),
      expr("hll_sketch_estimate(hll_sketch_agg(l_orderkey))"),
      expr("approx_percentile(l_quantity, array(0.25,0.5,0.75))"))))
    time("q99 current full")(noop(graft.SparkEntry.queries("q99_sketch_bounds")(spark, "/root/testdata/sf0.1")))
    spark.stop()
  }
}
