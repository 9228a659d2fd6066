package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfQ101 {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.EngineConf.configure(
        SparkSession.builder().master("local[32]"), 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.1")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val sh = docs.select(explode(graft.dedup.Dedup.shingles(col("text"), 5)).as("item"))
    time("explode only")(sh.write.format("noop").mode("overwrite").save())
    time("naive groupBy topk")(sh.groupBy("item").count()
      .orderBy(col("count").desc, col("item")).limit(10).write.format("noop").mode("overwrite").save())
    time("sketchTopK m=25")(graft.operators.SketchTopK.topK(sh, "item", 10, 25)
      .write.format("noop").mode("overwrite").save())
    time("sketchTopK m=4096")(graft.operators.SketchTopK.topK(sh, "item", 10, 4096)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
