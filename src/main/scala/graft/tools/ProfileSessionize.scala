package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.enrich.StubSessionsLLM
import graft.operators.{Chunker, Sessionize}

/** Dev tool: sub-stage timing of Sessionize at a given SF. */
object ProfileSessionize {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.EngineConf.configure(
        SparkSession.builder().master("local[32]"), 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val activity = graft.queries.PipelineQueries.activity(spark, sfDir)
    time("activity.count")(activity.count())
    time("activity.count2")(activity.count())
    val chunks = Chunker.chunks(activity, 15)
    time("chunks.count")(chunks.count())
    import spark.implicits._
    val llm = new StubSessionsLLM
    val responses = chunks.mapPartitions { it =>
      val batch = it.toVector
      if (batch.isEmpty) Iterator.empty
      else {
        val outs = llm.complete(batch.map(b => Sessionize.renderPrompt(b._4)))
        batch.iterator.zip(outs.iterator).map { case ((u, d, c, _), resp) => (u, d, c, resp) }
      }
    }.toDF("user_id", "date", "chunk_id", "response")
    time("responses.count")(responses.count())
    val full = Sessionize.sessions(activity, llm)
    time("sessions.count")(full.count())
    time("sessions.count2")(full.count())
    spark.stop()
  }
}
