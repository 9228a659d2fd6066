package graft.tools

import org.apache.spark.sql.SparkSession
import graft.enrich.{StubEmbedder, StubSessionsLLM}
import graft.operators.{SessionOps, Sessionize}

/** Ad-hoc stage profiler for the RecentPath pipeline (dev tool, not part
  * of the declared surface). */
object ProfilePipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.EngineConf.configure(
        SparkSession.builder().master("local[32]"), 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val activity = graft.queries.PipelineQueries.activity(spark, sfDir)
    val sessions0 = time("sessionize") {
      val s = Sessionize.sessions(activity, new StubSessionsLLM); s.count(); s
    }
    val sessions = time("ids+embed+cache") {
      val s = SessionOps.withEmbeddings(SessionOps.withIds(sessions0), new StubEmbedder).cache()
      s.count(); s
    }
    val thresholds = time("thresholds") {
      val t = SessionOps.thresholds(sessions).cache(); t.count(); t
    }
    val pairs = time("candidatePairs") {
      val p = SessionOps.candidatePairs(sessions, thresholds); p.count(); p
    }
    time("merge(CC+agg)") { SessionOps.merge(sessions, pairs).count() }
    time("similarityGraph") { SessionOps.similarityGraph(sessions, thresholds).count() }
    spark.stop()
  }
}
