package graft.pipeline

import graft.SparkSpec
import graft.enrich.{StubEmbedder, StubInterestsLLM, StubSessionsLLM}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Golden end-to-end determinism (SURVEY §5.5): with stub enrichment, both
  * pipeline paths produce identical results across runs AND across input
  * partitionings — the byte-stability contract that makes per-user
  * idempotent rebuilds safe. */
class GoldenPipelineSpec extends SparkSpec {

  private def activity: DataFrame =
    graft.queries.PipelineQueries.activity(spark, sf)

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("recent path: merged sessions + graph are partition-invariant") {
    val a = RecentPath.run(activity, new StubSessionsLLM, new StubEmbedder)
    val b = RecentPath.run(activity.repartition(17), new StubSessionsLLM, new StubEmbedder)
    assert(canon(a.merged) == canon(b.merged))
    assert(canon(a.graph) == canon(b.graph))
    assert(a.merged.count() > 0 && a.graph.count() > 0)
  }

  test("old path: interests + clusters are partition-invariant") {
    val a = OldPath.run(activity, new StubInterestsLLM, new StubEmbedder,
      eps = 0.7, minClusterSize = 3)
    val b = OldPath.run(activity.repartition(11), new StubInterestsLLM, new StubEmbedder,
      eps = 0.7, minClusterSize = 3)
    assert(canon(a.interests) == canon(b.interests))
    assert(canon(a.clusters) == canon(b.clusters))
    assert(a.interests.count() > 0)
  }

  test("merged sessions cover their inputs (interval invariant)") {
    val out = RecentPath.run(activity, new StubSessionsLLM, new StubEmbedder)
    val sessions = out.sessions.select(col("user_id"), col("start_s"), col("end_s"))
    val merged = out.merged
    // every merged interval is within the user's [min start, max end]
    val bounds = sessions.groupBy("user_id")
      .agg(min("start_s").as("lo"), max("end_s").as("hi"))
    val bad = merged.join(bounds, "user_id")
      .filter(col("start_s") < col("lo") || col("end_s") > col("hi"))
    assert(bad.count() == 0)
    // merge never increases session count
    assert(merged.count() <= sessions.count())
  }
}
