package graft.pipeline

import graft.SparkSpec
import graft.enrich.{Embedder, LLMClient, StubEmbedder, StubSessionsLLM}
import org.apache.spark.sql.functions._

/** The opt-in shared pipeline prefix (graft.pipeline.cachePrefix):
  * flag OFF must be byte-identical to the historical per-query path; flag
  * ON must run the Sessionize enrichment ONCE across the q50/q51/q52
  * consumer group. Counters live in a JVM-shared static (local-mode
  * executors share the test JVM), not closure state. */
class PipelinePrefixSpec extends SparkSpec {

  private def activity = graft.queries.PipelineQueries.activity(spark, sf)

  private def withFlag[A](v: Option[String])(f: => A): A = {
    val prev = spark.conf.getOption(PipelinePrefix.Flag)
    try {
      v.fold(spark.conf.unset(PipelinePrefix.Flag))(spark.conf.set(PipelinePrefix.Flag, _))
      f
    } finally {
      spark.conf.unset(PipelinePrefix.Flag)
      prev.foreach(spark.conf.set(PipelinePrefix.Flag, _))
      PipelinePrefix.clear()
    }
  }

  test("flag off (default): output identical, every consumer re-runs the prefix") {
    withFlag(None) {
      // count() (no sort — a range-partitioned orderBy samples its child,
      // running the enrichment an extra partial pass) so call counts are
      // exactly one pass per action
      PipelinePrefixSpec.llmCalls.set(0)
      PipelinePrefix.sessions(activity, new CountingSessionsLLM).count()
      val firstPass = PipelinePrefixSpec.llmCalls.get()
      assert(firstPass > 0)
      // a second consumer pays again — the independent-query contract
      PipelinePrefix.sessions(activity, new CountingSessionsLLM).count()
      assert(PipelinePrefixSpec.llmCalls.get() == 2 * firstPass)
    }
    val off = withFlag(None) {
      PipelinePrefix.sessions(activity, new StubSessionsLLM)
        .orderBy(col("user_id"), col("date"), col("time_start"), col("description"))
        .collect().map(_.toString).toSeq
    }
    val direct = graft.operators.Sessionize.sessions(activity, new StubSessionsLLM)
      .orderBy(col("user_id"), col("date"), col("time_start"), col("description"))
      .collect().map(_.toString).toSeq
    assert(off === direct)
  }

  test("flag on: ONE Sessionize pass across sessions + embedded-prefix consumers") {
    withFlag(Some("true")) {
      PipelinePrefixSpec.llmCalls.set(0)
      PipelinePrefixSpec.embedCalls.set(0)
      val s1 = PipelinePrefix.sessions(activity, new CountingSessionsLLM)
      s1.count() // first consumer materializes the memoized cache
      val afterFirst = PipelinePrefixSpec.llmCalls.get()
      assert(afterFirst > 0)
      // q50-shaped second consumer: memo hit, no new LLM work
      PipelinePrefix.sessions(activity, new CountingSessionsLLM).count()
      assert(PipelinePrefixSpec.llmCalls.get() == afterFirst)
      // q51/q52-shaped consumer: builds embeddings ON TOP of the memoized
      // sessions — still no new LLM work, and the embed pass runs once
      val emb = PipelinePrefix.embeddedSessions(
        activity, new CountingSessionsLLM, new CountingEmbedder)
      emb.count()
      emb.count()
      assert(PipelinePrefixSpec.llmCalls.get() == afterFirst)
      assert(PipelinePrefixSpec.embedCalls.get() > 0)
      val embedOnce = PipelinePrefixSpec.embedCalls.get()
      // RecentPath.run with the flag on consumes the same memo
      val out = RecentPath.run(activity, new CountingSessionsLLM, new CountingEmbedder)
      out.sessions.count()
      assert(PipelinePrefixSpec.llmCalls.get() == afterFirst)
      assert(PipelinePrefixSpec.embedCalls.get() == embedOnce)
    }
  }

  test("flag on vs off: identical rows") {
    val on = withFlag(Some("true")) {
      PipelinePrefix.sessions(activity, new StubSessionsLLM)
        .orderBy(col("user_id"), col("date"), col("time_start"), col("description"))
        .collect().map(_.toString).toSeq
    }
    val off = withFlag(None) {
      PipelinePrefix.sessions(activity, new StubSessionsLLM)
        .orderBy(col("user_id"), col("date"), col("time_start"), col("description"))
        .collect().map(_.toString).toSeq
    }
    assert(on === off)
  }
}

object PipelinePrefixSpec {
  val llmCalls = new java.util.concurrent.atomic.AtomicInteger(0)
  val embedCalls = new java.util.concurrent.atomic.AtomicInteger(0)
}

/** Stub LLM that counts prompts answered (JVM-global — survives closure
  * serialization in local mode). */
final class CountingSessionsLLM extends LLMClient {
  private val inner = new StubSessionsLLM
  override def complete(prompts: Seq[String]): Seq[String] = {
    PipelinePrefixSpec.llmCalls.addAndGet(prompts.size)
    inner.complete(prompts)
  }
}

final class CountingEmbedder extends Embedder {
  private val inner = new StubEmbedder
  override val dim: Int = inner.dim
  override def embed(texts: Seq[String]): Seq[Array[Float]] = {
    PipelinePrefixSpec.embedCalls.addAndGet(texts.size)
    inner.embed(texts)
  }
}
