package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.enrich.{Embedder, LLMClient}
import graft.operators.{Sessionize, SessionOps}

/** The reference's recent path end-to-end (SURVEY §3 EP2): activity →
  * LLM sessions → embeddings → adaptive thresholds → banded candidate
  * pairs → connected-components merge → top-1 similarity graph.
  *
  * Every stage is a DataFrame transformation; enrichment stages cache
  * their output (non-deterministic boundary — Catalyst must not re-execute
  * the LLM/embedder on plan re-evaluation, SURVEY §4). */
object RecentPath {

  final case class Outputs(
      sessions: DataFrame,
      thresholds: DataFrame,
      merged: DataFrame,
      graph: DataFrame)

  def run(activity: DataFrame, llm: LLMClient, embedder: Embedder,
      chunkSize: Int = 15): Outputs = {
    val sessions = SessionOps.withEmbeddings(
      SessionOps.withIds(Sessionize.sessions(activity, llm, chunkSize)),
      embedder)
      .cache()
    val thresholds = SessionOps.thresholds(sessions).cache()
    val pairs = SessionOps.candidatePairs(sessions, thresholds)
    val merged = SessionOps.merge(sessions, pairs)
    val graph = SessionOps.similarityGraph(sessions, thresholds)
    Outputs(sessions, thresholds, merged, graph)
  }
}
