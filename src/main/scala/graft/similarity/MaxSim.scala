package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LATE-INTERACTION scoring (ColBERT's MaxSim — Khattab & Zaharia,
  * SIGIR 2020): multi-vector retrieval where every query token keeps
  * its own embedding and a candidate's score is
  *
  *   score(q, d) = Σ_{qt ∈ q} max_{dt ∈ d} ⟨e_qt, e_dt⟩
  *
  * — the sum-of-max algebra that preserves token-level matching where a
  * pooled single vector blurs it (a rare query term can dominate its
  * best-matching document term even when the document's centroid is
  * far).
  *
  * This operator is the RE-RANKING stage only, by design: it takes a
  * bounded candidate frame from a cheap stage-1 retriever (BM25 /
  * ANN), which is exactly how late interaction deploys — the all-pairs
  * token interaction is never materialized corpus-wide. At 100 TB the
  * interaction volume is |cands| · |query tokens| · |doc tokens|,
  * bounded by the stage-1 k, never by the corpus.
  *
  * Embeddings arrive as integer-grid columns `e0..e<dims-1>` on both
  * sides, so the dot product, the per-query-token max and the sum are
  * all exact integers and the rank boundary (score DESC, doc_id) is
  * deterministic — the float policy applied to multi-vector retrieval.
  */
object MaxSim {

  /** Re-rank `cands` (qid, doc_id) by MaxSim. `queryTok`: (qid, qt,
    * e0..e<dims-1>) one row per query token; `docTok`: (doc_id, dt,
    * e0..e<dims-1>) one row per DISTINCT candidate-document token.
    * Output: (qid, rank, doc_id, score_i) top `k` per qid. */
  def rerank(cands: DataFrame, queryTok: DataFrame, docTok: DataFrame,
      dims: Int, k: Int): DataFrame = {
    require(dims >= 1, s"dims must be >= 1, got $dims")
    require(k >= 1, s"k must be >= 1, got $k")
    val dot = (0 until dims).map(j =>
      col(s"qe.e$j") * col(s"te.e$j")).reduce(_ + _)
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score_i").desc, col("doc_id"))
    cands
      .join(queryTok.alias("qe"), "qid")
      .join(docTok.alias("te"), "doc_id")
      .groupBy(col("qid"), col("doc_id"), col("qt"))
      .agg(max(dot).as("md"))
      .groupBy(col("qid"), col("doc_id"))
      .agg(sum(col("md")).as("score_i"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("doc_id"), col("score_i"))
  }
}
