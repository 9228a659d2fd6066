package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank-list fusion for hybrid retrieval — combining a lexical ranker
  * (BM25, q184) with a second ranker (set-overlap, embedding ANN) into
  * one result list, the standard first stage of a multi-retriever
  * serving stack.
  *
  * Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009):
  * {{{
  *   fused(q, d) = Σ_r 1 / (k + rank_r(q, d))
  * }}}
  * over the rankers r where d appears in q's top list, with the
  * published damping constant k = 60. RRF needs no score calibration
  * across rankers — only ranks — which is why it survives heterogeneous
  * retrievers. Integer convention: each contribution lands on the 1e9
  * grid as `10^9 div (k + rank)`; distinct (per-ranker rank multiset)
  * outcomes stay distinct until total fused scores collide, and the
  * final ordering tie-breaks on doc_id, so the output is deterministic
  * and a second engine reproduces it bit for bit.
  *
  * Scale shape: every input is already a per-query TOP-K list (≤ k·|Q|
  * rows — bounded by the serving fan-out, never the corpus), so the
  * full-outer fold joins bounded frames on (qid, doc_id) and the final
  * window orders ≤ Σ_r k rows per query. Nothing here touches the
  * corpus; the rankers did that upstream with their own scale shapes.
  */
object Fusion {

  /** Fuse named rank lists. Each input frame: (qid, doc_id, rank) with
    * rank ≥ 1. Output: (qid, rank, doc_id, rrf_e9, rank_<name>...) —
    * top `topK` per query by fused score, absent-from-a-list ranks NULL.
    */
  def reciprocalRank(rankings: Seq[(String, DataFrame)], kConst: Int = 60,
      topK: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(kConst >= 1, s"k must be >= 1, got $kConst")
    val tagged = rankings.map { case (name, df) =>
      // min-rank dedup: the fold below full-outer-joins on (qid, doc_id),
      // so a ranker that emitted duplicate rows for one (qid, doc_id)
      // would fan out MULTIPLICATIVELY across rankers and silently
      // inflate rrf_e9 — enforce the one-row-per-key contract here
      df.select(col("qid"), col("doc_id"), col("rank").cast("long").as("r"))
        .groupBy(col("qid"), col("doc_id"))
        .agg(min(col("r")).as(s"rank_$name"))
    }
    val joined = tagged.reduce(_.join(_, Seq("qid", "doc_id"), "full_outer"))
    val fused = rankings.map { case (name, _) =>
      // backticks: a ranker name like "bm-25" must stay one identifier,
      // not parse as `rank_bm - 25`
      coalesce(expr(s"1000000000 div ($kConst + `rank_$name`)"), lit(0L))
    }.reduce(_ + _)
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("rrf_e9").desc, col("doc_id"))
    joined.withColumn("rrf_e9", fused)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(Seq(col("qid"), col("rank"), col("doc_id"), col("rrf_e9")) ++
        rankings.map { case (name, _) => col(s"rank_$name") }: _*)
  }
}
