package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein, SIGIR
  * 1998) — the diversification stage between a top-k retriever and the
  * result list: greedily pick the candidate that is relevant to the
  * query but NOT redundant with what is already selected,
  * {{{
  *   score(d) = λ·sim(q, d) − (1 − λ)·max_{s ∈ Sel} sim(d, s)
  * }}}
  * Integer convention: similarities arrive on the ppb grid (the q163
  * `round(cos·10^9)` rule), λ in ppm, so every round's argmax orders
  * `λ_ppm·sim_ppb − (10^6 − λ_ppm)·maxsim_ppb` LONGs with an id
  * tie-break — a second engine unrolls the identical greedy rounds.
  * Round 1 has an empty selected set: score = λ_ppm·sim_ppb.
  *
  * Scale shape: MMR runs on CANDIDATE LISTS (≤ k·|Q| rows from the
  * retriever), never the corpus — each greedy round is an anti-join +
  * a (candidate × selected) max over the bounded pair table + one
  * per-query window. Nothing collects to the driver; the rounds are
  * data-frame iterates like the k-core peel, just k of them. */
object Mmr {

  /** Greedy-select `k` of each query's candidates.
    *
    * @param cands    (qid, id, simq_ppb) — retriever output per query.
    * @param pairSims (qid, id_a, id_b, sim_ppb) — pairwise candidate
    *                 similarities, symmetric (both orientations present).
    * @return (qid, sel_round, id, mmr_score) — selection order 1..k. */
  def select(cands: DataFrame, pairSims: DataFrame, k: Int,
      lambdaPpm: Long = 700000L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(lambdaPpm >= 0 && lambdaPpm <= 1000000L, s"bad lambda: $lambdaPpm")
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("mmr_score").desc, col("id"))
    var sel = cands
      .select(col("qid"), col("id"),
        (lit(lambdaPpm) * col("simq_ppb")).as("mmr_score"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("qid"), lit(1).as("sel_round"), col("id"), col("mmr_score"))
    for (r <- 2 to k) {
      val remaining = cands
        .join(sel.select(col("qid"), col("id")), Seq("qid", "id"), "left_anti")
      val maxSim = remaining.select(col("qid"), col("id"))
        .join(pairSims.withColumnRenamed("id_a", "id"), Seq("qid", "id"))
        .join(sel.select(col("qid"), col("id").as("id_b")), Seq("qid", "id_b"))
        .groupBy(col("qid"), col("id")).agg(max(col("sim_ppb")).as("msim"))
      // LEFT join + coalesce: a candidate with NO pair row to any selected
      // item (sparse pair tables omit zero-similarity pairs) penalizes at
      // msim = 0 — an inner join would silently DROP the most diverse
      // candidates, the exact opposite of MMR's point
      val pick = remaining.join(maxSim, Seq("qid", "id"), "left")
        .select(col("qid"), col("id"),
          (lit(lambdaPpm) * col("simq_ppb") -
            lit(1000000L - lambdaPpm) * coalesce(col("msim"), lit(0L)))
            .as("mmr_score"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("qid"), lit(r).as("sel_round"), col("id"),
          col("mmr_score"))
      // lineage cut per round (the kCore discipline): pick references sel
      // three times, so an uncut plan grows ~4^k nodes
      sel = sel.unionByName(pick).localCheckpoint(false)
    }
    sel
  }
}
