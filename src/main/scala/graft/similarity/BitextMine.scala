package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Margin-based bitext mining (Artetxe & Schwenk, ACL 2019) — the
  * parallel-corpus miner an MT / multilingual training-data pipeline
  * runs over two monolingual pools: score every cross-lingual pair by
  * its cosine RELATIVE to each side's neighborhood density
  * (`margin = cos(x,y) / (avg-top-k(x) + avg-top-k(y)) / 2`), then keep
  * RECIPROCAL best matches. The margin denominator is what kills
  * "hub" candidates — a target close to everything has a large
  * neighborhood sum and loses to a target specifically close to one
  * source, the correction raw-cosine mining lacks (spec-pinned with a
  * planted hub).
  *
  * Float policy: cosines land on the 1e-9 grid (`sim_ppb`) first; the
  * ratio margin is the INTEGER `(sim_ppb · 2k · 10^6) div (sumk_x +
  * sumk_y)` over top-k sim sums, so ranking and reciprocity are exact
  * on both engines. Pairs are pre-filtered to sim_ppb > 0 (a negative
  * cosine is never a mining candidate, and it keeps the div operands
  * positive where `div` ≡ DuckDB `//`).
  *
  * Scale shape: the pairwise block is |src|·|tgt| — the operator is
  * meant to run per sharded language-pair bucket (the q31/q58 bucketed
  * discipline decides the blocking upstream); within a block everything
  * is one broadcast-side join, two top-k windows, two best-match
  * windows and one reciprocal equi-join — no corpus self-join, no
  * driver state.
  */
object BitextMine {

  /** Mutual-margin matches between `src` (id, vec) and `tgt` (id, vec):
    * (src_id, tgt_id, sim_ppb, margin_ppm), reciprocal-best only,
    * ordered by src_id. `k` = neighborhood depth on both sides. */
  def mutualMargin(src: DataFrame, tgt: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val s = src.select(col(idCol).as("src_id"), col(vecCol).as("sv"))
    val t = tgt.select(col(idCol).as("tgt_id"), col(vecCol).as("tv"))
    // conditionless block product, src side broadcast (the q32 probe
    // shape) — the language-pair BLOCK is the bounded unit here
    val pairs = t.crossJoin(broadcast(s))
      .select(col("src_id"), col("tgt_id"),
        graft.functions.fixed_point(
          graft.functions.cosine_similarity(col("sv"), col("tv")), 1e9)
          .as("sim_ppb"))
      .filter(col("sim_ppb") > 0)
    val wsrc = Window.partitionBy(col("src_id"))
      .orderBy(col("sim_ppb").desc, col("tgt_id"))
    val wtgt = Window.partitionBy(col("tgt_id"))
      .orderBy(col("sim_ppb").desc, col("src_id"))
    val sumS = pairs.withColumn("r", row_number().over(wsrc))
      .filter(col("r") <= k)
      .groupBy(col("src_id")).agg(sum(col("sim_ppb")).as("sumk_x"))
    val sumT = pairs.withColumn("r", row_number().over(wtgt))
      .filter(col("r") <= k)
      .groupBy(col("tgt_id")).agg(sum(col("sim_ppb")).as("sumk_y"))
    val scored = pairs
      .join(sumS, "src_id").join(sumT, "tgt_id")
      .select(col("src_id"), col("tgt_id"), col("sim_ppb"),
        expr(s"(sim_ppb * ${2 * k} * 1000000) div (sumk_x + sumk_y)")
          .as("margin_ppm"))
    val wbestS = Window.partitionBy(col("src_id"))
      .orderBy(col("margin_ppm").desc, col("sim_ppb").desc, col("tgt_id"))
    val wbestT = Window.partitionBy(col("tgt_id"))
      .orderBy(col("margin_ppm").desc, col("sim_ppb").desc, col("src_id"))
    val fwd = scored.withColumn("rs", row_number().over(wbestS))
      .filter(col("rs") === 1).drop("rs")
    val bwd = scored.withColumn("rt", row_number().over(wbestT))
      .filter(col("rt") === 1)
      .select(col("src_id"), col("tgt_id"))
    fwd.join(bwd, Seq("src_id", "tgt_id"))
      .select(col("src_id"), col("tgt_id"), col("sim_ppb"), col("margin_ppm"))
      .orderBy(col("src_id"))
  }
}
