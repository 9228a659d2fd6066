package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalar quantization (SQ8) ANN — the third member of the compression
  * family next to PQ (Jégou et al. 2011 §II.A calls this the baseline PQ
  * generalizes): every dimension is quantized INDEPENDENTLY to an 8-bit
  * level on its own per-dimension [min, max] range, so a 64-float vector
  * stores as 64 bytes (4× smaller scans) with no codebook training at
  * all — the "index build" is one aggregate.
  *
  * Everything lives on the repo's 1e-6 fixed-point grid
  * (`functions.fixed_point` ppm integers), so quantize, reconstruct,
  * ADC scoring, and the exact re-rank are ALL integer arithmetic —
  * bit-reproducible across engines and partitionings:
  * {{{
  *   code  = ((vppm − lo_d) · 255) div max(hi_d − lo_d, 1)   ∈ [0, 255]
  *   recon = lo_d + (code · span_d) div 255
  *   adc_i = Σ_d qppm_d · recon_d          (query exact, corpus coded)
  *   exact = Σ_d qppm_d · vppm_d           (re-rank on the ppm grid)
  * }}}
  *
  * Scale shape: stats are one (dim)-row aggregate, broadcast everywhere
  * after; encoding is one corpus pass; serving scans ONLY the codes
  * table (narrow) against broadcast probes and per-dimension stats
  * arrays — the score is a per-row fold over the code array (no
  * explode, no per-dimension shuffle), then a per-probe top-k window.
  * Only shortlist survivors (factor·k per probe) touch full vectors.
  * The fold is a higher-order `aggregate` (interpreted, not codegen'd) —
  * acceptable for a memory-bound scan; a codegen'd Expression would be
  * the next notch if profiles demand it. */
object Sq {

  /** `(id, d, vppm)` — the corpus on the 1e-6 integer grid, 1-based d. */
  private def ppm(corpus: DataFrame, idCol: String, vecCol: String): DataFrame =
    corpus.select(col(idCol).cast("long").as("id"),
        posexplode(col(vecCol).cast("array<double>")))
      .select(col("id"), (col("pos") + 1).as("d"),
        graft.functions.fixed_point(col("col"), 1e6).as("vppm"))

  /** Per-dimension quantization stats: `(d, lo, span)` with
    * `span = max(hi − lo, 1)` (degenerate constant dimensions quantize
    * to code 0 and reconstruct exactly). One aggregate, dim rows. */
  def stats(corpus: DataFrame, idCol: String, vecCol: String): DataFrame =
    ppm(corpus, idCol, vecCol)
      .groupBy(col("d"))
      .agg(min(col("vppm")).as("lo"),
        greatest(max(col("vppm")) - min(col("vppm")), lit(1L)).as("span"))

  /** Encode: `(id, codes)` with `codes[d−1] ∈ [0, 255]` — the narrow
    * serve representation (ints in an array; a production sink would
    * byte-pack them). */
  def encode(corpus: DataFrame, idCol: String, vecCol: String,
      statsDf: DataFrame): DataFrame =
    ppm(corpus, idCol, vecCol)
      .join(broadcast(statsDf), "d")
      .select(col("id"), col("d"),
        expr("((vppm - lo) * 255) div span").cast("int").as("code"))
      .groupBy(col("id"))
      .agg(expr("transform(array_sort(collect_list(struct(d, code))), x -> x.code)")
        .as("codes"))

  /** ADC top-`k` with exact re-rank: shortlist `factor·k` per probe on
    * the reconstructed integer inner product, re-rank survivors on the
    * exact ppm inner product. Ties break toward the smaller id at both
    * stages. Output: `(qid, rank, nn, adc_i, exact_i)`. */
  def topK(codes: DataFrame, statsDf: DataFrame, queries: DataFrame,
      corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, factor: Int): DataFrame = {
    // stats as broadcast 1-row arrays in dimension order
    val statsArr = statsDf.agg(
      expr("transform(array_sort(collect_list(struct(d, lo))), x -> x.lo)")
        .as("lo_arr"),
      expr("transform(array_sort(collect_list(struct(d, span))), x -> x.span)")
        .as("span_arr"))
    val qppm = queries.select(col(idCol).cast("long").as("qid"),
      expr("transform(cast(" + vecCol + " as array<double>), " +
        "x -> cast(signum(x * 1e6) * floor(abs(x * 1e6) + 0.5) as bigint))")
        .as("qarr"))
    val adc = codes
      .crossJoin(broadcast(qppm))
      .crossJoin(broadcast(statsArr))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"),
        expr("""aggregate(sequence(1, size(codes)), cast(0 as bigint),
               |  (acc, i) -> acc + element_at(qarr, i) *
               |    (element_at(lo_arr, i) +
               |     (cast(element_at(codes, i) as bigint) * element_at(span_arr, i)) div 255))"""
          .stripMargin).as("adc_i"))
    val wA = Window.partitionBy(col("qid"))
      .orderBy(col("adc_i").desc, col("id"))
    val shortlist = adc
      .withColumn("arank", row_number().over(wA))
      .filter(col("arank") <= factor * k)
    val vppmArr = corpus.select(col(idCol).cast("long").as("id"),
      expr("transform(cast(" + vecCol + " as array<double>), " +
        "x -> cast(signum(x * 1e6) * floor(abs(x * 1e6) + 0.5) as bigint))")
        .as("varr"))
    val exact = shortlist
      .join(vppmArr, "id")
      .join(broadcast(qppm), "qid")
      .select(col("qid"), col("id").as("nn"), col("adc_i"),
        expr("""aggregate(sequence(1, size(varr)), cast(0 as bigint),
               |  (acc, i) -> acc + element_at(qarr, i) * element_at(varr, i))"""
          .stripMargin).as("exact_i"))
    val wE = Window.partitionBy(col("qid"))
      .orderBy(col("exact_i").desc, col("nn"))
    exact.withColumn("rank", row_number().over(wE))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nn"), col("adc_i"), col("exact_i"))
  }
}
