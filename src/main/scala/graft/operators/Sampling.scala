package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic content-addressed sampling for training-data curation.
  *
  * `sample(fraction)` draws a DIFFERENT set every run and every partition
  * layout; dataset curation needs the opposite: a row's membership decided
  * by a hash of its stable id, so samples are reproducible across runs,
  * engines, and repartitions, subsets nest (a 5% sample ⊂ the 10% sample
  * taken with the same salt), and adding rows never reshuffles existing
  * membership. Implemented as `md5(salt ∥ id)` with a hex-prefix threshold
  * — pure codegen'd column ops, exactly replayable in any engine with md5
  * (the DuckDB oracle shares the predicate text).
  *
  * Scale: a scan-level filter — pushes into the columnar reader, no
  * shuffle, no RNG state.
  */
object Sampling {

  /** Membership predicate: keep rows where the first 4 hex digits of
    * `md5(salt ∥ id)` fall below `keep65536` (fraction = keep65536/65536;
    * 4 digits give 1/65536 rate granularity). */
  def stablePredicate(id: Column, keep65536: Int, salt: String): Column = {
    substring(md5(concat(lit(salt), id.cast("string"))), 1, 4) <
      lit(hexThreshold(keep65536))
  }

  /** keep-all needs a sentinel above the hex alphabet: f"%04x" of 65536 is
    * the 5-char "10000", which sorts BELOW almost every 4-char hex string. */
  private def hexThreshold(keep65536: Int): String = {
    require(keep65536 >= 0 && keep65536 <= 65536, "rate out of range")
    if (keep65536 == 65536) "g" else f"$keep65536%04x"
  }

  /** Stable sample of `df` at rate keep65536/65536 keyed on `idCol`. */
  def stableSample(df: DataFrame, idCol: String, keep65536: Int,
      salt: String = "graft"): DataFrame =
    df.filter(stablePredicate(col(idCol), keep65536, salt))

  /** Per-stratum rates (e.g. downsample boilerplate-heavy domains while
    * keeping rare ones whole): strata missing from `rates` get
    * `defaultKeep65536`. */
  def stratifiedStableSample(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Int], defaultKeep65536: Int,
      salt: String = "graft"): DataFrame = {
    val threshold = rates.foldLeft(lit(hexThreshold(defaultKeep65536))) {
      case (acc, (stratum, keep)) =>
        when(col(strataCol) === stratum, lit(hexThreshold(keep))).otherwise(acc)
    }
    df.filter(
      substring(md5(concat(lit(salt), col(idCol).cast("string"))), 1, 4) < threshold)
  }

  /** PRIORITY SAMPLING (Duffield–Lund–Thorup, JACM 2007): a fixed-size
    * WEIGHTED sample that answers arbitrary subset-sum queries after the
    * fact — sample once at ingest, estimate Σw over any predicate later
    * without rescanning (the 100 TB telemetry shape). Each item draws
    * priority `q_i = w_i / u_i` with u_i uniform (0,1]; the sample is the
    * top-k by priority, τ the (k+1)-th priority, and the estimator
    * `ŵ_i = max(w_i, τ)` for sampled i (0 otherwise) is unbiased for
    * every subset-sum (DLT's theorem — probabilistic, so not oracle
    * material; what IS pinned is the arithmetic and the boundary
    * property below).
    *
    * Determinism grid: u_i lands on the ppb grid — `u_ppb =
    * (md5₄₈(id ∥ salt) mod 10^9) + 1 ∈ [1, 10^9]` — and
    * `pri_grid = (w·10^9) div u_ppb`, exact BIGINT for w ≤ 9.2·10^9
    * (documented caller bound; cents-scale weights sit far below it).
    * Ties break by id, so the sample set is a pure function of the data.
    *
    * Exhaustive boundary (spec-pinned): n ≤ k ⇒ no (k+1)-th priority ⇒
    * τ = 0 and ŵ = w — the sample IS the population and every
    * subset-sum estimate is exact.
    *
    * Scale shape: one TakeOrderedAndProject over the weighted scan
    * (top-(k+1) keeps ≤ k+1 rows per partition, no global sort), a
    * 1-row τ broadcast, and a k-row output. No shuffle beyond the
    * take-ordered reduction. */
  def prioritySample(df: DataFrame, idCol: String, weightCol: String,
      k: Int, salt: String = "ps-v1"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k must be >= 1, got $k")
    // loud input contract (the BloomPrefilter require discipline, done
    // row-wise since weights are data): a NEGATIVE weight would draw a
    // negative priority and corrupt τ and every subset-sum estimate
    // silently; a FRACTIONAL weight would silently truncate — both fail
    // the run instead. (The upper bound w ≤ 9.2·10^9 stays a documented
    // caller bound: it is where pri_grid exactness ends, not validity.)
    // backtick-quote so unusual column names stay one identifier, not an
    // expression; embedded backticks are doubled (Spark's quoting rule) so
    // a name containing ` cannot break out of the quote and splice
    // arbitrary SQL into the expr strings below
    val wq = s"`${weightCol.replace("`", "``")}`"
    val wChecked = expr(
      s"""CASE WHEN $wq IS NULL OR $wq < 0 THEN
         |  CAST(raise_error(concat('prioritySample: negative or NULL weight ',
         |    coalesce(CAST($wq AS STRING), 'NULL'))) AS LONG)
         |WHEN CAST($wq AS DOUBLE) <> CAST(CAST($wq AS LONG) AS DOUBLE) THEN
         |  CAST(raise_error(concat('prioritySample: non-integral weight ',
         |    CAST($wq AS STRING), ' would truncate')) AS LONG)
         |ELSE CAST($wq AS LONG) END""".stripMargin)
    val pri = df.select(col(idCol).as("ps_id"),
        wChecked.as("w"),
        // the shared 48-bit md5 convention — one pinned helper, so a
        // grid change cannot silently diverge this draw from the oracles
        (KmvSketch.hash48(col(idCol), salt)
          % lit(1000000000L) + lit(1L)).as("u_ppb"))
      .withColumn("pri_grid", expr("(w * 1000000000L) div u_ppb"))
    // top-(k+1) via orderBy+limit = TakeOrderedAndProject; the window
    // then ranks only the collected k+1 rows
    val top = pri.orderBy(col("pri_grid").desc, col("ps_id")).limit(k + 1)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("pri_grid").desc, col("ps_id"))).cast("long"))
    val tau = top.agg(coalesce(max(when(col("rnk") === (k + 1).toLong,
      col("pri_grid"))), lit(0L)).as("tau_grid"))
    top.filter(col("rnk") <= k.toLong)
      // 1-row τ against a ≤ k-row sample — the adjudicated broadcast
      // scalar-join shape
      .crossJoin(broadcast(tau))
      .select(col("rnk"), col("ps_id"), col("w"), col("u_ppb"),
        col("pri_grid"), col("tau_grid"),
        greatest(col("w"), col("tau_grid")).as("est_w"))
  }
}
