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
}
