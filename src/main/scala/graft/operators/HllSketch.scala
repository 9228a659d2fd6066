package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog register computation over the repo's shared 48-bit md5 hash
  * (SURVEY §2.5 sketch family; companion to [[KmvSketch]]).
  *
  * Spark's own `approx_count_distinct` IS HLL++, but its registers are
  * engine-pinned (q62 stays rows-only for exactly that reason). This
  * operator recomputes the textbook Flajolet–Fusy–Gandouet–Meunier
  * register table from a hash both engines can replay bit-for-bit:
  *
  *   h ∈ [0, 2^48)  (md5-prefix, [[KmvSketch.hash48]])
  *   register = h div 2^(48−p)          (top p bits)
  *   rho      = #leading zeros of the (48−p)-bit suffix + 1
  *            = (48−p+1) − len(bin(suffix)),  suffix > 0
  *
  * `bin()` (binary rendering without leading zeros) exists in both Spark
  * and DuckDB, so `len(bin(x))` = floor(log2 x)+1 is an INTEGER-exact
  * leading-zero count — no float log anywhere near the registers.
  *
  * The raw estimate α·m²/Σ2^(−M[j]) is also cross-engine stable: every
  * 2^(−rho) is a dyadic rational with exponent ≥ −(48−p+1), so the Σ over
  * ≤ m registers plus the integer empty-register count is EXACTLY
  * representable in a double regardless of Spark's aggregation order, and
  * the remaining α·m²/Σ is a single multiply + divide (identical IEEE ops
  * in both engines). Small-range bias correction (linear counting) needs
  * `ln`, whose last-ulp behavior is libm-specific — deliberately NOT
  * emitted; the registers themselves are the artifact (and they determine
  * any corrected estimate).
  *
  * Scale design: registers are a partial-aggregatable `max` — one pass, no
  * distinct shuffle (duplicate values produce identical rho, so max absorbs
  * them), shuffle rows bounded by groups×m partials. Register tables from
  * different shards/days merge by the same `max` (see [[merge]]) without
  * touching raw data — the mergeable-sketch contract HLL exists for.
  */
object HllSketch {

  /** Per-(group, register) max-rho table — the HLL sketch as rows.
    * Registers never hit by any hash are absent (semantically rho 0). */
  def registers(df: DataFrame, grpCol: String, valCol: String, p: Int = 6,
      salt: String = "hll-v1"): DataFrame = {
    require(p >= 4 && p <= 16, s"p=$p out of range")
    val suffixBits = 48 - p
    val suffixSpace = 1L << suffixBits
    df.select(col(grpCol).as("grp"),
        KmvSketch.hash48(col(valCol), salt).as("h"))
      .select(col("grp"),
        expr(s"h div ${suffixSpace}L").as("reg"),
        when(expr(s"h % ${suffixSpace}L") === 0, lit(suffixBits + 1).cast("long"))
          .otherwise(lit(suffixBits + 1) -
            length(bin(expr(s"h % ${suffixSpace}L"))).cast("long"))
          .as("rho"))
      .groupBy(col("grp").as(grpCol), col("reg"))
      .agg(max(col("rho")).as("max_rho"))
  }

  /** Merge per-shard register tables (same p): element-wise max. */
  def merge(sketches: DataFrame, grpCol: String): DataFrame =
    sketches.groupBy(col(grpCol), col("reg"))
      .agg(max(col("max_rho")).as("max_rho"))

  /** α_m constants from the HLL paper: α16=.673, α32=.697, α64=.709,
    * α_m = .7213/(1 + 1.079/m) for m ≥ 128. */
  def alpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _ => 0.7213 / (1.0 + 1.079 / m)
  }

  /** Raw (uncorrected) HLL estimate per group, floored to BIGINT.
    * Deterministic: see the dyadic-sum argument in the class doc. */
  def rawEstimate(regs: DataFrame, grpCol: String, p: Int = 6): DataFrame = {
    val m = 1 << p
    regs.groupBy(col(grpCol))
      .agg(sum(pow(lit(2.0), -col("max_rho"))).as("s"),
        count(lit(1)).as("nreg"))
      .select(col(grpCol),
        floor(lit(alpha(m) * m * m) / (col("s") + (lit(m) - col("nreg"))))
          .cast("long").as("raw_est"),
        (lit(m) - col("nreg")).cast("long").as("n_empty"))
  }
}
