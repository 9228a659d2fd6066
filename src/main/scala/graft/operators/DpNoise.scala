package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Differential-privacy noise for count releases — the two-sided
  * GEOMETRIC (discrete Laplace) mechanism at ε = ln 2 (Ghosh–Roughgarden
  * –Sundararajan 2009: the universally optimal mechanism for counts),
  * made deterministic and cross-engine replayable the way every stochastic
  * seam in this repo is (q131's Efraimidis–Spirakis keys, the stub LLMs):
  * the "randomness" is a 48-bit md5 uniform of the release key, mapped to
  * a noise value through an EXACT inverse-CDF threshold table.
  *
  *   P(Z = z) ∝ α^|z|  with α = e^(−ε) = 1/2,
  *   so P(0) = 1/3 and P(±k) = (1/3)·(1/2)^k —
  *
  * every probability is the rational 2^(K−|z|) / (3·2^K), and the
  * cumulative thresholds floor onto the 2^48 grid as exact BigInt
  * arithmetic: no float enters the mechanism at any point, so Spark and
  * DuckDB agree bit-for-bit (the table is emitted into both engines as
  * the same literal CASE chain). The tail is truncated at |z| = K
  * (default 30: residual mass (2/3)·2^−30 ≈ 6·10^−10, absorbed into
  * z = +K — documented, spec-pinned).
  *
  * A REAL deployment draws the uniform from a CSPRNG instead of md5 —
  * this seam pins the MECHANISM's arithmetic (table construction,
  * lookup, clamping), which is the part an engine can get wrong.
  * Sensitivity contract: ε = ln 2 per count when each contributing unit
  * changes one released count by at most 1 (pair with per-user
  * contribution bounding — q198 — when units contribute many rows).
  *
  * 100 TB shape: the mechanism is a pure per-row projection (md5 + a
  * literal CASE chain) over the already-aggregated release — no join, no
  * shuffle, no driver state beyond the 2K+1 literal thresholds.
  */
object DpNoise {

  val Grid: Long = 1L << 48

  /** Exact inverse-CDF table: (z, lo, hi) with u ∈ [lo, hi) ⇒ Z = z,
    * u on the [0, 2^48) grid, rows in ascending u order (z = −K … +K).
    * The final hi is pinned to 2^48 so the rows PARTITION the grid (the
    * truncated tail lands on +K). */
  def geometricThresholds(maxAbs: Int): Seq[(Long, Long, Long)] = {
    require(maxAbs >= 1 && maxAbs <= 46, s"maxAbs out of range: $maxAbs")
    val grid = BigInt(1) << 48
    val den = BigInt(3) * (BigInt(1) << maxAbs)
    val zs = (-maxAbs to maxAbs).toVector
    val nums = zs.map(z => BigInt(1) << (maxAbs - math.abs(z)))
    val cum = nums.scanLeft(BigInt(0))(_ + _)
    val bounds = cum.map(c => grid * c / den)
    zs.zipWithIndex.map { case (z, i) =>
      val lo = bounds(i).toLong
      val hi = if (i == zs.size - 1) grid.toLong else bounds(i + 1).toLong
      (z.toLong, lo, hi)
    }
  }

  /** 48-bit md5 uniform of `key` under `salt` — the q131 hex-prefix
    * construction (identical in DuckDB as
    * `('0x' || substr(md5(key || salt), 1, 12))::BIGINT`). */
  def uniform48(key: Column, salt: String): Column =
    conv(substring(md5(concat(key, lit(salt))), 1, 12), 16, 10).cast("long")

  /** The noise value for a uniform `u` — a literal CASE chain over the
    * threshold table (a projection: no join, so no BNLJ against the
    * 2K+1-row table and nothing for AQE to misjudge). */
  def noiseFor(u: Column, maxAbs: Int): Column =
    // foldLeft over ascending-lo rows leaves the HIGHEST lo outermost, so
    // the chain checks u >= lo from +K downward — first match wins, same
    // evaluation order as the SQL CASE twin below
    geometricThresholds(maxAbs).foldLeft(lit(null).cast("long")) {
      case (acc, (z, lo, _)) => when(u >= lit(lo), lit(z)).otherwise(acc)
    }

  /** The same CASE chain as DuckDB SQL, for oracle construction — both
    * engines evaluate the SAME literal table. `uExpr` must be the SQL of
    * the 48-bit uniform. */
  def noiseForSql(uExpr: String, maxAbs: Int): String =
    geometricThresholds(maxAbs).reverse.map { case (z, lo, _) =>
      s"WHEN ($uExpr) >= $lo THEN CAST($z AS BIGINT)"
    }.mkString("CASE ", " ", " ELSE NULL END")

  /** Release-ready noisy count: count + Z clamped at 0 (a count release
    * never goes negative; the clamp is post-processing, DP-safe). */
  def noisyCount(count: Column, u: Column, maxAbs: Int = 30): Column =
    greatest(count + noiseFor(u, maxAbs), lit(0L))
}
