package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MinHash-LSH BAND PLANNING — the design knob the banded dedup shelf
  * (q43/q45/q56) fixes by convention (4 bands × 2 rows) and q213 audits
  * empirically. Before committing k minhashes to a (b, r) split, a
  * 100 TB dedup owner consults the S-curve
  *
  *   P_collide(s) = 1 − (1 − s^r)^b
  *
  * (Leskovec–Rajaraman–Ullman, MMDS ch. 3; the datasketch library's
  * planner minimizes the same weighted FP/FN integrals): at similarity
  * `s`, one band of r rows agrees with probability s^r, and the pair
  * becomes a candidate if ANY of the b bands agree. Splitting the same
  * k = b·r hashes wide-and-short (large b) catches more true pairs but
  * admits more false candidates; narrow-and-tall (large r) the reverse.
  * The planner scores each split by the Riemann sums of the two error
  * areas around the target threshold t:
  *
  *   FP ≈ Σ_{s ≤ t}  P_collide(s)        (candidates that should not be)
  *   FN ≈ Σ_{s > t} (1 − P_collide(s))   (true pairs the banding misses)
  *
  * over the 101-point grid s = i/100, and picks the split minimizing
  * FP + FN (ties by fewer bands — fewer bucket tables).
  *
  * DETERMINISM: every value lands on the ppm grid with truncating
  * integer arithmetic — s^r and (1−s^r)^b are iterated
  * `x ← (x·y) div 10^6` chains UNROLLED per literal (b, r) (both
  * engines replay the same truncation order, so the whole curve and
  * both integrals are hash-checkable; no float ever enters). Exponents
  * here are single digits, so the unrolled chain is short and fully
  * codegen'd.
  *
  * Scale: the planner is corpus-free — |pairs| × 101 rows of integer
  * arithmetic. It runs before the corpus is ever touched; its output
  * decides the shape of the corpus-sized banding job.
  */
object LshPlanner {

  /** `(1 − s^r)^b` on the ppm grid over a column named `s_ppm` — the
    * "no band agrees" probability, shared verbatim by engine and
    * oracle. */
  private[graft] def missSql(b: Int, r: Int, divOp: String = "div"): String =
    powPpmSql(s"(1000000 - ${powPpmSql("s_ppm", r, divOp)})", b, divOp)

  /** `x^e` on the ppm grid as an unrolled truncating product chain
    * `((x·x) div 10^6 · x) div 10^6 …` — `e` is a literal, so the chain
    * is one plain codegen'd expression. `divOp` is "div" (Spark) or "//"
    * (DuckDB): the oracle reuses THIS generator, so both engines replay
    * the identical truncation order by construction. */
  private[graft] def powPpmSql(x: String, e: Int,
      divOp: String = "div"): String = {
    require(e >= 1, s"exponent must be >= 1, got $e")
    (2 to e).foldLeft(x)((acc, _) => s"(($acc * $x) $divOp 1000000)")
  }

  /** The collision S-curve P_collide(s) = 1 − (1 − s^r)^b on the
    * 101-point ppm grid for every (b, r) in `splits`, with the FP / FN
    * Riemann sums around `tPpm` and the total score attached to every
    * row. Output: (b, r, s_ppm, p_ppm, fp_sum_ppm, fn_sum_ppm,
    * score_ppm, chosen) — `chosen` marks the minimal-score split
    * (ties by fewer bands). */
  def sCurve(spark: SparkSession, splits: Seq[(Int, Int)],
      tPpm: Long): DataFrame = {
    require(splits.nonEmpty, "need at least one (bands, rows) split")
    require(tPpm > 0 && tPpm < 1000000L, s"tPpm out of (0, 1e6): $tPpm")
    splits.foreach { case (b, r) =>
      require(b >= 1 && r >= 1, s"bands/rows must be >= 1, got ($b, $r)") }
    scoredGrid(spark, splits.map { case (b, r) =>
      (Seq("b" -> b.toLong, "r" -> r.toLong), b, r)
    }, Seq("b", "r"), tPpm, cost = None)
  }

  /** All (b, r) splits of signature length `k` — every divisor pair. */
  private[graft] def splitsOf(k: Int): Seq[(Int, Int)] =
    (1 to k).filter(k % _ == 0).map(b => (b, k / b))

  /** The FULL 100 TB banding plan: choose the signature length k too,
    * not just the (b, r) split of a fixed k (VERDICT r15 next-round #6).
    * More minhashes always shrink both error integrals, so an
    * FP+FN-only argmin degenerates to the largest k offered; the real
    * planning question weighs error against what each extra hash COSTS
    * — one more signature column computed per document, stored per
    * document, shuffled per banding job, over the whole corpus. That
    * price is `hashCostPpm` per hash (same ppm unit as the error
    * integrals; one grid point of error mass = 10^6), and the score
    * over the grid {(k, b, r) : k ∈ ks, b·r = k} is
    *
    *   score(k, b, r) = FP(b, r) + FN(b, r) + k · hashCostPpm
    *
    * — all exact Long arithmetic on the same unrolled truncating ppm
    * chains as [[sCurve]] (one shared [[scoredGrid]] core, so the grid,
    * the integrals, and the total tie-break cannot drift between the
    * two planners). Ties break by (score, k, b, r): prefer fewer
    * hashes, then fewer bucket tables. Output adds `k` and
    * `hash_cost_ppm` to the [[sCurve]] shape; `chosen` marks the single
    * argmin row set. Corpus-free: |grid| × 101 rows. */
  def kPlan(spark: SparkSession, ks: Seq[Int], tPpm: Long,
      hashCostPpm: Long): DataFrame = {
    require(ks.nonEmpty, "need at least one candidate signature length")
    require(ks.distinct.size == ks.size, s"duplicate k values: $ks")
    ks.foreach(k => require(k >= 1 && k <= 32,
      s"signature length out of [1, 32]: $k"))
    require(tPpm > 0 && tPpm < 1000000L, s"tPpm out of (0, 1e6): $tPpm")
    require(hashCostPpm >= 0L, s"hashCostPpm must be >= 0, got $hashCostPpm")
    scoredGrid(spark,
      ks.flatMap { k =>
        splitsOf(k).map { case (b, r) =>
          (Seq("k" -> k.toLong, "b" -> b.toLong, "r" -> r.toLong), b, r)
        }
      },
      Seq("k", "b", "r"), tPpm, cost = Some(col("k") * hashCostPpm))
  }

  /** Shared planner core: the 101-point ppm curve per keyed (b, r)
    * entry, the FP/FN Riemann sums around `tPpm`, an additive cost
    * column, the TOTAL-ordered argmin over struct(score, keys...) and
    * the `chosen` flag — one implementation, so the two public planners
    * ([[sCurve]], [[kPlan]]) cannot drift in grid construction,
    * truncation order, or tie-break (the r15 lesson: the struct must
    * include every key or equal-score splits both flag chosen). */
  private def scoredGrid(spark: SparkSession,
      entries: Seq[(Seq[(String, Long)], Int, Int)], keyNames: Seq[String],
      tPpm: Long, cost: Option[org.apache.spark.sql.Column]): DataFrame = {
    val grid = spark.range(0L, 101L)
      .select((col("id") * 10000L).as("s_ppm"))
    val curves = entries.map { case (keys, b, r) =>
      grid.select(keys.map { case (n, v) => lit(v).as(n) } ++ Seq(
        col("s_ppm"), (lit(1000000L) - expr(missSql(b, r))).as("p_ppm")): _*)
    }.reduce(_.unionByName(_))
    val summed = curves.groupBy(keyNames.map(col): _*)
      .agg(sum(when(col("s_ppm") <= tPpm, col("p_ppm")).otherwise(0L))
          .as("fp_sum_ppm"),
        sum(when(col("s_ppm") > tPpm, lit(1000000L) - col("p_ppm"))
          .otherwise(0L)).as("fn_sum_ppm"))
    val sums = cost match {
      case Some(c) => summed.withColumn("hash_cost_ppm", c)
        .withColumn("score_ppm",
          col("fp_sum_ppm") + col("fn_sum_ppm") + col("hash_cost_ppm"))
      case None => summed.withColumn("score_ppm",
        col("fp_sum_ppm") + col("fn_sum_ppm"))
    }
    // |entries| rows — the broadcast scalar-join shape for the argmin
    val best = sums
      .agg(min(struct((col("score_ppm") +: keyNames.map(col)): _*)).as("best"))
      .select(col("best.score_ppm").as("best_score") +:
        keyNames.map(n => col(s"best.$n").as(s"best_$n")): _*)
    curves.join(broadcast(sums), keyNames)
      .crossJoin(broadcast(best))
      .withColumn("chosen",
        keyNames.map(n => col(n) === col(s"best_$n"))
          .foldLeft(col("score_ppm") === col("best_score"))(_ && _)
          .cast("long"))
      .drop("best_score" +: keyNames.map("best_" + _): _*)
  }
}
