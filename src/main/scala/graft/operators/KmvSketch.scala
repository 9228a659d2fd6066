package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** K-minimum-values (KMV) distinct-count sketch — the DETERMINISTIC member
  * of the sketch family (SURVEY §2.5 / q62's HLL is engine-pinned; KMV over
  * a shared 48-bit md5 prefix is bit-replayable by any engine, so the
  * estimate itself can be oracle-checked, not just bounded).
  *
  * Estimator (Bar-Yossef et al. 2002): with h(k) the k-th smallest distinct
  * hash mapped into [0, 2^48), D̂ = (k−1)·2^48 / h(k); relative error
  * ≈ 1/√(k−2). If a group has fewer than k distinct hashes the sketch IS
  * the exact distinct count.
  *
  * Scale design — no unbounded aggregation state anywhere: a naive per-group
  * "sort all distinct hashes, take row k" shuffles the full distinct set at
  * 100 TB. Instead, threshold refinement:
  *   1. one fixed-memory pass estimates each group's cardinality
  *      (`approx_count_distinct`, HLL, mergeable partials);
  *   2. a per-group hash threshold τ ≈ factor·k/est·2^48 keeps only the
  *      expected ~factor·k smallest hashes per group — the shuffle carries
  *      O(groups·k) rows no matter the input size, and the filter is a
  *      codegen'd long compare at the scan;
  *   3. the k-th min over survivors equals the TRUE k-th min whenever ≥ k
  *      hashes survive (the filter keeps *all* hashes below τ) — verified
  *      per group, with a deterministic τ escalation (×8) for any group the
  *      HLL pass under-guessed. The final answer is therefore exact —
  *      independent of the HLL estimate — which is what makes it
  *      oracle-checkable.
  *
  * Sketches are also mergeable artifacts: the k smallest of a union of
  * per-shard k-min sets equal the global k smallest (every global minimum
  * is a minimum of its own shard), so per-day/per-shard sketches combine
  * without touching raw data — KmvSketchSpec pins the property.
  */
object KmvSketch {

  /** Hash space size: 48-bit md5 prefix (the repo's shared uniform-hash
    * convention, bit-identical in DuckDB via ('0x' || substr(md5(…),1,12))). */
  val Space: Long = 1L << 48

  def hash48(c: Column, salt: String): Column =
    conv(substring(md5(concat(c.cast("string"), lit("|" + salt))), 1, 12),
      16, 10).cast("long")

  /** Per-group KMV sketch: the (up to) k smallest distinct 48-bit hashes of
    * `valCol`, as a sorted array — the persistable/mergeable artifact. */
  def sketch(df: DataFrame, grpCol: String, valCol: String, k: Int,
      salt: String = "kmv-v1"): DataFrame =
    survivors(df, grpCol, valCol, k, salt)
      .groupBy(col("grp").as(grpCol))
      .agg(slice(sort_array(collect_list(col("h"))), 1, k).as("mins"))

  /** Merge per-shard sketches (union of min-sets → k smallest) without
    * touching raw data. Input: (grpCol, mins) rows, multiple per group. */
  def merge(sketches: DataFrame, grpCol: String, k: Int): DataFrame =
    sketches
      .select(col(grpCol), explode(col("mins")).as("h"))
      .groupBy(col(grpCol))
      .agg(slice(array_sort(array_distinct(collect_list(col("h")))), 1, k)
        .as("mins"))

  /** SET-OPERATION estimates from two same-salt, same-k sketch frames
    * joined on `grpCol` — the Theta-sketch composition (Beyer et al.
    * SIGMOD 2007): the k smallest distinct hashes of the combined
    * min-sets are exactly the KMV of A ∪ B (the merge law), so
    * {{{
    *   Û        = (k−1)·2^48 div h(k)   over the combined min-set L
    *   Ĵ_ppm    = (matches·10^6) div |L|,  matches = |{h∈L : h ∈ both}|
    *   |A∩B|^   = (matches·Û) div |L|
    * }}}
    * — the join-size / audience-overlap estimator a planner consults
    * before committing to a 100 TB join, computed from two k-element
    * artifacts without touching either raw set. When |A∪B| < k the
    * combined sketch IS the union and every estimate is EXACT
    * (KmvSketchSpec pins the boundary and the estimator arithmetic).
    * All work happens on ≤ 2k-element arrays per group. */
  def setOpsEstimate(a: DataFrame, b: DataFrame, grpCol: String,
      k: Int): DataFrame =
    a.select(col(grpCol), col("mins").as("amins"))
      .join(b.select(col(grpCol), col("mins").as("bmins")), grpCol)
      .select(col(grpCol), col("amins"), col("bmins"),
        expr(s"slice(array_sort(array_distinct(concat(amins, bmins))), 1, $k)")
          .as("u"))
      // a group whose values were all NULL on both sides sketches to an
      // EMPTY min-set (hash48 of NULL is NULL): element_at(u, 0) would
      // throw and the ppm ratios would divide by n_u = 0 — an empty
      // sketch estimates nothing, so the group is dropped, not errored
      .filter(size(col("u")) >= 1)
      .select(col(grpCol),
        size(col("u")).cast("long").as("n_u"),
        element_at(col("u"), size(col("u"))).as("kth_min"),
        expr("CAST(size(filter(u, h -> array_contains(amins, h) AND " +
          "array_contains(bmins, h))) AS LONG)").as("matches"))
      .select(col(grpCol), col("n_u"), col("kth_min"), col("matches"),
        when(col("n_u") < k, col("n_u"))
          .otherwise(expr(s"${(k - 1).toLong * Space}L DIV kth_min"))
          .as("union_est"))
      .withColumn("jac_est_ppm", expr("(matches * 1000000) div n_u"))
      .withColumn("inter_est", expr("(matches * union_est) div n_u"))

  /** CONTAINMENT estimate C(A, B) = |A∩B| / |A| from two same-salt,
    * same-k sketch frames joined on `grpCol` — the ASYMMETRIC sibling of
    * [[setOpsEstimate]]'s Jaccard. Theta-ratio estimator over the
    * combined k-min cut L (a uniform sample of A ∪ B; every in-cut hash
    * is decidable against both min-sets because the cut threshold is ≤
    * both sketches' k-th minima). LIMITATION (inherent to fixed-k
    * sketches, and the reason [[fracSketch]] exists): the A-side sample
    * share is ~k·|A| / |A∪B|, so with |A| ≪ |B| — the contamination-
    * screening shape — the estimator degenerates (few or zero sampled
    * A-hashes; groups with none are dropped). Use it for comparable-
    * size operands; use the scaled sketch for small-in-large screening.
    * {{{
    *   n_in_a  = |{h ∈ L : h ∈ A}|          (A's share of the sample)
    *   matches = |{h ∈ L : h ∈ A ∧ h ∈ B}|
    *   Ĉ_ppm   = (matches · 10^6) div n_in_a
    * }}}
    * Exactness corners (spec-pinned): |A ∪ B| < k ⇒ L is the whole
    * union and Ĉ is exact; A ⊆ B ⇒ every sampled A-hash is a match ⇒
    * Ĉ = 10^6 EXACTLY at any k (the subset theorem — a full-containment
    * screen never false-negatives); A ∩ B = ∅ ⇒ Ĉ = 0 exactly. Groups
    * with an empty cut or no sampled A-hash are dropped (nothing to
    * estimate — the [[setOpsEstimate]] convention). All work on
    * ≤ 2k-element arrays per group; sketch the test set ONCE, screen
    * every shard without re-reading either side's raw data. */
  def containmentEstimate(a: DataFrame, b: DataFrame, grpCol: String,
      k: Int): DataFrame =
    a.select(col(grpCol), col("mins").as("amins"))
      .join(b.select(col(grpCol), col("mins").as("bmins")), grpCol)
      .select(col(grpCol), col("amins"), col("bmins"),
        expr(s"slice(array_sort(array_distinct(concat(amins, bmins))), 1, $k)")
          .as("u"))
      .filter(size(col("u")) >= 1)
      .select(col(grpCol),
        size(col("u")).cast("long").as("n_u"),
        expr("CAST(size(filter(u, h -> array_contains(amins, h))) AS LONG)")
          .as("n_in_a"),
        expr("CAST(size(filter(u, h -> array_contains(amins, h) AND " +
          "array_contains(bmins, h))) AS LONG)").as("matches"))
      .filter(col("n_in_a") >= 1L)
      .withColumn("cont_est_ppm", expr("(matches * 1000000) div n_in_a"))

  /** FRACTIONAL (scaled) min-hash sketch — FracMinHash (Irber et al.
    * 2022, the sourmash "scaled" design; Broder 1997's mod-m sketch):
    * keep EVERY distinct hash below the fixed threshold
    * τ = 2^48 · sPpm / 10^6, i.e. a deterministic `sPpm`-fraction sample
    * of the value universe. Unlike the fixed-k [[sketch]], the size
    * grows with the set (≈ |set| · s) — the price of the property
    * fixed-k cannot offer: two frac sketches under the SAME τ decide
    * membership exactly for every kept hash, so the asymmetric
    * containment C(A, B) = |A∩B|/|A| is estimable with an A-proportional
    * sample even when |A| ≪ |B| — the benchmark-in-corpus contamination
    * shape where the k-min cut's A-share collapses (see
    * [[containmentEstimate]]'s limitation note). Output: (grpCol,
    * fmins) sorted distinct kept hashes.
    *
    * 100 TB shape: the per-group ARRAY is the portable artifact for
    * bounded sides (benchmark docs, capped shards) — pick `sPpm` so
    * |set|·s fits an artifact (sourmash ships s ≈ 10^-3). For groups
    * where even the sampled set is huge, skip the array: the τ filter's
    * OUTPUT ROWS (grp, h) are the same sample in relational form, and
    * [[fracContainment]]'s counts are then plain join+groupBy
    * aggregations (exactly the shape q253's oracle replays) — no
    * unbounded per-group aggregation state anywhere. */
  def fracSketch(df: DataFrame, grpCol: String, valCol: String,
      sPpm: Long, salt: String = "kmv-v1"): DataFrame = {
    require(sPpm > 0 && sPpm <= 1000000L, s"sPpm out of (0, 1e6]: $sPpm")
    val tau = Space / 1000000L * sPpm + Space % 1000000L * sPpm / 1000000L
    df.select(col(grpCol), hash48(col(valCol), salt).as("h"))
      .filter(col("h") < tau)
      .groupBy(col(grpCol))
      .agg(sort_array(collect_set(col("h"))).as("fmins"))
  }

  /** Merge per-shard frac sketches: the distinct UNION of kept hashes.
    * Because the τ cut is a fixed threshold (not a rank like KMV's
    * k-th min), it COMMUTES with set union — merged shards equal the
    * sketch of the union EXACTLY, hash for hash (spec-pinned), not
    * approximately. The 100 TB shape this buys: sketch every shard
    * where it lives, union the tiny artifacts, never re-read a shard —
    * and any downstream containment screen over merged sketches is
    * IDENTICAL to one over a from-scratch whole-corpus sketch. */
  def fracMerge(sketches: DataFrame, grpCol: String): DataFrame =
    sketches.groupBy(col(grpCol))
      .agg(sort_array(array_distinct(flatten(collect_list(col("fmins")))))
        .as("fmins"))

  /** Containment C(A, B) = |A∩B| / |A| from two same-τ frac sketches
    * joined on `grpCol`:
    * {{{
    *   n_a     = |FA|                       (A's kept hashes)
    *   matches = |FA ∩ FB|                  (exact below the shared τ)
    *   Ĉ_ppm   = (matches · 10^6) div n_a
    * }}}
    * Exactness corners (spec-pinned): A ⊆ B ⇒ FA ⊆ FB ⇒ Ĉ = 10^6
    * EXACTLY at any scale (a full-containment screen never
    * false-negatives); A ∩ B = ∅ ⇒ 0 exactly; sPpm = 10^6 keeps
    * everything ⇒ exact containment. Groups whose A kept no hash are
    * dropped (raise sPpm). All work on per-group arrays. */
  def fracContainment(a: DataFrame, b: DataFrame,
      grpCol: String): DataFrame =
    a.select(col(grpCol), col("fmins").as("fa"))
      .join(b.select(col(grpCol), col("fmins").as("fb")), grpCol)
      .select(col(grpCol),
        size(col("fa")).cast("long").as("n_a_frac"),
        size(array_intersect(col("fa"), col("fb"))).cast("long")
          .as("matches"))
      .filter(col("n_a_frac") >= 1L)
      .withColumn("cont_est_ppm", expr("(matches * 1000000) div n_a_frac"))

  /** Distinct-count estimate from a sketch frame: exact count when the
    * group holds fewer than k hashes, else (k−1)·2^48 DIV h(k). Integer
    * arithmetic only — no float ever enters the estimate. */
  def estimate(sketchDf: DataFrame, grpCol: String, k: Int): DataFrame =
    sketchDf.select(col(grpCol), size(col("mins")).as("n_mins"),
        element_at(col("mins"), size(col("mins"))).as("kth"))
      .select(col(grpCol), col("kth").as("kth_min"),
        when(col("n_mins") < k, col("n_mins").cast("long"))
          .otherwise(expr(s"${(k - 1).toLong * Space}L DIV kth"))
          .as("est_distinct"))

  /** One-call path: per-group k-th min + estimate, shuffling only the
    * thresholded survivor set. Output: (grpCol, kth_min, est_distinct). */
  def estimateDistinct(df: DataFrame, grpCol: String, valCol: String, k: Int,
      salt: String = "kmv-v1"): DataFrame = {
    val rk = Window.partitionBy(col("grp")).orderBy(col("h"))
    survivors(df, grpCol, valCol, k, salt)
      .withColumn("rn", row_number().over(rk))
      .withColumn("nd", count(lit(1)).over(Window.partitionBy(col("grp"))))
      .filter(col("rn") === least(lit(k.toLong), col("nd")))
      .select(col("grp").as(grpCol), col("h").as("kth_min"),
        when(col("nd") < k, col("nd"))
          .otherwise(expr(s"${(k - 1).toLong * Space}L DIV h"))
          .as("est_distinct"))
  }

  /** All distinct (group, hash) pairs below a per-group threshold chosen so
    * that ≥ k survive (or the group's full distinct set if smaller), with
    * deterministic escalation when the cardinality guess was low. The
    * per-group verification collects one row per GROUP (sketch grouping
    * keys are low-cardinality by design — event types, languages, splits),
    * never per value. */
  private def survivors(df: DataFrame, grpCol: String, valCol: String,
      k: Int, salt: String): DataFrame = {
    val hashed = df.select(col(grpCol).as("grp"),
      hash48(col(valCol), salt).as("h"))
    val est = hashed.groupBy("grp")
      .agg(approx_count_distinct(col("h")).as("est0"))
      .localCheckpoint(true) // one HLL pass, reused across escalations
    var factor = 4L
    while (true) {
      // τ = min(2^48, factor·k·2^48 / est0): expected factor·k survivors
      val thr = est.select(col("grp"),
        least(lit(Space),
          expr(s"${factor * k}L * ${Space}L DIV greatest(est0, 1L)"))
          .as("thr"))
      val surv = hashed.join(broadcast(thr), "grp")
        .filter(col("h") < col("thr"))
        .select(col("grp"), col("h"), col("thr"))
        .distinct()
      // a group is proven only if ≥ k survived OR its threshold was open
      // (τ = 2^48 ⇒ survivors = the full distinct set)
      val short = surv.groupBy(col("grp"), col("thr"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") < k && col("thr") < Space)
        .limit(1).collect()
      if (short.isEmpty) return surv.select(col("grp"), col("h"))
      factor *= 8
    }
    throw new IllegalStateException("unreachable")
  }
}
