package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier/ranker EVALUATION over integer scores — the measurement step
  * a curation pipeline runs after training a quality filter (q127/q153
  * produce scores; this answers "how well does the score separate the
  * classes?") before committing to a filtering threshold.
  *
  * AUC here is the exact Mann–Whitney U statistic: the probability that a
  * uniformly drawn positive outranks a uniformly drawn negative, ties
  * counting one half. Everything stays in integer arithmetic — scores are
  * required to be integral (the repo-wide ppm/ppb fixed-point discipline),
  * and the half-credit tie term is kept doubled (`u2 = 2·U`) so no
  * fraction ever materializes until the final ppm division.
  *
  * Reference behavioral analogue: the reference ranks/filter-scores
  * documents with model scores (assets/recent_history.py's quality and
  * similarity ranking stages); evaluating such a ranker against labels is
  * the standard published companion step (Hanley & McNeil 1982 — AUC via
  * rank sums), re-expressed as distributed aggregates.
  *
  * Scale shape (100 TB story): the corpus collapses FIRST to a
  * per-(group, score) histogram — one shuffle whose output cardinality is
  * bounded by |groups| × |distinct scores| (ppm scores ⇒ ≤ 10^6 per
  * group), never by row count. The pairwise U is then a running sum over
  * that histogram: a window per group over distinct scores. No pair of
  * documents is ever joined — U counts pairs without enumerating them.
  */
object Eval {

  /** Per-group exact AUC of an integral score column against a 0/1
    * positive flag.
    *
    * For each group g:
    * {{{
    *   u2(g)  = Σ_s pos(s) · (2·negBelow(s) + neg(s))        // 2·U, exact
    *   aucPpm = (10^6 · u2) div (2 · nPos · nNeg)            // truncating
    * }}}
    * where the sum runs over distinct score values s in ascending order.
    * Groups with no positives or no negatives keep `u2` but emit NULL
    * `auc_ppm` (undefined rather than silently 0 or 1).
    *
    * Output: one row per group —
    * `(group, n_pos, n_neg, u2, auc_ppm)`, all BIGINT.
    */
  def rankAucByGroup(df: DataFrame, groupCol: String, scoreCol: String,
      posCol: String): DataFrame = {
    val hist = df
      .groupBy(col(groupCol), col(scoreCol).cast("long").as("s"))
      .agg(
        sum(when(col(posCol) =!= 0, 1L).otherwise(0L)).as("pos_n"),
        sum(when(col(posCol) =!= 0, 0L).otherwise(1L)).as("neg_n"))
    // negBelow = negatives with strictly smaller score: running sum over
    // the ascending distinct-score order, shifted by the current bucket
    val w = Window.partitionBy(col(groupCol)).orderBy(col("s"))
    val withBelow = hist.withColumn("neg_below",
      coalesce(sum(col("neg_n")).over(w.rowsBetween(
        Window.unboundedPreceding, -1)), lit(0L)))
    withBelow
      .groupBy(col(groupCol))
      .agg(
        sum(col("pos_n")).as("n_pos"),
        sum(col("neg_n")).as("n_neg"),
        sum(col("pos_n") * (col("neg_below") * 2L + col("neg_n"))).as("u2"))
      .withColumn("auc_ppm",
        when(col("n_pos") > 0 && col("n_neg") > 0,
          expr("(u2 * 1000000) div (2 * n_pos * n_neg)"))
          .otherwise(lit(null).cast("long")))
      .select(col(groupCol), col("n_pos"), col("n_neg"), col("u2"),
        col("auc_ppm"))
  }

  /** Per-group exact average precision (area under the PR curve in the
    * standard non-interpolated Σ prec@k sense — Zhu 2004 / trec_eval's
    * AP) of an integral score against a 0/1 positive flag, ranking by
    * (score DESC, id ASC) — the deterministic doc-id tie-break trec_eval
    * uses, so the statistic is a pure function of the data.
    *
    * {{{
    *   rank(d) = nAbove(s_d) + tieSeq(d)                 // 1-based
    *   tp(d)   = posAbove(s_d) + tiePos(d)
    *   apE9    = Σ_{d: pos} (tp(d)·10^9) div rank(d)     // per-term floor
    *   ap_ppm  = apE9 div (n_pos·10^3)
    * }}}
    * The per-term floor division makes apE9 a deterministic integer
    * pinned EXACTLY in both engines (the repo float policy: never compare
    * on a raw double); the ≤ n_pos·10^-9-scale floor bias is far below
    * any decision threshold.
    *
    * Scale shape (100 TB story): no global per-group sort. The
    * above-score prefix terms come from the q178 histogram (one shuffle
    * onto |groups|·|distinct scores| ≤ 10^6·|groups| cells, window over
    * distinct scores); the tie-local terms are a window partitioned by
    * (group, score) — bounded by the largest tie block, never the
    * corpus. Groups without positives emit NULL ap_ppm. */
  def averagePrecisionByGroup(df: DataFrame, groupCol: String,
      idCol: String, scoreCol: String, posCol: String): DataFrame = {
    val base = df.select(col(groupCol), col(idCol).as("d_id"),
      col(scoreCol).cast("long").as("s"),
      when(col(posCol) =!= 0, 1L).otherwise(0L).as("is_pos"))
    val hist = base.groupBy(col(groupCol), col("s"))
      .agg(sum(col("is_pos")).as("pos_n"),
        count(lit(1)).as("n"))
    val wDesc = Window.partitionBy(col(groupCol)).orderBy(col("s").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefix = hist
      .withColumn("pos_above", coalesce(sum(col("pos_n")).over(wDesc), lit(0L)))
      .withColumn("n_above", coalesce(sum(col("n")).over(wDesc), lit(0L)))
      .select(col(groupCol), col("s"), col("pos_above"), col("n_above"))
    val wTie = Window.partitionBy(col(groupCol), col("s")).orderBy(col("d_id"))
    val ranked = base.join(prefix, Seq(groupCol, "s"))
      .withColumn("tie_seq", row_number().over(wTie).cast("long"))
      .withColumn("tie_pos", sum(col("is_pos")).over(wTie))
      .withColumn("rank", col("n_above") + col("tie_seq"))
      .withColumn("tp", col("pos_above") + col("tie_pos"))
    ranked.groupBy(col(groupCol))
      .agg(
        sum(col("is_pos")).as("n_pos"),
        (count(lit(1)) - sum(col("is_pos"))).as("n_neg"),
        sum(when(col("is_pos") =!= 0L,
          expr("(tp * 1000000000) div rank")).otherwise(0L)).as("ap_e9_sum"))
      .withColumn("ap_ppm",
        when(col("n_pos") > 0, expr("ap_e9_sum div (n_pos * 1000)"))
          .otherwise(lit(null).cast("long")))
  }

  /** Reliability diagram + expected calibration error over ppm
    * confidences — AUC's companion: AUC measures RANKING quality, ECE
    * measures whether the score's VALUE means what it claims
    * (Naeini et al. 2015's binned estimator). Equal-width confidence
    * buckets; per bucket the mean confidence vs the observed positive
    * rate, both in ppm.
    *
    * Integer-exactness trick: the standard
    * `ECE = Σ_b (n_b/N)·|acc_b − conf_b|` has the per-bucket n_b divide
    * out — `ECE_ppm = (Σ_b |acc_sum_b − conf_sum_b|) div N` on the raw
    * ppm SUMS, so nothing fractional ever materializes.
    *
    * Scale shape: one partial-aggregable groupBy onto ≤ `buckets` keys,
    * then a broadcast 1-row totals join (the q113 shape) — row count
    * never shuffles. */
  def calibration(df: DataFrame, confCol: String, posCol: String,
      buckets: Int = 10): DataFrame = {
    require(buckets >= 2, "need at least two buckets")
    val perBucket = df.select(
        least(lit(buckets - 1L),
          expr(s"(CAST($confCol AS BIGINT) * $buckets) div 1000000")).as("bucket"),
        col(confCol).cast("long").as("conf"),
        when(col(posCol) =!= 0, 1000000L).otherwise(0L).as("acc"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("conf")).as("conf_sum"),
        sum(col("acc")).as("acc_sum"))
    val totals = perBucket.agg(sum(col("n")).as("n_total"),
      sum(abs(col("conf_sum") - col("acc_sum"))).as("gap_total"))
    perBucket.crossJoin(broadcast(totals))
      .select(col("bucket"), col("n"),
        expr("conf_sum div n").as("conf_ppm"),
        expr("acc_sum div n").as("acc_ppm"),
        abs(col("conf_sum") - col("acc_sum")).as("gap_abs"),
        expr("gap_total div n_total").as("ece_ppm"))
  }

  /** Corpus-level MODIFIED n-gram precision — the BLEU core (Papineni et
    * al. ACL 2002): per pair and n, candidate n-gram counts are CLIPPED
    * at the reference's count for the same gram, then matched and total
    * counts sum over the corpus per group:
    * {{{
    *   p_n = Σ_pair Σ_gram min(cand(gram), ref(gram)) / Σ_pair Σ_gram cand(gram)
    * }}}
    * reported as `(match_n, total_n, prec_ppm)` for n = 1..maxN, plus the
    * candidate/reference token totals and their ppm ratio. Documented
    * rational deviation from full BLEU (the idf_m convention): the
    * geometric mean and the `exp(1 − r/c)` brevity penalty never land on
    * the integer grid, so the pinned statistics are the per-n precisions
    * and `len_ratio_ppm = (10^6·c) div r` — monotone in the BP argument,
    * which is what a generation-quality gate thresholds on.
    *
    * Scale shape (r18): the clip's two sides live in the SAME input row,
    * so the whole gram pipeline is the codegen'd per-row
    * `word_gram_clip` kernel (count the candidate's k-token windows
    * into a hash map, walk the reference's windows decrementing — the
    * decrement total IS Σ min); no per-gram rows exist at all, where
    * the previous shape shuffled a (pair, n, gram, count) stream per
    * side and equi-joined them — corpus-sized at 100 TB. The only
    * shuffled frames are the |groups|·maxN-row stats and the
    * |groups|-row token totals. */
  def ngramPrecision(pairs: DataFrame, groupCol: String, idCol: String,
      candCol: String, refCol: String, maxN: Int = 4): DataFrame = {
    require(maxN >= 1 && maxN <= 8, s"maxN must be in [1,8], got $maxN")
    val base = pairs.select(col(groupCol), col(idCol).as("pair_id"),
      split(col(candCol), " ").as("c_arr"),
      split(col(refCol), " ").as("r_arr"))
    val lens = base.groupBy(col(groupCol)).agg(
      sum(size(col("c_arr")).cast("long")).as("c_tokens"),
      sum(size(col("r_arr")).cast("long")).as("r_tokens"))
    base.select(col(groupCol),
        posexplode(array((1 to maxN).map(n =>
          graft.functions.word_gram_clip(col("c_arr"), col("r_arr"), n)): _*)))
      .select(col(groupCol), (col("pos") + 1).as("n"),
        col("col.match_n").as("m"), col("col.c_total").as("ct"))
      .groupBy(col(groupCol), col("n"))
      .agg(sum(col("m")).as("match_n"), sum(col("ct")).as("total_n"))
      // parity with the candidate-side-driven clip join (and the
      // oracle's cg-rooted LEFT JOIN): a (group, n) appears only when
      // some doc has a candidate gram of that order
      .filter(col("total_n") > 0)
      .withColumn("prec_ppm",
        when(col("total_n") > 0, expr("(match_n * 1000000) div total_n"))
          .otherwise(lit(null).cast("long")))
      .join(lens, Seq(groupCol))
      .withColumn("len_ratio_ppm",
        when(col("r_tokens") > 0, expr("(c_tokens * 1000000) div r_tokens"))
          .otherwise(lit(null).cast("long")))
  }

  /** Corpus-level chrF2 (Popović, WMT 2015) — the CHARACTER n-gram F-β
    * companion to [[ngramPrecision]]'s word-level BLEU core, the
    * generation metric that survives tokenizer drift and morphology
    * (its original motivation). Whitespace is stripped first (the chrF
    * convention), then per pair and n ∈ 1..maxN candidate char-n-gram
    * counts are clipped at the reference's count; statistics sum over
    * the corpus per (group, n):
    * {{{
    *   P_n = Σ min(cand, ref) / Σ cand      R_n = Σ min(cand, ref) / Σ ref
    *   F2_n = 5·P_n·R_n / (4·P_n + R_n)     (β = 2: recall weighted 4×)
    * }}}
    * all on the ppm grid — with P, R ≤ 10^6 the product 5·P·R ≤ 5·10^12
    * never leaves BIGINT. `chrf2_ppm` is the per-group mean of F2 over
    * the n orders (absent orders — no n-grams on either side — count 0,
    * the empty-segment convention sacreBLEU applies). Documented
    * rational deviation (the q205 stance): statistics aggregate over the
    * corpus before the F ratio, not per-segment-then-averaged — the
    * integer-grid corpus variant.
    *
    * Scale shape (r18): the clip's two sides live in the SAME input row,
    * so the whole gram pipeline collapses into the codegen'd per-row
    * `char_gram_clip` kernel — count the candidate's grams into a
    * zero-copy hash map, walk the reference's grams decrementing; the
    * decrement total IS Σ min(c_cnt, r_cnt). No per-gram rows exist at
    * all (the previous side-tagged single-shuffle shape still streamed
    * ~2·Σ|doc|·maxN gram rows through the exchange — a corpus-sized
    * shuffle at 100 TB); the only shuffled frame is the
    * |groups|·maxN-row partial-aggregated stats. Measured at sf0.1:
    * q239 8.7 → ~1s raw. */
  def chrF(pairs: DataFrame, groupCol: String, idCol: String,
      candCol: String, refCol: String, maxN: Int = 6): DataFrame = {
    require(maxN >= 1 && maxN <= 8, s"maxN must be in [1,8], got $maxN")
    val base = pairs.select(col(groupCol), col(idCol).as("pair_id"),
      regexp_replace(col(candCol), " ", "").as("c_str"),
      regexp_replace(col(refCol), " ", "").as("r_str"))
    val stats = base.select(col(groupCol),
        posexplode(array((1 to maxN).map(n =>
          graft.functions.char_gram_clip(col("c_str"), col("r_str"), n)): _*)))
      .select(col(groupCol), (col("pos") + 1).as("n"),
        col("col.match_n").as("m"), col("col.c_total").as("ct"),
        col("col.r_total").as("rt"))
      .groupBy(col(groupCol), col("n"))
      .agg(sum(col("m")).as("match_n"), sum(col("ct")).as("c_total_n"),
        sum(col("rt")).as("r_total_n"))
      // parity with the two-sided gram union (and the oracle's FULL
      // OUTER of the per-side gram aggregates): a (group, n) appears
      // only when SOME doc has a gram of that order on either side
      .filter(col("c_total_n") > 0 || col("r_total_n") > 0)
      .withColumn("prec_ppm", when(col("c_total_n") > 0,
        expr("(match_n * 1000000) div c_total_n")).otherwise(lit(null).cast("long")))
      .withColumn("rec_ppm", when(col("r_total_n") > 0,
        expr("(match_n * 1000000) div r_total_n")).otherwise(lit(null).cast("long")))
      .withColumn("f2_ppm", when(
        col("prec_ppm").isNotNull && col("rec_ppm").isNotNull &&
          (expr("4 * prec_ppm + rec_ppm") > 0),
        expr("(5 * prec_ppm * rec_ppm) div (4 * prec_ppm + rec_ppm)"))
        .otherwise(lit(null).cast("long")))
      // ≤ |groups|·maxN rows — pin the tiny frame so the per-group mean's
      // self-join doesn't re-run the whole gram chain (the clip join and
      // the n-gram explodes are the heavy part; measured 13.5 → ~4.5s at
      // sf0.1). A bounded materialized frame is exactly the case where
      // pinning cannot hurt exchange reuse (the q203 counter-lesson was a
      // corpus-sized cache).
      .localCheckpoint(true)
    stats.join(
      stats.groupBy(col(groupCol))
        .agg(expr(s"sum(coalesce(f2_ppm, 0L)) div ${maxN}L").as("chrf2_ppm")),
      Seq(groupCol))
  }
}
