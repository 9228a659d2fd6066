package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators beyond per-document scoring: span-level exact
  * dedup (the C4 "repeated span" rule generalized to fixed token windows),
  * deterministic hash-bucketed train/valid/test splitting, self-trained
  * unigram language-model scoring (the KenLM-style perplexity proxy a
  * pretraining filter ranks documents by), and the sequential quality
  * filter funnel (Gopher/RefinedWeb rule cascade with first-failing-rule
  * attribution).
  *
  * All four are declarative DataFrame transforms: scale is scan + a
  * bounded number of key shuffles, never a corpus self-join or a
  * driver-side loop.
  */
object Curation {

  /** Span-level exact-dedup statistics: the text is cut into consecutive
    * `spanTokens`-token windows (stride = width, last span ragged), every
    * span occurrence is keyed by its md5 digest, and only the globally
    * FIRST occurrence (lexicographic min of (id, position), computed as
    * `min(struct(id, pos))` — overflow-free at any id/pos magnitude) of
    * each distinct span is kept — the concatenate-then-cut twin of C4's
    * three-sentence-span rule for corpora without sentence structure.
    *
    * Output per document: `n_spans`, `n_dup_spans` (occurrences whose span
    * text appeared earlier in corpus order), `n_tokens_kept` (tokens
    * surviving span removal).
    *
    * Scale shape: one shuffle on the 128-bit span digest (the groupBy and
    * the digest equi-join ship 32-byte keys, not span text — q40's
    * content-hash trick at sub-document granularity), then one aggregate
    * by document id. No pairwise comparison exists anywhere: a span
    * duplicated a million times is one grouped row.
    *
    * (The DuckDB oracles for q111/q118 express the same argmin as
    * `min(id·100000 + pos)` — equivalent whenever pos < 100000, which the
    * test corpora satisfy by orders of magnitude; the engine side carries
    * no such constraint.)
    *
    * `stride` < `spanTokens` gives OVERLAPPING windows — the shifted-dup
    * catcher (a duplicate region misaligned with the stride-8 grid still
    * shares some window with its source). With overlap, `n_tokens_kept`
    * sums first-occurrence window lengths and so double-counts tokens
    * shared by adjacent kept windows — read it as a retention weight, not
    * a token count, in that regime.
    */
  def spanDedupStats(df: DataFrame, idCol: String, textCol: String,
      spanTokens: Int = 8, strideOpt: Option[Int] = None): DataFrame = {
    val stride = strideOpt.getOrElse(spanTokens)
    require(stride >= 1 && stride <= spanTokens,
      s"stride must be in [1, spanTokens]; got $stride / $spanTokens")
    val toks = df.select(col(idCol), split(col(textCol), " ").as("w"))
    // window offsets i·stride for i in [0, ceil(max(n − spanTokens, 0) / stride)];
    // the final window is ragged when stride does not divide the tail
    val spans = toks
      .select(col(idCol), posexplode(expr(
        s"""transform(sequence(0, cast(ceil(greatest(size(w) - $spanTokens, 0) / ${stride}.0) as int)),
           |          i -> concat_ws(' ', slice(w, i * $stride + 1, $spanTokens)))"""
          .stripMargin)))
      .select(col(idCol), col("pos"),
        md5(col("col")).as("h"),
        size(split(col("col"), " ")).cast("long").as("span_len"))
    // first occurrence = lexicographic min of (id, pos) as a struct — the
    // same argmin canonicalizeBy uses for its per-cluster argmax; unlike an
    // arithmetic encoding it cannot overflow or collide at any magnitude
    val occ = struct(col(idCol).cast("long").as("oid"),
      col("pos").cast("long").as("opos"))
    val first = spans.groupBy(col("h")).agg(min(occ).as("first_occ"))
    spans.join(first, "h")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).cast("long").as("n_spans"),
        sum(when(occ =!= col("first_occ"), 1L).otherwise(0L))
          .cast("long").as("n_dup_spans"),
        sum(when(occ === col("first_occ"), col("span_len")).otherwise(0L))
          .cast("long").as("n_tokens_kept"))
  }

  /** MAXIMAL duplicated-region extraction — the per-document output of
    * exact substring deduplication (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better": report the duplicated
    * RANGES, not just counts, so a writer can splice them out). Built
    * from the same overlapping-window machinery as [[spanDedupStats]]:
    * every `spanTokens`-wide window at `stride` offsets is digest-keyed;
    * occurrences that are not the global first occurrence of their digest
    * mark the token interval `[pos·stride, pos·stride + len)` as
    * duplicated; per document, overlapping/touching intervals merge into
    * maximal regions (gaps-and-islands over a running max of interval
    * ends).
    *
    * Output: one row per (doc, region) — `region_no` (1-based in start
    * order), `start_tok`/`end_tok` (token half-open range), `n_tokens`,
    * `n_windows` (dup windows merged into the region).
    *
    * Scale shape: the digest group/join ships 32-byte keys exactly like
    * [[spanDedupStats]]; the island pass is ONE window per document over
    * that document's dup windows only (≤ len/stride rows — document-
    * bounded, not corpus-bounded), then a (doc, region) aggregate. A
    * full suffix array would find variable-length duplicates exactly;
    * the stride-grid approximation guarantees detection of every
    * duplicated run of ≥ `spanTokens + stride − 1` tokens whose two
    * occurrences sit at offsets congruent mod `stride` (such a run
    * always contains a window grid-aligned in BOTH occurrences) —
    * smaller stride catches more shifts, stride 1 catches all — while
    * staying pure shuffle/window algebra. */
  def dupRegions(df: DataFrame, idCol: String, textCol: String,
      spanTokens: Int = 8, stride: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(stride >= 1 && stride <= spanTokens,
      s"stride must be in [1, spanTokens]; got $stride / $spanTokens")
    val toks = df.select(col(idCol), split(col(textCol), " ").as("w"))
    val spans = toks
      .select(col(idCol), posexplode(expr(
        s"""transform(sequence(0, cast(ceil(greatest(size(w) - $spanTokens, 0) / ${stride}.0) as int)),
           |          i -> concat_ws(' ', slice(w, i * $stride + 1, $spanTokens)))"""
          .stripMargin)))
      .select(col(idCol), col("pos"),
        md5(col("col")).as("h"),
        size(split(col("col"), " ")).cast("long").as("span_len"))
    val occ = struct(col(idCol).cast("long").as("oid"),
      col("pos").cast("long").as("opos"))
    val first = spans.groupBy(col("h")).agg(min(occ).as("first_occ"))
    val dups = spans.join(first, "h")
      .filter(occ =!= col("first_occ"))
      .select(col(idCol),
        (col("pos") * stride).cast("long").as("start_tok"),
        (col("pos") * stride + col("span_len")).cast("long").as("end_tok"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("start_tok"))
    val islands = dups
      .withColumn("prev_max_end",
        max(col("end_tok")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("is_new",
        when(col("prev_max_end").isNull ||
          col("start_tok") > col("prev_max_end"), 1L).otherwise(0L))
      .withColumn("region_no", sum(col("is_new")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
    islands.groupBy(col(idCol), col("region_no"))
      .agg(
        min(col("start_tok")).as("start_tok"),
        max(col("end_tok")).as("end_tok"),
        count(lit(1)).as("n_windows"))
      .withColumn("n_tokens", col("end_tok") - col("start_tok"))
      .select(col(idCol), col("region_no"), col("start_tok"),
        col("end_tok"), col("n_tokens"), col("n_windows"))
  }

  /** Skip-gram (center, context) pair counts — the word2vec data-prep
    * stage (Mikolov et al. 2013): frequent-token SUBSAMPLING, sequence
    * compaction, a ±`window` pairing over the compacted order, and a
    * corpus-wide co-occurrence count (what an embedding trainer actually
    * consumes).
    *
    * Subsampling is the DETERMINISTIC rational variant of Mikolov's
    * `P(keep) = sqrt(t/f)`-family rule: `keep_ppm = 10^6` when the token
    * frequency `f_ppm ≤ thresholdPpm`, else `(thresholdPpm·10^6) div
    * f_ppm` — monotone-decreasing in frequency like the original, but
    * exactly replayable (no sqrt); the per-OCCURRENCE draw is the
    * repo-standard md5 integer in [0, 10^6). Pairing runs over the
    * compacted (post-subsample) order, as word2vec does — dropping a
    * frequent token WIDENS the effective context of its neighbors.
    *
    * Scale shape: frequency/keep tables are vocabulary-sized (AQE
    * broadcasts them); the draw is per-row columnar; compaction is one
    * window per document; pairing is a per-document band self-join on
    * the compacted index (≤ 2·window rows each); the final count is one
    * shuffle keyed by token pair. Nothing is corpus × corpus. */
  def skipgramPairs(df: DataFrame, idCol: String, textCol: String,
      window: Int = 2, thresholdPpm: Long = 1000L, seed: String = "sg-v1",
      minCount: Long = 3L): DataFrame = {
    import org.apache.spark.sql.expressions.{Window => W}
    val toks = df.select(col(idCol).as("doc"),
        posexplode(split(col(textCol), " ")))
      .select(col("doc"), col("pos"), col("col").as("tok"))
    val freq = toks.groupBy(col("tok")).agg(count(lit(1)).as("freq"))
    val tot = freq.agg(sum(col("freq")).as("n"))
    val keep = freq.crossJoin(broadcast(tot))
      .select(col("tok"), expr("(freq * 1000000) div n").as("f_ppm"))
      .select(col("tok"),
        when(col("f_ppm") <= thresholdPpm, lit(1000000L))
          .otherwise(expr(s"(${thresholdPpm}L * 1000000L) div f_ppm"))
          .as("keep_ppm"))
    val drawn = toks.join(keep, "tok")
      .withColumn("u_ppm",
        conv(substring(md5(concat(col("doc").cast("string"), lit("|"),
          col("pos").cast("string"), lit("|" + seed))), 1, 12), 16, 10)
          .cast("long") % 1000000L)
      .filter(col("u_ppm") < col("keep_ppm"))
    val compact = drawn
      .withColumn("idx", row_number().over(
        W.partitionBy(col("doc")).orderBy(col("pos"))))
      .select(col("doc"), col("idx"), col("tok"))
    val ctx = compact.select(col("doc"), col("idx").as("cidx"),
      col("tok").as("context"))
    compact.join(ctx, Seq("doc"))
      .filter(abs(col("idx") - col("cidx")) <= window &&
        col("idx") =!= col("cidx"))
      .groupBy(col("tok").as("center"), col("context"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
  }

  /** Deterministic train/valid/test assignment: bucket = the first two hex
    * chars of md5(id || '|' || seed) — 256 uniform buckets — split by
    * lexicographic hex thresholds (`[00, trainUpper) → train,
    * [trainUpper, validUpper) → valid, rest → test`). Adding documents
    * never moves an existing document between splits (the property random
    * split lacks), and the seed gives independent redraws. Pure per-row
    * column math — no shuffle at all. */
  def hashSplit(df: DataFrame, idCol: String, seed: String,
      trainUpper: String = "fa", validUpper: String = "fd"): DataFrame = {
    val bucket = substring(
      md5(concat(col(idCol).cast("string"), lit("|" + seed))), 1, 2)
    df.withColumn("bucket", bucket)
      .withColumn("split",
        when(col("bucket") < lit(trainUpper), "train")
          .when(col("bucket") < lit(validUpper), "valid")
          .otherwise("test"))
  }

  /** Self-trained unigram LM document scoring: token counts over the whole
    * corpus define p(t) = count(t)/N, and each document scores the mean
    * log10 p over its token occurrences — the cheap stand-in for the
    * KenLM perplexity rank a pretraining quality filter uses.
    *
    * The token stream is pre-aggregated to (doc, token, k) BEFORE anything
    * shuffles — the vocabulary, its total, and the per-document score all
    * derive from that one frame, so the wide join ships one row per
    * distinct token per document (each occurrence weighted by k at the
    * join output), not one per occurrence. AQE broadcasts the vocabulary
    * side when it is small; the grand total is a 1-row broadcast. */
  def unigramLogprob(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val docTok = df
      .select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("k"))
    val vocab = docTok.groupBy(col("tok")).agg(sum(col("k")).as("cnt"))
    val tot = vocab.agg(sum(col("cnt")).as("n"))
    docTok.join(vocab, "tok")
      .crossJoin(broadcast(tot))
      .groupBy(col(idCol))
      .agg(
        sum(col("k")).cast("long").as("n_tokens"),
        (sum(col("k").cast("double") * log10(col("cnt").cast("double") / col("n")))
          / sum(col("k"))).as("mean_logprob"))
  }

  /** Order-2 LM scoring — the KenLM-style step past [[unigramLogprob]]:
    * p(t₂|t₁) = (c(t₁t₂) + k) / (c(t₁) + k·(V+1)) with add-k smoothing
    * over corpus bigram counts, and each document scores the mean log10
    * over its token transitions. Context counts derive from the bigram
    * table itself (c(t₁) = Σ_t₂ c(t₁t₂) — occurrences in non-final
    * position), so the conditional is consistent by construction.
    *
    * Scale shape: per-(doc, bigram) pre-aggregation feeds the corpus
    * bigram count, the context count, AND the scoring join — the wide
    * shuffles carry one row per distinct bigram per document; V is a
    * 1-row broadcast. Documents with fewer than two tokens have no
    * transitions and drop out. */
  def bigramLogprob(df: DataFrame, idCol: String, textCol: String,
      addK: Double = 0.5): DataFrame = {
    val w = split(col(textCol), " ")
    val vTot = df.select(explode(w).as("tok"))
      .agg(countDistinct(col("tok")).as("v"))
    val docBg = df.select(col(idCol), w.as("w"))
      .filter(size(col("w")) >= 2)
      .select(col(idCol), explode(expr(
        "transform(sequence(0, size(w) - 2), i -> concat_ws(' ', slice(w, i + 1, 2)))"))
        .as("g"))
      .groupBy(col(idCol), col("g")).agg(count(lit(1)).as("k"))
    val bg = docBg.groupBy(col("g")).agg(sum(col("k")).as("c12"))
    val ctx = bg.select(substring_index(col("g"), " ", 1).as("t1"), col("c12"))
      .groupBy(col("t1")).agg(sum(col("c12")).as("c1"))
    val logp = log10((col("c12") + lit(addK))
      / (col("c1") + lit(addK) * (col("v") + lit(1))))
    docBg.join(bg, "g")
      .withColumn("t1", substring_index(col("g"), " ", 1))
      .join(ctx, "t1")
      .crossJoin(broadcast(vTot))
      .groupBy(col(idCol))
      .agg(
        sum(col("k")).cast("long").as("n_transitions"),
        (sum(col("k").cast("double") * logp) / sum(col("k"))).as("mean_logprob"))
  }

  /** Held-out unigram scoring — q112 + q113 composed the way they are
    * actually used: the LM trains on the rows whose `splitCol` equals
    * `trainValue`, and every OTHER row is scored against it with add-k
    * smoothing, p(t) = (cnt(t) + k) / (N + k·(V+1)) — the +1 is the OOV
    * bucket, which unseen tokens fall into with probability k/denominator.
    * Output per held-out document: `n_tokens`, `n_oov` (token occurrences
    * absent from the train vocabulary), `mean_logprob`.
    *
    * Same scale shape as [[unigramLogprob]]: per-(doc, token) counts feed
    * both the train vocabulary and the eval join (left join — OOV must
    * survive it), with a 1-row (N, V) broadcast. */
  def heldOutUnigramScore(df: DataFrame, idCol: String, textCol: String,
      splitCol: String, trainValue: String = "train",
      addK: Double = 0.5): DataFrame = {
    val docTok = df
      .select(col(idCol), col(splitCol),
        explode(split(col(textCol), " ")).as("tok"))
      .groupBy(col(idCol), col(splitCol), col("tok"))
      .agg(count(lit(1)).as("k"))
    val vocab = docTok.filter(col(splitCol) === trainValue)
      .groupBy(col("tok")).agg(sum(col("k")).as("cnt"))
    val tot = vocab.agg(sum(col("cnt")).as("n"), count(lit(1)).as("v"))
    val logp = log10((coalesce(col("cnt"), lit(0L)) + lit(addK))
      / (col("n") + lit(addK) * (col("v") + lit(1))))
    docTok.filter(col(splitCol) =!= trainValue)
      .join(vocab, Seq("tok"), "left")
      .crossJoin(broadcast(tot))
      .groupBy(col(idCol), col(splitCol))
      .agg(
        sum(col("k")).cast("long").as("n_tokens"),
        sum(when(col("cnt").isNull, col("k")).otherwise(0L)).cast("long").as("n_oov"),
        (sum(col("k").cast("double") * logp) / sum(col("k"))).as("mean_logprob"))
  }

  /** DSIR importance weights (Data Selection via Importance Resampling,
    * Xie et al. 2023, arXiv:2302.03169): score every document by how much
    * more likely its hashed-n-gram profile is under a target ("in-domain")
    * corpus than under the raw source corpus. Features are word unigrams +
    * adjacent bigrams hashed into 256 buckets (the first two hex chars of
    * the feature's md5 — the same engine-independent bucketing q112's
    * hash split uses); both bucket LMs are add-k smoothed, and
    *
    *   log_weight(x) = Σ_b c_b(x) · (log10 p_target(b) − log10 p_source(b))
    *
    * with p(b) = (c(b) + k) / (N + 256k). Downstream selection is the
    * existing surface (top-k by weight = ops 34/35, probabilistic
    * acceptance = q115's md5-threshold mechanism) — this operator owns
    * the statistic, not the sampling.
    *
    * Scale shape: the feature stream is pre-aggregated to (doc, bucket, k)
    * BEFORE anything wide — per document at most 256 rows regardless of
    * length. Both bucket LMs are ≤ 256-row broadcasts, the (N_t, N_s)
    * totals a 1-row broadcast, so the only corpus-sized shuffles are the
    * two (doc, bucket) aggregations. */
  def dsirWeights(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column, addK: Double = 0.5): DataFrame = {
    val base = df.select(col(idCol), isTarget.as("is_target"),
      split(col(textCol), " ").as("w"))
    val uni = base.select(col(idCol), col("is_target"), explode(col("w")).as("f"))
    val bi = base.filter(size(col("w")) >= 2)
      .select(col(idCol), col("is_target"), explode(expr(
        "transform(sequence(0, size(w) - 2), i -> concat_ws(' ', slice(w, i + 1, 2)))"))
        .as("f"))
    val docB = uni.unionByName(bi)
      .select(col(idCol), col("is_target"), substring(md5(col("f")), 1, 2).as("b"))
      .groupBy(col(idCol), col("is_target"), col("b"))
      .agg(count(lit(1)).as("k"))
    val tgt = docB.filter(col("is_target")).groupBy(col("b"))
      .agg(sum(col("k")).as("ct"))
    val src = docB.filter(!col("is_target")).groupBy(col("b"))
      .agg(sum(col("k")).as("cs"))
    val tots = tgt.agg(sum(col("ct")).as("nt"))
      .crossJoin(src.agg(sum(col("cs")).as("ns")))
    val denom = lit(addK * 256)
    val logRatio =
      log10((coalesce(col("ct"), lit(0L)) + lit(addK)) / (col("nt") + denom)) -
        log10((coalesce(col("cs"), lit(0L)) + lit(addK)) / (col("ns") + denom))
    docB
      .join(broadcast(tgt), Seq("b"), "left")
      .join(broadcast(src), Seq("b"), "left")
      .crossJoin(broadcast(tots))
      .groupBy(col(idCol), col("is_target"))
      .agg(
        sum(col("k")).cast("long").as("n_feats"),
        sum(col("k").cast("double") * logRatio).as("log_weight"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020,
    * arXiv:1911.00359): each language's corpus is cut into head / middle /
    * tail thirds by the per-language distribution of an LM quality score —
    * CCNet ranks by KenLM perplexity; here the score is [[unigramLogprob]]
    * trained PER LANGUAGE (higher mean log10 p ⇔ lower perplexity, so
    * `head` = the most-probable third). Thresholds are exact interpolated
    * percentiles (the q10/q18 interpolation-parity surface), and every
    * threshold compare goes through the repo float policy — round(score, 9)
    * and round(threshold, 9) before the ≥ — so an engine's last-ulp drift
    * in the log/percentile math cannot flip a bucket.
    *
    * Scale shape: the per-language LM reuses [[unigramLogprob]]'s
    * pre-aggregation ((doc, lang, token, k) before any wide shuffle); the
    * threshold table is one row per language — a broadcast join — and the
    * per-language totals a ≤|langs|-row broadcast. Nothing is ever
    * corpus × corpus. */
  def perplexityBuckets(df: DataFrame, idCol: String, textCol: String,
      langCol: String): DataFrame = {
    val docTok = df
      .select(col(idCol), col(langCol).as("lang"),
        explode(split(col(textCol), " ")).as("tok"))
      .groupBy(col(idCol), col("lang"), col("tok"))
      .agg(count(lit(1)).as("k"))
    val vocab = docTok.groupBy(col("lang"), col("tok"))
      .agg(sum(col("k")).as("cnt"))
    val tot = vocab.groupBy(col("lang")).agg(sum(col("cnt")).as("n"))
    val scored = docTok
      .join(vocab, Seq("lang", "tok"))
      .join(broadcast(tot), "lang")
      .groupBy(col(idCol), col("lang"))
      .agg((sum(col("k").cast("double")
          * log10(col("cnt").cast("double") / col("n")))
        / sum(col("k"))).as("score"))
      .withColumn("s9", graft.queries.oround(col("score"), 9))
    val cuts = scored.groupBy(col("lang")).agg(
      graft.queries.oround(expr("percentile(s9, 1.0d/3)"), 9).as("t_lo"),
      graft.queries.oround(expr("percentile(s9, 2.0d/3)"), 9).as("t_hi"))
    scored.join(broadcast(cuts), "lang")
      .select(col(idCol), col("lang"),
        graft.queries.oround(col("score"), 6).as("mean_logprob"),
        when(col("s9") >= col("t_hi"), "head")
          .when(col("s9") >= col("t_lo"), "middle")
          .otherwise("tail").as("bucket"))
  }

  /** fastText-style linear classifier inference (Joulin et al. 2016,
    * arXiv:1607.01759) — the quality-classifier scoring step of the
    * LLaMA/CCNet-lineage curation pipelines, with the model reduced to
    * its inference-relevant skeleton: bag of word unigrams + adjacent
    * bigrams, hashed into `substr(md5(f), 1, 3)` buckets (4096, the same
    * engine-independent bucketing the DSIR/hash-split family uses), mean
    * pooling over feature occurrences, a per-bucket scalar weight from the
    * caller-supplied table, and a sigmoid on top:
    *
    *   logit(x) = bias + Σ_b c_b(x)·w(b) / Σ_b c_b(x),  p = σ(logit)
    *
    * The weight table is an input ARTIFACT (a trained model's parameters),
    * not something derived from the corpus — callers load it from wherever
    * the training run wrote it. Output per doc: `n_feats`, `logit`,
    * `prob`, and `label` (logit ≥ 0 after the round-9 float policy).
    *
    * Scale shape: features pre-aggregate to (doc, bucket, k) — at most
    * 4096 rows per document regardless of length — and the weight table
    * is ≤4096 rows, explicitly broadcast. The only corpus-sized shuffle
    * is the (doc, bucket) aggregation; a trillion-token corpus ships one
    * row per distinct bucket per doc. */
  def linearClassifierScore(df: DataFrame, idCol: String, textCol: String,
      weights: DataFrame, bias: Double = 0.0): DataFrame = {
    val base = df.select(col(idCol), split(col(textCol), " ").as("w"))
    val uni = base.select(col(idCol), explode(col("w")).as("f"))
    val bi = base.filter(size(col("w")) >= 2)
      .select(col(idCol), explode(expr(
        "transform(sequence(0, size(w) - 2), i -> concat_ws(' ', slice(w, i + 1, 2)))"))
        .as("f"))
    val docB = uni.unionByName(bi)
      .select(col(idCol), substring(md5(col("f")), 1, 3).as("b"))
      .groupBy(col(idCol), col("b"))
      .agg(count(lit(1)).as("k"))
    val logit = (lit(bias)
      + sum(col("k").cast("double") * col("w")) / sum(col("k")))
    docB.join(broadcast(weights.select(col("b"), col("w"))), "b")
      .groupBy(col(idCol))
      .agg(
        sum(col("k")).cast("long").as("n_feats"),
        logit.as("logit"))
      .select(col(idCol), col("n_feats"), col("logit"),
        (lit(1.0) / (lit(1.0) + exp(-col("logit")))).as("prob"),
        (graft.queries.oround(col("logit"), 9) >= 0).as("label"))
  }

  /** Quality-classifier TRAINING in pure integer fixed point — the
    * training-side complement of [[linearClassifierScore]] (which scores
    * with an existing weight artifact). Trains a hashed-unigram
    * logistic-regression classifier by full-batch gradient descent with a
    * HARD sigmoid (σ̂(t) = clamp(1/2 + t/4, 0, 1), the piecewise-linear
    * sigmoid of the quantized-training literature), entirely in ppm
    * integers:
    *
    *   x_{d,f} = token count of doc d in bucket f (md5-prefix mod
    *             `buckets`); n_d = Σ_f x_{d,f}
    *   logit_d = (Σ_f w_f·x_{d,f}) divT n_d          (mean pooling, ppm)
    *   p_d     = clamp(500000 + logit_d divT 4, 0, 1e6)
    *   grad_f  = Σ_d (y_d·1e6 − p_d)·x_{d,f} divT n_d
    *   w_f    += (lrPpm·(grad_f divT m)) divT 1e6     (m = doc count)
    *
    * divT is division TRUNCATING TOWARD ZERO on both engines (Spark `div`
    * truncates; DuckDB `//` floors, so the oracle wraps negatives as
    * −((−a) // b)). Every sum is over integers, so the result is
    * order-independent and bit-reproducible across partitionings and
    * engines — no float enters the computation anywhere, which is what
    * makes a TRAINING loop (normally a float-accumulation minefield
    * across engines) exactly DuckDB-replayable.
    *
    * Scale shape: each step is one broadcast join of the `buckets`-row
    * weight table against the CACHED (doc, bucket, count) pre-aggregate,
    * one per-doc aggregate, and one per-bucket aggregate — all
    * partial-agg map-side-combined. The model state (`buckets` rows,
    * bounded by config, data-independent) iterates DRIVER-side per step
    * — the IvfIndex seeding discipline — so the plan does not double per
    * iteration and only the tiny gradient table ever visits the driver;
    * the heavy aggregations stay distributed. */
  def hardLrTrain(df: DataFrame, idCol: String, textCol: String,
      labelCol: Column, buckets: Int = 64, steps: Int = 3,
      lrPpm: Long = 500000L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // Spark's `div` is integral division truncating toward zero (Java long
    // division, = Scala Long `/` used in the driver-side update below);
    // the oracle mirrors it in DuckDB (whose `//` FLOORS) as
    // CASE WHEN a < 0 THEN -((-a) // b) ELSE a // b END
    def divT(a: Column, b: Column): Column =
      call_function("div", a.cast("long"), b.cast("long"))
    val feats = df
      .select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
      .select(col(idCol),
        (conv(substring(md5(col("tok")), 1, 2), 16, 10).cast("long")
          % buckets).as("b"))
      .groupBy(col(idCol), col("b"))
      .agg(count(lit(1)).cast("long").as("x"))
      .cache()
    try {
      val nd = feats.groupBy(col(idCol)).agg(sum(col("x")).cast("long").as("n")).cache()
      try {
        val lab = df.select(col(idCol), when(labelCol, 1L).otherwise(0L).as("y"))
        val m = df.count()
        var w: Map[Long, Long] = (0L until buckets.toLong).map(_ -> 0L).toMap
        // empty corpus: every gradient is an empty sum, so w stays zero —
        // skip the loop instead of dividing by m = 0
        for (_ <- 1 to steps; if m > 0) {
          val wDf = w.toSeq.sortBy(_._1).toDF("b", "w_ppm")
          val scored = feats.join(broadcast(wDf), "b")
            .groupBy(col(idCol))
            .agg(sum(col("x") * col("w_ppm")).cast("long").as("z"))
            .join(nd, idCol)
            .select(col(idCol),
              least(lit(1000000L), greatest(lit(0L),
                lit(500000L) + divT(divT(col("z"), col("n")), lit(4L)))).as("p"))
          val err = lab.join(scored, idCol)
            .select(col(idCol), (col("y") * 1000000L - col("p")).as("err"))
          val g = feats.join(err, idCol).join(nd, idCol)
            .groupBy(col("b"))
            .agg(sum(divT(col("err") * col("x"), col("n"))).cast("long").as("g"))
            .as[(Long, Long)].collect().toMap // `buckets` rows, bounded by config
          w = w.map { case (b, wv) =>
            b -> (wv + lrPpm * (g.getOrElse(b, 0L) / m) / 1000000L)
          }
        }
        w.toSeq.sortBy(_._1).toDF("b", "w_ppm")
      } finally nd.unpersist()
    } finally feats.unpersist()
  }

  /** Iterative BPE tokenizer TRAINING (Sennrich et al., arXiv:1508.07909)
    * — q116's single merge step run as the real training loop. Words
    * (whitespace pre-tokenization) carry corpus frequencies; each word's
    * tokenization state is a space-separated symbol string; per
    * iteration the highest-frequency adjacent symbol pair (ties broken
    * lexicographically) becomes the next merge rule, applied to every
    * state by leftmost non-overlapping string replace over DOUBLED
    * delimiters — pattern ' a  b ' in ' ' + s.replace(' ', '  ') + ' ',
    * then collapse runs of spaces — so each match consumes only its own
    * trailing space and a symbol RUN merges greedily left-to-right
    * exactly like the reference algorithm ('a a a a' → 'aa aa';
    * single-space-delimited replace consumes the shared boundary space
    * and misses every other occurrence, yielding 'aa a a' — caught by
    * the independent-reference spec). Both engines implement leftmost
    * non-overlapping replace identically, so the whole loop is exactly
    * DuckDB-replayable (no floats anywhere).
    *
    * Scale shape per iteration: two vocab-sized aggregations (pair count,
    * argmax) over the CACHED state frame; corpus tokens never leave the
    * initial word count. The single merge rule (1 row, bounded) iterates
    * DRIVER-side; each new state frame is cached and materialized before
    * its predecessor is unpersisted, so the chain neither recomputes
    * earlier iterations nor leaks superseded cached frames.
    *
    * @return one row per merge rule: (step, merged, l_sym, r_sym, cnt) */
  def bpeTrain(df: DataFrame, textCol: String, merges: Int = 3): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val words = df.select(explode(split(col(textCol), " ")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).cast("long").as("f"))
    var st = words.select(col("f"),
      concat_ws(" ", split(col("tok"), "")).as("s")).cache()
    try {
      val rules = scala.collection.mutable.ArrayBuffer[(Long, String, String, String, Long)]()
      var exhausted = false
      for (i <- 1 to merges; if !exhausted) {
        // headOption: a corpus can run out of adjacent pairs before
        // `merges` iterations (every word a single symbol) — stop with the
        // rules learned so far, exactly like the oracle's empty-b$i CTEs
        // (an empty best rule empties the state, so later steps find no
        // pairs either and contribute no rule rows)
        st.withColumn("syms", split(col("s"), " "))
          .filter(size(col("syms")) >= 2)
          .select(col("f"), explode(expr(
            "transform(sequence(0, size(syms) - 2), " +
              "i -> struct(syms[i] AS a, syms[i + 1] AS b))")).as("p"))
          .groupBy(col("p.a").as("a"), col("p.b").as("b"))
          .agg(sum(col("f")).cast("long").as("cnt"))
          .orderBy(col("cnt").desc, col("a"), col("b")).limit(1)
          .as[(String, String, Long)].collect().headOption match {
          case None => exhausted = true
          case Some((a, b, cnt)) =>
            rules += ((i.toLong, a + b, a, b, cnt))
            if (i < merges) { // the post-last-merge state is never read
              val next = st.select(col("f"),
                trim(regexp_replace(
                  replace(concat(lit(" "), replace(col("s"), lit(" "), lit("  ")), lit(" ")),
                    concat(lit(" "), lit(a), lit("  "), lit(b), lit(" ")),
                    concat(lit(" "), lit(a + b), lit(" "))),
                  lit(" +"), lit(" "))).as("s"))
                .cache()
              next.count() // materialize before dropping the parent cache
              st.unpersist()
              st = next
            }
        }
      }
      rules.toSeq.toDF("step", "merged", "l_sym", "r_sym", "cnt")
    } finally st.unpersist()
  }

  /** BPE tokenizer APPLICATION — the inference half of [[bpeTrain]]
    * (Sennrich 2016 §2.2: apply the learned merge rules, in training
    * order, to each word): every word char-splits to a space-delimited
    * symbol string and each rule folds in as the SAME leftmost
    * non-overlapping doubled-delimiter replace the trainer used, so
    * train and apply share merge semantics by construction.
    *
    * Scale shape: the rules are a MODEL ARTIFACT (config-bounded, held
    * driver-side like the q153/q154 state) baked into codegen'd column
    * expressions — zero joins, zero shuffles before the caller's
    * aggregation; each doc tokenizes independently inside one projection.
    * For production-sized rule sets (R in the tens of thousands) the same
    * seam swaps to a broadcast merge table + `mapPartitions` fold; the
    * column form keeps the small-R path whole-stage-codegen.
    *
    * @return (`idCol`, n_tokens, toks_md5): total post-merge symbol count
    *         and an md5 over the '|'-joined per-word tokenizations — the
    *         per-doc fingerprint a SQL oracle can replay. */
  def bpeApply(df: DataFrame, idCol: String, textCol: String,
      rules: Seq[(String, String)]): DataFrame = {
    def applyAll(sym: Column): Column = rules.foldLeft(sym) { case (c, (a, b)) =>
      trim(regexp_replace(
        replace(concat(lit(" "), replace(c, lit(" "), lit("  ")), lit(" ")),
          concat(lit(" "), lit(a), lit("  "), lit(b), lit(" ")),
          concat(lit(" "), lit(a + b), lit(" "))),
        lit(" +"), lit(" ")))
    }
    df.select(col(idCol),
        transform(split(col(textCol), " "),
          w => applyAll(concat_ws(" ", split(w, "")))).as("toks"))
      .select(col(idCol),
        aggregate(transform(col("toks"), s => size(split(s, " "))),
          lit(0L), (acc, x) => acc + x).as("n_tokens"),
        md5(concat_ws("|", col("toks"))).as("toks_md5"))
  }

  /** Sequential quality-filter funnel with first-failing-rule attribution
    * (the Gopher/RefinedWeb cascade): every document lands in exactly one
    * stage — too_short, too_long, low_stopword, repetitive (3-gram
    * duplicate fraction), or kept — determined by the FIRST rule it
    * fails, so the stage counts read as a funnel report. All rule inputs
    * are per-row array math (no explode, no join); the only shuffle is
    * the final count-by-stage. */
  def filterFunnel(df: DataFrame, textCol: String,
      minTokens: Int = 20, maxTokens: Int = 90,
      minStopwordRatio: Double = 0.02, maxDup3Frac: Double = 0.02,
      stopwords: Seq[String] = Seq("the", "a", "of", "and", "to")): DataFrame = {
    val staged = df.withColumn("stage",
      funnelStage(col(textCol), minTokens, maxTokens,
        minStopwordRatio, maxDup3Frac, stopwords))
    staged.groupBy(col("stage")).agg(count(lit(1)).cast("long").as("n_docs"))
  }

  /** The per-document stage label the funnel aggregates — exposed so a
    * pipeline can keep the attribution column on the rows themselves
    * (e.g. to write a reject-reason audit trail next to the kept corpus). */
  def funnelStage(text: Column,
      minTokens: Int, maxTokens: Int,
      minStopwordRatio: Double, maxDup3Frac: Double,
      stopwords: Seq[String]): Column = {
    val w = split(text, " ")
    val nTok = size(w)
    val stopRatio =
      size(filter(w, t => t.isInCollection(stopwords))).cast("double") / nTok
    val grams = transform(sequence(lit(0), nTok - 3),
      i => concat_ws(" ", slice(w, i + 1, lit(3))))
    val dup3 = when(nTok >= 3,
      lit(1.0) - size(array_distinct(grams)).cast("double") / (nTok - 2))
      .otherwise(lit(0.0))
    when(nTok < minTokens, "1_too_short")
      .when(nTok > maxTokens, "2_too_long")
      .when(stopRatio < minStopwordRatio, "3_low_stopword")
      .when(dup3 > maxDup3Frac, "4_repetitive")
      .otherwise("5_kept")
  }

  /** md5 integer draw on [0, 1e6) for position `pos` of document `id`
    * under `salt` — the deterministic randomness every augmentation op
    * here uses (the skipgramPairs subsampling convention). */
  private def augDraw(id: Column, salt: String, pos: Column): Column =
    conv(substring(md5(concat(id.cast("string"), lit(s"|$salt|"),
      pos.cast("string"))), 1, 12), 16, 10).cast("long") % 1000000L

  /** Token-DROPOUT augmentation (EDA, Wei & Zou 2019, "random deletion"
    * made deterministic): token at `pos` is dropped when its md5 draw
    * < `pPpm`. Returns (id, aug_text); a fully-dropped document yields
    * the empty string, not a missing row. Pure per-row explode →
    * filter → per-doc ordered re-join; one doc-keyed shuffle. */
  def augmentDropout(df: DataFrame, idCol: String, textCol: String,
      pPpm: Long, salt: String = "aug-drop"): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "tok")))
      .filter(augDraw(col("id"), salt, col("pos")) >= pPpm)
      .groupBy(col("id"))
      .agg(expr("array_join(transform(array_sort(collect_list(struct(pos, tok))), x -> x.tok), ' ')")
        .as("aug_text"))
    df.select(col(idCol).as("id"))
      .join(toks, Seq("id"), "left")
      .select(col("id"), coalesce(col("aug_text"), lit("")).as("aug_text"))
  }

  /** Adjacent-SWAP augmentation (EDA "random swap", deterministic,
    * non-overlapping): the token pair (2i, 2i+1) swaps when pair i's md5
    * draw < `pPpm`; an unpaired tail token never moves. The swapped
    * order is a permutation, so re-joining on the new position is
    * total-order safe. */
  def augmentSwap(df: DataFrame, idCol: String, textCol: String,
      pPpm: Long, salt: String = "aug-swap"): DataFrame =
    df.select(col(idCol).as("id"),
        size(split(col(textCol), " ")).as("n"),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "tok")))
      .withColumn("swap",
        augDraw(col("id"), salt, expr("pos div 2")) < pPpm)
      .withColumn("new_pos", expr(
        "CASE WHEN swap AND pos % 2 = 0 AND pos + 1 < n THEN pos + 1 " +
          "WHEN swap AND pos % 2 = 1 THEN pos - 1 ELSE pos END"))
      .groupBy(col("id"))
      .agg(expr("array_join(transform(array_sort(collect_list(struct(new_pos, tok))), x -> x.tok), ' ')")
        .as("aug_text"))
}
