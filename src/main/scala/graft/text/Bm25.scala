package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 lexical retrieval (Robertson & Spärck Jones' Okapi weighting) —
  * the term-based twin of the embedding retrieval chain (q147): rank
  * corpus documents for a set of probe queries by
  * {{{
  *   score(D, Q) = Σ_{t ∈ Q} idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
  * }}}
  * with k1 = 1.2, b = 0.75, entirely in INTEGER arithmetic so both
  * engines agree bit for bit:
  *  - idf uses the q135 RATIONAL convention `idf_m = (Nd·1000) div df`
  *    (documented deviation from the log form — monotone in df, which is
  *    all ranking needs);
  *  - the tf saturation term clears its denominators exactly: with
  *    avgdl = T/Nd substituted, `ratio_ppm = (88·tf·T·10^6) div
  *    (40·T·tf + 12·T + 36·dl·Nd)` is the term ratio on a ppm grid
  *    (≤ 2.2·10^6 = k1+1), and the per-term contribution is
  *    `idf_m · ratio_ppm`. The saturation numerator 88·tf·T·10^6 exceeds
  *    2^63 already at T·tf ≈ 10^14 (e.g. T = 10^10 tokens with tf = 10^4,
  *    well inside a 100 TB corpus) and non-ANSI Spark would WRAP it
  *    silently, so every product is computed in DECIMAL(38,0) — the
  *    GiniTree discipline, exact to 10^38 — and `DECIMAL(38,0) div`
  *    matches DuckDB HUGEINT `//` bit for bit (the q193 parity rule).
  *
  * Scale shape: the corpus collapses to the (doc, tok, tf) pre-agg
  * before anything wide (the q113 discipline); df is a vocabulary-sized
  * aggregate of that frame; T/Nd is a broadcast 1-row total; the probe
  * terms are a broadcast inverted-index lookup (query terms ⋈ postings),
  * so the big join ships one row per (query term, matching doc) — a real
  * posting-list traversal, never corpus × corpus. Top-k is a per-query
  * window.
  */
object Bm25 {

  /** [[contrib]] with the tf/dl operands taken from caller-chosen
    * columns — the MaxScore serve's upper bound is this exact expression
    * evaluated at the term's (max_tf, min_dl) corner: the saturation
    * ratio is nondecreasing in tf and nonincreasing in dl (a monotone
    * rational; `div` is its floor, and the floor of a monotone function
    * is monotone), so contribNamed("max_tf","min_dl") dominates the
    * term's contribution on EVERY posting. Same string for ("tf","dl")
    * keeps the two paths one expression by construction. */
  private[text] def contribNamed(tf: String, dl: String): org.apache.spark.sql.Column =
    // DECIMAL(38,0) like GiniTree's sk: 88·tf·T·10^6 wraps a BIGINT
    // once T·tf > ~10^14 (non-ANSI Spark wraps SILENTLY), so both
    // products are cast wide BEFORE multiplying; DECIMAL(38,0) div
    // ≡ DuckDB HUGEINT // (the q193 parity rule)
    expr("CAST((nd * 1000) div df AS DECIMAL(38,0))") *
      expr(s"(88 * $tf * CAST(t AS DECIMAL(38,0)) * 1000000) div " +
        s"(40 * CAST(t AS DECIMAL(38,0)) * $tf + 12 * t + 36 * CAST($dl AS DECIMAL(38,0)) * nd)")

  /** The per-(query, doc, term) contribution on the DECIMAL(38,0) grid —
    * expects columns `nd`, `df`, `tf`, `t`, `dl`. Shared by [[topK]]
    * (corpus recompute) and `PostingsIndex.bm25TopK` (persisted-index
    * serve) so the two paths are the same expression by construction. */
  private[text] def contrib: org.apache.spark.sql.Column =
    contribNamed("tf", "dl")

  /** Sum per-term contributions per (qid, doc_id), land on the long
    * score grid (failing LOUDLY on overflow instead of wrapping), rank,
    * and keep the top `k` — the second shared half of the BM25 serve. */
  private[text] def sumAndRank(perTerm: DataFrame, k: Int): DataFrame = {
    val scored = perTerm
      .groupBy(col("qid"), col("doc_id"))
      // the SUM stays DECIMAL(38,0) (exact to 10^38); the landing on the
      // long score grid FAILS LOUDLY instead of wrapping — the grid
      // ceiling is idf_m·ratio_ppm ≈ Nd·1000·2.2e6 per term, so a sum
      // over |Q| terms exceeds 2^63 around Nd ≈ 4e9/|Q| docs, at which
      // point the caller re-scales the grid (divide idf_m), not the cast
      .agg(sum(col("contrib")).as("s"))
      .withColumn("score_i",
        expr("CASE WHEN s > CAST(9223372036854775807 AS DECIMAL(38,0)) " +
          "THEN CAST(raise_error('bm25 score grid overflow: re-scale idf_m') AS LONG) " +
          "ELSE CAST(s AS LONG) END"))
      .drop("s")
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score_i").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("doc_id"), col("score_i"))
  }

  /** Top-`k` BM25 results per probe. `queries`: (qid, tok) distinct
    * term rows. Output: (qid, rank, doc_id, score_i), self-hits
    * excluded when qid collides with a doc_id. */
  def topK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, k: Int): DataFrame = {
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      split(col(textCol), " ").as("w"))
    val dl = base.select(col("doc_id"), size(col("w")).cast("long").as("dl"))
    val tot = dl.agg(sum(col("dl")).as("t"), count(lit(1)).as("nd"))
    val dt = base
      .select(col("doc_id"), explode(col("w")).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = dt.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val scored = broadcast(queries.select(col("qid").cast("long").as("qid"),
        col("tok")))
      .join(dfreq, "tok")
      .join(dt, "tok")
      .filter(col("doc_id") =!= col("qid"))
      .join(dl, "doc_id")
      .crossJoin(broadcast(tot))
      .select(col("qid"), col("doc_id"), contrib.as("contrib"))
    sumAndRank(scored, k)
  }

  /** RM3-style pseudo-relevance-feedback query EXPANSION (Lavrenko &
    * Croft SIGIR 2001's relevance models as popularized by Abdul-Jaleel
    * et al. TREC 2004), on the repo's integer grids: retrieve top-k with
    * the original terms, weight every term of the top-`fbDocs` feedback
    * documents by `Σ tf · idf_m` (idf on the q135 rational grid, the sum
    * in DECIMAL(38,0) — tf·idf_m products reach ~10^15 per doc at large
    * Nd and must not wrap), keep the `fbTerms` heaviest terms NOT in the
    * original query (ties toward the smaller term string), and return
    * the UNION term set ready for a second [[topK]] pass. Deterministic
    * end to end, so the full expand→re-retrieve composition is
    * hash-checkable (q219).
    *
    * Scale shape: the feedback set is ≤ k·|Q| doc ids (bounded), so the
    * weighting join ships only the feedback documents' posting rows;
    * the term rank is a per-query window over those rows. */
  def rm3ExpandedTerms(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, k: Int, fbDocs: Int, fbTerms: Int): DataFrame = {
    val q = queries.select(col("qid").cast("long").as("qid"), col("tok"))
    val fb = topK(docs, idCol, textCol, q, k)
      .filter(col("rank") <= fbDocs)
      .select(col("qid"), col("doc_id"))
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      split(col(textCol), " ").as("w"))
    val dt = base.select(col("doc_id"), explode(col("w")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val dfreq = dt.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val nd = base.agg(count(lit(1)).as("nd"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("wgt").desc, col("tok"))
    val expansion = fb
      .join(dt.hint("shuffle_hash"), "doc_id")
      .join(dfreq.hint("shuffle_hash"), "tok")
      .crossJoin(broadcast(nd))
      .groupBy(col("qid"), col("tok"))
      .agg(sum(expr(
        "tf * CAST((nd * 1000) div df AS DECIMAL(38,0))")).as("wgt"))
      .join(q, Seq("qid", "tok"), "left_anti") // only NEW terms expand
      .withColumn("trank", row_number().over(w))
      .filter(col("trank") <= fbTerms)
      .select(col("qid"), col("tok"))
    q.unionByName(expansion)
  }

  /** DPR-style hard-negative mining (Karpukhin et al. 2020) over a
    * [[topK]] result: per query, the best-RANKED relevant document is the
    * positive and the first `nNeg` non-relevant results are the hard
    * negatives — lexically close enough to outrank real matches, which
    * is exactly what a contrastive retriever must learn to push down
    * (random negatives are trivially separable; BM25-mined ones are
    * not). Relevance is a caller-provided (id, label) weak-supervision
    * join. Queries with no relevant or no non-relevant result in the
    * top-k drop out (deterministically). Scale: labels are a dimension
    * join; both selections are per-query windows over ≤ k rows. */
  def hardNegatives(ranked: DataFrame, labels: DataFrame,
      nNeg: Int): DataFrame = {
    val lab = labels.select(col("id"), col("label"))
    val withRel = ranked
      .join(lab.select(col("id").as("qid"), col("label").as("q_label")), "qid")
      .join(lab.select(col("id").as("doc_id"), col("label").as("d_label")), "doc_id")
      .withColumn("relevant", (col("q_label") === col("d_label")).cast("int"))
    val pos = withRel.filter(col("relevant") === 1)
      .withColumn("pr", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("rank"))))
      .filter(col("pr") === 1)
      .select(col("qid"), col("doc_id").as("pos_id"), col("rank").as("pos_rank"))
    val negs = withRel.filter(col("relevant") === 0)
      .withColumn("neg_seq", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("rank"))))
      .filter(col("neg_seq") <= nNeg)
      .select(col("qid"), col("doc_id").as("neg_id"),
        col("rank").as("neg_rank"), col("neg_seq"))
    pos.join(negs, "qid")
      .select(col("qid"), col("pos_id"), col("pos_rank"), col("neg_seq"),
        col("neg_id"), col("neg_rank"))
  }
}
