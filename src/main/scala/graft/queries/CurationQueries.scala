package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.QueryDef.sql
import graft.core.Tables
import graft.text.Curation

/** Corpus-curation surface (round 8): span-level exact dedup, deterministic
  * hash splitting, unigram-LM quality scoring, and the sequential filter
  * funnel — the curation steps between raw scoring (q41/q42/q47/q92) and
  * trainer feeding (q107–q110). All four are full DuckDB oracles. */
object CurationQueries {

  def all: Seq[QueryDef] = Seq(
    q111SpanDedup, q112HashSplit, q113UnigramLogprob, q114FilterFunnel,
    q115MixtureApply, q116BpeMergeStep, q117SemanticCanonical,
    q118SpanDedupOverlap, q119HeldoutLogprob, q120BigramLogprob,
    q121DedupKeepBest, q122FuzzyDecontam, q125DsirWeights,
    q126PerplexityBuckets, q127QualityClassifier, q129CurationPipeline,
    q153LrTrain, q155BpeTrain, q162BpeApply, q167TarShards, q178AucEval,
    q201ApEval, q205BleuEval, q239ChrfEval,
    q180DupRegions, q185SkipgramPairs, q193GiniTree, q197Augment,
    q255MixtureWaterfill, q256MixtureSampled)

  private def docs(s: SparkSession, d: String): DataFrame = Tables.documents(s, d)

  /** Shared engine path of q255/q256: distributed per-language token
    * stock aggregation, then `MixturePlan.waterfill` on the bounded
    * |languages|-row frame (driver-local by contract — the planner/
    * centroid discipline). Budget = half the corpus's tokens, derived
    * from the data so the oracle replays it. */
  private[graft] def mixPlan(s: SparkSession, d: String)
      : Seq[graft.operators.MixturePlan.Alloc] = {
    val rows = docs(s, d).groupBy(col("lang"))
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("n"))
      .collect()
    val stocks = rows.map(r => (r.getString(0), r.getLong(1))).toSeq
      .sortBy(_._1)
    val budget = stocks.map(_._2).sum / 2
    graft.operators.MixturePlan.waterfill(stocks, budget)
  }

  /** The waterfill's synchronous rounds as unrolled SQL CTE stages —
    * ONE generator feeds both q255's and q256's oracles, so the two
    * cannot drift. Stage count must equal MixturePlan's maxRounds. */
  private def waterfillCtes(rounds: Int = 8): String = {
    val stages = (1 to rounds).map { i =>
      s"""s$i AS (SELECT CAST(sum(CASE WHEN capped_round > 0 THEN n ELSE 0 END) AS BIGINT) AS cn,
         |           CAST(sum(CASE WHEN capped_round = 0 THEN w ELSE 0 END) AS BIGINT) AS uw
         |    FROM c${i - 1}),
         |c$i AS (SELECT c.lang, c.n, c.w,
         |           CAST(CASE WHEN c.capped_round > 0 THEN c.capped_round
         |                WHEN s.uw > 0 AND ((b.budget - s.cn) * c.w) // s.uw >= c.n THEN $i
         |                ELSE 0 END AS BIGINT) AS capped_round
         |    FROM c${i - 1} c, s$i s, b)""".stripMargin
    }.mkString(",\n")
    s"""d AS (SELECT lang, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n
       |      FROM documents GROUP BY lang),
       |b AS (SELECT CAST(sum(n) // 2 AS BIGINT) AS budget FROM d),
       |w0 AS (SELECT lang, n, CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS s0
       |       FROM d),
       |c0 AS (SELECT lang, n,
       |          s0 + (CASE WHEN (s0 + 1) * (s0 + 1) <= n THEN 1 ELSE 0 END)
       |             - (CASE WHEN s0 * s0 > n THEN 1 ELSE 0 END) AS w,
       |          CAST(0 AS BIGINT) AS capped_round
       |       FROM w0),
       |$stages,
       |sf AS (SELECT CAST(sum(CASE WHEN capped_round > 0 THEN n ELSE 0 END) AS BIGINT) AS cn,
       |          CAST(sum(CASE WHEN capped_round = 0 THEN w ELSE 0 END) AS BIGINT) AS uw
       |   FROM c$rounds),
       |alloc AS (
       |  SELECT c.lang, c.n, c.w, c.capped_round, b.budget,
       |         CAST(CASE WHEN c.capped_round > 0 THEN c.n
       |                   WHEN s.uw = 0 THEN 0
       |                   ELSE ((b.budget - s.cn) * c.w) // s.uw
       |              END AS BIGINT) AS alloc_tokens
       |  FROM c$rounds c, sf s, b)""".stripMargin
  }

  /** TOKEN-BUDGET WATERFILL across domains — `operators.MixturePlan`
    * (temperature rule of GPT-3 App. A / XLM-R §3.1, ∝ n^α with
    * α = 0.5 via exact isqrt, plus the availability cap q115's uncapped
    * oversampler cannot express): allocate B = half the corpus's tokens
    * so low-resource languages are upsampled but no language is asked
    * for more tokens than it HAS — capped domains return their unused
    * share to the pool in synchronous waterfilling rounds. All integer
    * arithmetic; the oracle replays every round as an unrolled CTE
    * stage, and the round each domain capped in is an output column, so
    * a drifted iteration order (not just a drifted final number)
    * hash-mismatches. */
  val q255MixtureWaterfill: QueryDef = sql(
    "q255_mixture_waterfill",
    s"""WITH ${waterfillCtes()}
       |SELECT lang, n AS n_tokens, w AS weight, alloc_tokens,
       |       capped_round, budget
       |FROM alloc
       |ORDER BY lang""".stripMargin) { (s, d) =>
    import s.implicits._
    val allocs = mixPlan(s, d)
    // budget reconstruction for the audit column: Σ stocks / 2
    val budget = allocs.map(_.nTokens).sum / 2
    allocs
      .map(a => (a.domain, a.nTokens, a.weight, a.allocTokens,
        a.cappedRound, budget))
      .toDF("lang", "n_tokens", "weight", "alloc_tokens", "capped_round",
        "budget")
      .orderBy(col("lang"))
  }

  /** The waterfill plan EXECUTED as a corpus-sized sampling job — the
    * q254 wiring discipline on the mixture shelf (a plan nobody
    * consumes is not an operator): per-language keep probability
    * alloc/stock on the ppm grid, one deterministic md5 draw per
    * document (broadcast plan join + pushed-down filter — no shuffle
    * before the per-language audit agg), reporting planned vs realized
    * docs/tokens per language. The oracle replays the waterfill CTEs
    * AND the per-document draw, so plan drift and sampling drift both
    * hash-mismatch. */
  val q256MixtureSampled: QueryDef = sql(
    "q256_mixture_sampled",
    s"""WITH ${waterfillCtes()},
       |kp AS (SELECT lang, n, alloc_tokens,
       |              CAST(CASE WHEN n > 0 THEN (alloc_tokens * 1000000) // n
       |                        ELSE 0 END AS BIGINT) AS keep_ppm
       |       FROM alloc),
       |dd AS (SELECT lang, doc_id,
       |              CAST(len(string_split(text, ' ')) AS BIGINT) AS tok_n
       |       FROM documents),
       |kept AS (
       |  SELECT dd.lang, CAST(count(*) AS BIGINT) AS kept_docs,
       |         CAST(sum(dd.tok_n) AS BIGINT) AS kept_tokens
       |  FROM dd JOIN kp USING (lang)
       |  WHERE ('0x' || substr(md5(CAST(dd.doc_id AS STRING) || '|mixfill-v1'), 1, 12))::BIGINT
       |        % 1000000 < kp.keep_ppm
       |  GROUP BY dd.lang)
       |SELECT kp.lang, kp.n AS n_tokens, kp.alloc_tokens, kp.keep_ppm,
       |       CAST(COALESCE(kept.kept_docs, 0) AS BIGINT) AS kept_docs,
       |       CAST(COALESCE(kept.kept_tokens, 0) AS BIGINT) AS kept_tokens
       |FROM kp LEFT JOIN kept USING (lang)
       |ORDER BY kp.lang""".stripMargin) { (s, d) =>
    import s.implicits._
    val plan = mixPlan(s, d)
      .map(a => (a.domain, a.nTokens, a.allocTokens,
        graft.operators.MixturePlan.keepPpm(a)))
      .toDF("lang", "n_tokens", "alloc_tokens", "keep_ppm")
    val dd = docs(s, d).select(col("lang"), col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("tok_n"))
    val kept = dd
      .join(broadcast(plan.select(col("lang"), col("keep_ppm"))), "lang")
      .filter(graft.operators.KmvSketch.hash48(col("doc_id"), "mixfill-v1")
        % 1000000L < col("keep_ppm"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("kept_docs"), sum(col("tok_n")).as("kept_tokens"))
    plan.join(kept, Seq("lang"), "left")
      .select(col("lang"), col("n_tokens"), col("alloc_tokens"),
        col("keep_ppm"),
        coalesce(col("kept_docs"), lit(0L)).as("kept_docs"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"))
      .orderBy(col("lang"))
  }

  /** Span-level exact dedup (C4's repeated-span rule on fixed 8-token
    * windows): per doc, how many spans it holds, how many are duplicates
    * of an earlier occurrence anywhere in the corpus, and how many tokens
    * survive span removal. First occurrence = min(doc_id·100000 + pos);
    * both engines group and join on the md5 span digest. */
  val q111SpanDedup: QueryDef = sql(
    "q111_span_dedup",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sp AS (
      |  SELECT doc_id, i AS pos,
      |         md5(array_to_string(w[CAST(i * 8 + 1 AS INT):CAST(i * 8 + 8 AS INT)], ' ')) AS h,
      |         len(w[CAST(i * 8 + 1 AS INT):CAST(i * 8 + 8 AS INT)]) AS span_len,
      |         doc_id * 100000 + i AS okey
      |  FROM (SELECT doc_id, w, unnest(range(CAST(ceil(len(w) / 8.0) AS BIGINT))) AS i
      |        FROM t)),
      |f AS (SELECT h, min(okey) AS first_key FROM sp GROUP BY h)
      |SELECT sp.doc_id,
      |       CAST(count(*) AS BIGINT) AS n_spans,
      |       CAST(sum(CASE WHEN okey <> first_key THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
      |       CAST(sum(CASE WHEN okey = first_key THEN span_len ELSE 0 END) AS BIGINT) AS n_tokens_kept
      |FROM sp JOIN f USING (h)
      |GROUP BY sp.doc_id
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    Curation.spanDedupStats(docs(s, d), "doc_id", "text", spanTokens = 8)
      .orderBy(col("doc_id"))
  }

  /** Deterministic hash split: 256 md5 hex buckets, thresholds
    * train < 'fa' (250/256), valid < 'fd' (3/256), else test. Stable under
    * corpus growth — a document's split never changes when rows are added,
    * unlike a random split. */
  val q112HashSplit: QueryDef = sql(
    "q112_hash_split",
    """SELECT doc_id,
      |       substr(md5(CAST(doc_id AS VARCHAR) || '|split-v1'), 1, 2) AS bucket,
      |       CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || '|split-v1'), 1, 2) < 'fa' THEN 'train'
      |            WHEN substr(md5(CAST(doc_id AS VARCHAR) || '|split-v1'), 1, 2) < 'fd' THEN 'valid'
      |            ELSE 'test' END AS split
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    Curation.hashSplit(docs(s, d), "doc_id", seed = "split-v1")
      .select(col("doc_id"), col("bucket"), col("split"))
      .orderBy(col("doc_id"))
  }

  /** Self-trained unigram LM scoring: p(t) from corpus counts, per-doc
    * mean log10 p over token occurrences — the perplexity-proxy rank a
    * pretraining quality filter sorts by. */
  val q113UnigramLogprob: QueryDef = sql(
    "q113_unigram_logprob",
    """WITH dt AS (
      |  SELECT doc_id, tok, count(*) AS k
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
      |  GROUP BY doc_id, tok),
      |vocab AS (SELECT tok, CAST(sum(k) AS BIGINT) AS cnt FROM dt GROUP BY tok),
      |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM vocab)
      |SELECT dt.doc_id,
      |       CAST(sum(k) AS BIGINT) AS n_tokens,
      |       round(sum(CAST(k AS DOUBLE) * log10(CAST(cnt AS DOUBLE) / n)) / sum(k), 6)
      |         AS mean_logprob
      |FROM dt JOIN vocab USING (tok) CROSS JOIN tot
      |GROUP BY dt.doc_id
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val scored = Curation.unigramLogprob(docs(s, d), "doc_id", "text")
    scored.select(col("doc_id"), col("n_tokens"),
        oround(col("mean_logprob"), 6).as("mean_logprob"))
      .orderBy(col("doc_id"))
  }

  /** Sequential filter funnel with first-failing-rule attribution:
    * too_short (<20 tokens) → too_long (>90) → low_stopword (<0.02) →
    * repetitive (3-gram duplicate fraction >0.02) → kept. Thresholds
    * chosen so every stage is non-empty at all three test scale factors.
    * Both engines compute the identical division of identical integers, so
    * the threshold compares are bit-exact — no rounding needed. */
  val q114FilterFunnel: QueryDef = sql(
    "q114_filter_funnel",
    """WITH s AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |r AS (
      |  SELECT doc_id, len(w) AS n_tok,
      |         CAST(len(list_filter(w, t -> t IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
      |           / len(w) AS stop_ratio,
      |         CASE WHEN len(w) >= 3
      |              THEN 1.0 - CAST(len(list_distinct(list_transform(range(len(w) - 2),
      |                     i -> w[i + 1] || ' ' || w[i + 2] || ' ' || w[i + 3]))) AS DOUBLE)
      |                   / (len(w) - 2)
      |              ELSE 0.0 END AS dup3
      |  FROM s)
      |SELECT CASE WHEN n_tok < 20 THEN '1_too_short'
      |            WHEN n_tok > 90 THEN '2_too_long'
      |            WHEN stop_ratio < 0.02 THEN '3_low_stopword'
      |            WHEN dup3 > 0.02 THEN '4_repetitive'
      |            ELSE '5_kept' END AS stage,
      |       CAST(count(*) AS BIGINT) AS n_docs
      |FROM r
      |GROUP BY 1
      |ORDER BY stage""".stripMargin) { (s, d) =>
    Curation.filterFunnel(docs(s, d), "text")
      .orderBy(col("stage"))
  }

  /** q110's temperature weights APPLIED: each document's epoch replication
    * count = floor(oversample) + one deterministic extra copy with
    * probability frac(oversample), decided by an md5 hex bucket — the step
    * that turns mixture weights into an actual epoch composition. The
    * oversample factor is rounded to 6 decimals BEFORE the floor/frac
    * split (and this query is itself hash-checked, so both engines
    * provably agree on the rounded value and the integer threshold below
    * is engine-independent; q110 additionally pins the same weights as
    * fixed-point ppm integers); the per-lang weight table is a broadcast
    * join against the corpus. */
  val q115MixtureApply: QueryDef = sql(
    "q115_mixture_apply",
    """WITH s AS (
      |  SELECT lang, sum(CAST(len(string_split(text, ' ')) AS BIGINT)) AS n_tokens
      |  FROM documents GROUP BY lang),
      |tot AS (
      |  SELECT CAST(sum(n_tokens) AS DOUBLE) AS tok_total,
      |         sum(power(CAST(n_tokens AS DOUBLE), 0.3)) AS pow_total
      |  FROM s),
      |w AS (
      |  SELECT lang,
      |         round((power(CAST(n_tokens AS DOUBLE), 0.3) / pow_total)
      |               / (CAST(n_tokens AS DOUBLE) / tok_total), 6) AS os
      |  FROM s, tot)
      |SELECT d.doc_id, d.lang, os AS oversample,
      |       CAST(floor(os) +
      |            CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || '|mix-v1'), 1, 6)
      |                      < printf('%06x', CAST(floor((os - floor(os)) * 16777216) AS BIGINT))
      |                 THEN 1 ELSE 0 END AS BIGINT) AS n_copies
      |FROM documents d JOIN w USING (lang)
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val perLang = docs(s, d).groupBy(col("lang"))
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
    val tot = perLang.agg(
      sum(col("n_tokens")).cast("double").as("tok_total"),
      sum(pow(col("n_tokens").cast("double"), lit(0.3))).as("pow_total"))
    val w = perLang.crossJoin(broadcast(tot))
      .select(col("lang"),
        oround((pow(col("n_tokens").cast("double"), lit(0.3)) / col("pow_total"))
          / (col("n_tokens").cast("double") / col("tok_total")), 6).as("os"))
    val thrHex = lower(lpad(hex(
      floor((col("os") - floor(col("os"))) * lit(16777216)).cast("long")), 6, "0"))
    docs(s, d).join(broadcast(w), "lang")
      .select(col("doc_id"), col("lang"), col("os").as("oversample"),
        (floor(col("os")) +
          when(substring(md5(concat(col("doc_id").cast("string"), lit("|mix-v1"))), 1, 6)
            < thrHex, 1).otherwise(0)).cast("long").as("n_copies"))
      .orderBy(col("doc_id"))
  }

  /** One BPE MERGE iteration — the tokenizer-training inner loop: words
    * (whitespace pre-tokenization) carry their corpus frequency, every
    * adjacent character pair inside a word contributes that frequency, and
    * the top pair is the next merge rule. Two vocab-sized aggregations
    * (corpus tokens never leave the first two-phase count); top-20 shown
    * with a deterministic tie-break. */
  val q116BpeMergeStep: QueryDef = sql(
    "q116_bpe_merge_step",
    """WITH words AS (
      |  SELECT tok, count(*) AS freq
      |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      |  GROUP BY tok),
      |pairs AS (
      |  SELECT substr(tok, CAST(i AS INT), 2) AS pair, freq
      |  FROM (SELECT tok, freq, unnest(range(1, length(tok))) AS i
      |        FROM words WHERE length(tok) >= 2))
      |SELECT pair, CAST(sum(freq) AS BIGINT) AS n
      |FROM pairs
      |GROUP BY pair
      |ORDER BY n DESC, pair
      |LIMIT 20""".stripMargin) { (s, d) =>
    val words = docs(s, d)
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("freq"))
    words.filter(length(col("tok")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2))"))
        .as("pair"), col("freq"))
      .groupBy(col("pair"))
      .agg(sum(col("freq")).cast("long").as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(20)
  }

  /** SemDeDup — semantic dedup at cluster granularity: within-bucket
    * cosine pairs (q58's oracle-proven kernel, label as the coarse
    * bucket) → connected components → min-id canonical per semantic
    * cluster. DuckDB replays the whole chain with a recursive CTE (q103's
    * pattern, pairwise recomputed instead of scratch-passed — the
    * label-scoped self-join is cheap for the oracle at test scale). */
  val q117SemanticCanonical: QueryDef = sql(
    "q117_semantic_canonical",
    """WITH RECURSIVE
      |e AS (
      |  SELECT a.vec_id AS src, b.vec_id AS dst
      |  FROM embeddings a JOIN embeddings b
      |    ON a.label = b.label AND b.vec_id > a.vec_id
      |  WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
      |                                     CAST(b.embedding AS DOUBLE[])), 9) >= 0.3),
      |bidir AS (SELECT src AS a, dst AS b FROM e UNION SELECT dst, src FROM e),
      |nodes AS (SELECT DISTINCT a AS id FROM bidir),
      |reach AS (
      |  SELECT id AS src, id AS dst FROM nodes
      |  UNION
      |  SELECT r.src, e2.b FROM reach r JOIN bidir e2 ON e2.a = r.dst),
      |comp AS (SELECT src AS id, min(dst) AS component FROM reach GROUP BY src)
      |SELECT v.vec_id,
      |       COALESCE(comp.component, v.vec_id) AS keep_id,
      |       CAST(COALESCE(comp.component, v.vec_id) <> v.vec_id AS INTEGER) AS is_duplicate
      |FROM embeddings v
      |LEFT JOIN comp ON comp.id = v.vec_id
      |ORDER BY v.vec_id""".stripMargin) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    val pairs = graft.dedup.Dedup
      .embeddingNearDup(emb, "vec_id", "embedding", "label", threshold = 0.3)
      .select(col("id_a"), col("id_b"))
    graft.dedup.Dedup.canonicalize(pairs, emb, "vec_id")
      .select(col("vec_id"), col("keep_id"),
        col("is_duplicate").cast("int").as("is_duplicate"))
      .orderBy(col("vec_id"))
  }

  /** q111 at the OVERLAPPING operating point (width 8, stride 4) — the
    * shifted-duplicate catcher: a repeated region misaligned with the
    * stride-8 grid still shares a window with its source. Value-checks the
    * stride parameter surface the way q97/q98 do for the LSH thresholds.
    * With overlap, n_tokens_kept is a retention weight (adjacent kept
    * windows share tokens), documented on Curation.spanDedupStats. */
  val q118SpanDedupOverlap: QueryDef = sql(
    "q118_span_dedup_overlap",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sp AS (
      |  SELECT doc_id, i AS pos,
      |         md5(array_to_string(w[CAST(i * 4 + 1 AS INT):CAST(i * 4 + 8 AS INT)], ' ')) AS h,
      |         len(w[CAST(i * 4 + 1 AS INT):CAST(i * 4 + 8 AS INT)]) AS span_len,
      |         doc_id * 100000 + i AS okey
      |  FROM (SELECT doc_id, w,
      |               unnest(range(CAST(ceil(greatest(len(w) - 8, 0) / 4.0) AS BIGINT) + 1)) AS i
      |        FROM t)),
      |f AS (SELECT h, min(okey) AS first_key FROM sp GROUP BY h)
      |SELECT sp.doc_id,
      |       CAST(count(*) AS BIGINT) AS n_spans,
      |       CAST(sum(CASE WHEN okey <> first_key THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
      |       CAST(sum(CASE WHEN okey = first_key THEN span_len ELSE 0 END) AS BIGINT) AS n_tokens_kept
      |FROM sp JOIN f USING (h)
      |GROUP BY sp.doc_id
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    Curation.spanDedupStats(docs(s, d), "doc_id", "text",
        spanTokens = 8, strideOpt = Some(4))
      .orderBy(col("doc_id"))
  }

  /** q112 + q113 composed as actually used: the unigram LM trains on the
    * q112 TRAIN split only, and the held-out (valid/test) documents score
    * against it with add-0.5 smoothing — unseen tokens fall into the OOV
    * bucket, p = 0.5 / (N + 0.5·(V+1)) — so the evaluation split never
    * leaks into the model it is scored by. */
  val q119HeldoutLogprob: QueryDef = sql(
    "q119_heldout_logprob",
    """WITH h AS (
      |  SELECT doc_id, text,
      |         CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || '|split-v1'), 1, 2) < 'fa' THEN 'train'
      |              WHEN substr(md5(CAST(doc_id AS VARCHAR) || '|split-v1'), 1, 2) < 'fd' THEN 'valid'
      |              ELSE 'test' END AS split
      |  FROM documents),
      |dt AS (
      |  SELECT doc_id, split, tok, count(*) AS k
      |  FROM (SELECT doc_id, split, unnest(string_split(text, ' ')) AS tok FROM h)
      |  GROUP BY doc_id, split, tok),
      |vocab AS (SELECT tok, CAST(sum(k) AS BIGINT) AS cnt
      |          FROM dt WHERE split = 'train' GROUP BY tok),
      |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS v
      |        FROM vocab)
      |SELECT e.doc_id, e.split,
      |       CAST(sum(k) AS BIGINT) AS n_tokens,
      |       CAST(sum(CASE WHEN cnt IS NULL THEN k ELSE 0 END) AS BIGINT) AS n_oov,
      |       round(sum(CAST(k AS DOUBLE)
      |                 * log10((COALESCE(cnt, 0) + 0.5) / (n + 0.5 * (v + 1))))
      |             / sum(k), 6) AS mean_logprob
      |FROM dt e LEFT JOIN vocab USING (tok) CROSS JOIN tot
      |WHERE e.split <> 'train'
      |GROUP BY e.doc_id, e.split
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val withSplit = Curation.hashSplit(docs(s, d), "doc_id", seed = "split-v1")
    Curation.heldOutUnigramScore(withSplit, "doc_id", "text", "split")
      .select(col("doc_id"), col("split"), col("n_tokens"), col("n_oov"),
        oround(col("mean_logprob"), 6).as("mean_logprob"))
      .orderBy(col("doc_id"))
  }

  /** Order-2 LM scoring (q113 one order up): add-0.5-smoothed
    * p(t₂|t₁) from corpus bigram counts, per-doc mean log10 over token
    * transitions; context counts derive from the bigram table itself so
    * the conditional is consistent by construction. */
  val q120BigramLogprob: QueryDef = sql(
    "q120_bigram_logprob",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |vt AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v
      |       FROM (SELECT unnest(w) AS tok FROM t)),
      |dbg AS (
      |  SELECT doc_id, array_to_string(w[CAST(i AS INT):CAST(i + 1 AS INT)], ' ') AS g,
      |         count(*) AS k
      |  FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i
      |        FROM t WHERE len(w) >= 2)
      |  GROUP BY doc_id, g),
      |bg AS (SELECT g, CAST(sum(k) AS BIGINT) AS c12 FROM dbg GROUP BY g),
      |ctx AS (SELECT split_part(g, ' ', 1) AS t1, CAST(sum(c12) AS BIGINT) AS c1
      |        FROM bg GROUP BY t1)
      |SELECT dbg.doc_id,
      |       CAST(sum(k) AS BIGINT) AS n_transitions,
      |       round(sum(CAST(k AS DOUBLE)
      |                 * log10((c12 + 0.5) / (c1 + 0.5 * (v + 1))))
      |             / sum(k), 6) AS mean_logprob
      |FROM dbg JOIN bg USING (g)
      |JOIN ctx ON ctx.t1 = split_part(dbg.g, ' ', 1)
      |CROSS JOIN vt
      |GROUP BY dbg.doc_id
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    Curation.bigramLogprob(docs(s, d), "doc_id", "text")
      .select(col("doc_id"), col("n_transitions"),
        oround(col("mean_logprob"), 6).as("mean_logprob"))
      .orderBy(col("doc_id"))
  }

  /** q103's dedup graph with the PRODUCTION keep-rule: each near-dup
    * cluster keeps its LONGEST member (max n_chars, ties to min doc_id)
    * instead of the min id — what a pretraining dedup actually retains.
    * Same scratch-candidate mechanism as q103: the engine's LSH candidate
    * pairs go to parquet, and DuckDB replays Jaccard verification,
    * connected components (recursive CTE), and the per-cluster argmax. */
  val q121DedupKeepBest: QueryDef = {
    def p = graft.core.Scratch.lastDir("q121_dedup_keep_best")
    QueryDef.sql(
      "q121_dedup_keep_best",
      s"""WITH RECURSIVE
         |c AS (SELECT id_a, id_b FROM read_parquet('$p/*.parquet')),
         |t AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS tok
         |      FROM documents),
         |e AS (
         |  SELECT c.id_a AS src, c.id_b AS dst
         |  FROM c
         |  JOIN t a ON a.doc_id = c.id_a
         |  JOIN t b ON b.doc_id = c.id_b
         |  WHERE CAST(len(list_filter(a.tok, x -> list_contains(b.tok, x))) AS DOUBLE)
         |        / len(list_distinct(a.tok || b.tok)) >= 0.2),
         |bidir AS (SELECT src AS a, dst AS b FROM e UNION SELECT dst, src FROM e),
         |nodes AS (SELECT DISTINCT a AS id FROM bidir),
         |reach AS (
         |  SELECT id AS src, id AS dst FROM nodes
         |  UNION
         |  SELECT r.src, e2.b FROM reach r JOIN bidir e2 ON e2.a = r.dst),
         |comp AS (SELECT src AS id, min(dst) AS component FROM reach GROUP BY src),
         |m AS (SELECT d.doc_id, d.n_chars,
         |             COALESCE(comp.component, d.doc_id) AS component
         |      FROM documents d LEFT JOIN comp ON comp.id = d.doc_id),
         |best AS (
         |  SELECT component, doc_id AS keep_id,
         |         row_number() OVER (PARTITION BY component
         |                            ORDER BY n_chars DESC, doc_id ASC) AS rn
         |  FROM m)
         |SELECT m.doc_id, b.keep_id,
         |       CAST(b.keep_id <> m.doc_id AS INTEGER) AS is_duplicate
         |FROM m JOIN (SELECT component, keep_id FROM best WHERE rn = 1) b
         |  USING (component)
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docsDf = docs(s, d)
      val path = graft.core.Scratch.dir("q121_dedup_keep_best", d)
      graft.dedup.Dedup.minhashLshCandidates(docsDf, "doc_id", "text")
        .write.mode("overwrite").parquet(path)
      val verified = graft.dedup.Dedup.jaccardVerify(s.read.parquet(path),
        docsDf, "doc_id", "text", threshold = 0.2)
      graft.dedup.Dedup.canonicalizeBy(verified, docsDf, "doc_id", "n_chars")
        .select(col("doc_id"), col("keep_id"),
          col("is_duplicate").cast("int").as("is_duplicate"))
        .orderBy(col("doc_id"))
    }
  }

  /** FUZZY benchmark decontamination — q91's near-dup complement: training
    * docs (doc_id ≥ 10) that are MinHash-LSH near-duplicates of the
    * benchmark set (doc_id < 10), not just 5-gram-overlapping. Four
    * 1-hash bands of the q43 salted-md5 signatures generate candidates
    * across the two corpora (never within either — no self-join), then
    * exact token Jaccard ≥ 0.6 verifies. Whole chain is SQL-expressible
    * (the q43/q45 signature scheme), so DuckDB replays signatures, bands,
    * the cross join, and verification with no scratch table. Scale: the
    * benchmark band table is tiny → broadcast; the corpus streams past it;
    * verification touches candidates only. */
  val q122FuzzyDecontam: QueryDef = sql(
    "q122_fuzzy_decontam",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
      |sh AS (SELECT doc_id,
      |              CASE WHEN len(tok) >= 3
      |                   THEN list_transform(range(len(tok) - 2),
      |                        i -> tok[i + 1] || ' ' || tok[i + 2] || ' ' || tok[i + 3])
      |                   ELSE [] END AS shingles
      |       FROM t),
      |sigs AS (SELECT doc_id,
      |                [list_aggregate(list_transform(shingles, s -> md5('0' || s)), 'min'),
      |                 list_aggregate(list_transform(shingles, s -> md5('1' || s)), 'min'),
      |                 list_aggregate(list_transform(shingles, s -> md5('2' || s)), 'min'),
      |                 list_aggregate(list_transform(shingles, s -> md5('3' || s)), 'min')] AS sigl
      |         FROM sh WHERE len(shingles) > 0),
      |bands AS (SELECT doc_id, CAST(i AS VARCHAR) || '|' || sigl[i + 1] AS band
      |          FROM sigs, unnest(range(4)) AS u(i)),
      |cand AS (SELECT DISTINCT tr.doc_id AS train_id, be.doc_id AS bench_id
      |         FROM bands tr JOIN bands be USING (band)
      |         WHERE tr.doc_id >= 10 AND be.doc_id < 10),
      |tt AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS tok
      |       FROM documents)
      |SELECT c.train_id, c.bench_id,
      |       round(CAST(len(list_filter(a.tok, x -> list_contains(b.tok, x))) AS DOUBLE)
      |             / len(list_distinct(a.tok || b.tok)), 6) AS jaccard
      |FROM cand c
      |JOIN tt a ON a.doc_id = c.train_id
      |JOIN tt b ON b.doc_id = c.bench_id
      |WHERE CAST(len(list_filter(a.tok, x -> list_contains(b.tok, x))) AS DOUBLE)
      |      / len(list_distinct(a.tok || b.tok)) >= 0.6
      |ORDER BY train_id, bench_id""".stripMargin) { (s, d) =>
    def sig(salt: String) = graft.functions.salted_md5_min(col("tok"), salt)
    val bands = docs(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("tok"))
      .filter(size(col("tok")) >= 3)
      .select(col("doc_id"), explode(array(
        concat(lit("0|"), sig("0")), concat(lit("1|"), sig("1")),
        concat(lit("2|"), sig("2")), concat(lit("3|"), sig("3")))).as("band"))
    val bench = bands.filter(col("doc_id") < 10)
      .select(col("doc_id").as("id_b"), col("band"))
    val cand = bands.filter(col("doc_id") >= 10)
      .select(col("doc_id").as("id_a"), col("band"))
      .join(broadcast(bench), "band")
      .select(col("id_a"), col("id_b")).distinct()
    graft.dedup.Dedup.jaccardVerify(cand, docs(s, d), "doc_id", "text",
        threshold = 0.6)
      .select(col("id_a").as("train_id"), col("id_b").as("bench_id"),
        oround(col("jaccard"), 6).as("jaccard"))
      .orderBy(col("train_id"), col("bench_id"))
  }

  /** DSIR importance weights (arXiv:2302.03169) with the corpus's English
    * documents standing in as the in-domain target: hashed unigram+bigram
    * bucket LMs (256 md5-prefix buckets, add-0.5 smoothing), per-doc
    * log-likelihood ratio. DuckDB replays features, bucketing, both LMs,
    * and the ratio from first principles; both engines sum identical
    * per-bucket doubles, so the only float op is the final round-6.
    * Selection is deliberately downstream (top-k = ops 34/35, md5
    * acceptance = q115) — this query owns the statistic. */
  val q125DsirWeights: QueryDef = sql(
    "q125_dsir_weights",
    """WITH base AS (
      |  SELECT doc_id, lang = 'en' AS is_target, string_split(text, ' ') AS w
      |  FROM documents),
      |feats AS (
      |  SELECT doc_id, is_target, substr(md5(f), 1, 2) AS b
      |  FROM (
      |    SELECT doc_id, is_target, unnest(w) AS f FROM base
      |    UNION ALL
      |    SELECT doc_id, is_target,
      |           unnest(list_transform(range(1, len(w)),
      |                                 i -> w[CAST(i AS INT)] || ' ' || w[CAST(i + 1 AS INT)])) AS f
      |    FROM base WHERE len(w) >= 2)),
      |docb AS (
      |  SELECT doc_id, is_target, b, count(*) AS k FROM feats
      |  GROUP BY doc_id, is_target, b),
      |tgt AS (SELECT b, CAST(sum(k) AS BIGINT) AS ct FROM docb WHERE is_target GROUP BY b),
      |src AS (SELECT b, CAST(sum(k) AS BIGINT) AS cs FROM docb WHERE NOT is_target GROUP BY b),
      |tots AS (
      |  SELECT (SELECT CAST(sum(ct) AS BIGINT) FROM tgt) AS nt,
      |         (SELECT CAST(sum(cs) AS BIGINT) FROM src) AS ns)
      |SELECT doc_id, is_target,
      |       CAST(sum(k) AS BIGINT) AS n_feats,
      |       round(sum(CAST(k AS DOUBLE)
      |                 * (log10((COALESCE(ct, 0) + 0.5) / (nt + 128.0))
      |                    - log10((COALESCE(cs, 0) + 0.5) / (ns + 128.0)))), 6)
      |         AS log_weight
      |FROM docb LEFT JOIN tgt USING (b) LEFT JOIN src USING (b) CROSS JOIN tots
      |GROUP BY doc_id, is_target
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    Curation.dsirWeights(docs(s, d), "doc_id", "text", col("lang") === "en")
      .select(col("doc_id"), col("is_target"), col("n_feats"),
        oround(col("log_weight"), 6).as("log_weight"))
      .orderBy(col("doc_id"))
  }

  /** CCNet-style perplexity bucketing (arXiv:1911.00359): per-language
    * head/middle/tail thirds by the per-language-LM mean-logprob
    * distribution (higher logprob ⇔ lower perplexity ⇒ head). Thresholds
    * are exact interpolated percentiles (the q10/q18 parity surface); every
    * threshold compare is round-9 both engines per the repo float policy,
    * so last-ulp log/percentile drift cannot flip a bucket. DuckDB replays
    * the per-language LM, the quantile_cont cuts, and the bucket CASE. */
  val q126PerplexityBuckets: QueryDef = sql(
    "q126_perplexity_buckets",
    """WITH dt AS (
      |  SELECT doc_id, lang, tok, count(*) AS k
      |  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
      |        FROM documents)
      |  GROUP BY doc_id, lang, tok),
      |vocab AS (SELECT lang, tok, CAST(sum(k) AS BIGINT) AS cnt
      |          FROM dt GROUP BY lang, tok),
      |tot AS (SELECT lang, CAST(sum(cnt) AS BIGINT) AS n FROM vocab GROUP BY lang),
      |scored AS (
      |  SELECT doc_id, lang,
      |         sum(CAST(k AS DOUBLE) * log10(CAST(cnt AS DOUBLE) / n)) / sum(k) AS score,
      |         round(sum(CAST(k AS DOUBLE) * log10(CAST(cnt AS DOUBLE) / n)) / sum(k), 9) AS s9
      |  FROM dt JOIN vocab USING (lang, tok) JOIN tot USING (lang)
      |  GROUP BY doc_id, lang),
      |cuts AS (
      |  SELECT lang,
      |         round(quantile_cont(s9, 1.0/3), 9) AS t_lo,
      |         round(quantile_cont(s9, 2.0/3), 9) AS t_hi
      |  FROM scored GROUP BY lang)
      |SELECT doc_id, lang, round(score, 6) AS mean_logprob,
      |       CASE WHEN s9 >= t_hi THEN 'head'
      |            WHEN s9 >= t_lo THEN 'middle'
      |            ELSE 'tail' END AS bucket
      |FROM scored JOIN cuts USING (lang)
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    Curation.perplexityBuckets(docs(s, d), "doc_id", "text", "lang")
      .orderBy(col("doc_id"))
  }

  /** fastText-style quality-classifier inference (arXiv:1607.01759): bag
    * of hashed unigram+bigram features (4096 md5-prefix buckets), mean
    * pooling against a broadcast per-bucket weight table, sigmoid on top.
    * The weight table is a model ARTIFACT: the query materializes a
    * deterministic stub model (w(b) from md5("w|"+b), uniform in [−1, 1))
    * to scratch, and DuckDB reads those weights back and replays the
    * whole inference — features, bucketing, the weighted mean, sigmoid,
    * and the round-9 decision boundary — from first principles. */
  val q127QualityClassifier: QueryDef = {
    def p = graft.core.Scratch.lastDir("q127_quality_classifier")
    sql(
      "q127_quality_classifier",
      s"""WITH wt AS (SELECT b, w AS wgt FROM read_parquet('$p/weights/*.parquet')),
         |base AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |feats AS (
         |  SELECT doc_id, substr(md5(f), 1, 3) AS b
         |  FROM (
         |    SELECT doc_id, unnest(w) AS f FROM base
         |    UNION ALL
         |    SELECT doc_id,
         |           unnest(list_transform(range(1, len(w)),
         |                                 i -> w[CAST(i AS INT)] || ' ' || w[CAST(i + 1 AS INT)])) AS f
         |    FROM base WHERE len(w) >= 2)),
         |docb AS (SELECT doc_id, b, count(*) AS k FROM feats GROUP BY doc_id, b),
         |sc AS (
         |  SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_feats,
         |         sum(CAST(k AS DOUBLE) * wgt) / sum(k) AS logit
         |  FROM docb JOIN wt USING (b)
         |  GROUP BY doc_id)
         |SELECT doc_id, n_feats,
         |       round(logit, 6) AS logit,
         |       round(1.0 / (1.0 + exp(-logit)), 6) AS prob,
         |       CAST(round(logit, 9) >= 0 AS BIGINT) AS label
         |FROM sc
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      // deterministic stub model: 4096 buckets, w(b) ∈ [−1, 1) from the
      // first 4 hex chars of md5("w|" + b) — an artifact any trained model
      // would replace; dumped to scratch so the oracle reads the SAME table
      val b = format_string("%03x", col("id"))
      val wts = s.range(4096).select(b.as("b"),
        (conv(substring(md5(concat(lit("w|"), b)), 1, 4), 16, 10)
          .cast("double") / 32768.0 - 1.0).as("w"))
      val path = graft.core.Scratch.dir("q127_quality_classifier", d)
      wts.coalesce(1).write.mode("overwrite").parquet(s"$path/weights")
      Curation.linearClassifierScore(
          docs(s, d), "doc_id", "text",
          s.read.parquet(s"$path/weights"))
        .select(col("doc_id"), col("n_feats"),
          oround(col("logit"), 6).as("logit"),
          oround(col("prob"), 6).as("prob"),
          (oround(col("logit"), 9) >= 0).cast("long").as("label"))
        .orderBy(col("doc_id"))
    }
  }

  /** Quality-classifier TRAINING, oracle-checked exactly (the training
    * complement of q127's inference): 3 full-batch gradient-descent steps
    * of a hashed-unigram hard-sigmoid logistic regression
    * (`Curation.hardLrTrain`) over `documents` with label lang = 'en'.
    * The entire loop is ppm INTEGER arithmetic — hard sigmoid
    * clamp(1/2 + t/4), truncating division, integer gradient sums — so a
    * training loop that would normally be a cross-engine
    * float-accumulation minefield is order-independent and exactly
    * replayable: the oracle unrolls all three steps as CTE chains with
    * the identical integer ops (DuckDB's `//` floors, so every signed
    * division is wrapped as -((-a) // b) to match Spark's
    * truncate-toward-zero `div`). Output: the 64-bucket trained weight
    * vector in ppm. */
  val q153LrTrain: QueryDef = {
    def dt(a: String, b: String): String = graft.queries.sqlDivT(a, b)
    def step(i: Int, prev: String): String =
      s"""s$i AS (
         |  SELECT f.doc_id, CAST(sum(f.x * w.w) AS BIGINT) AS z
         |  FROM feats f JOIN $prev w USING (b) GROUP BY f.doc_id),
         |p$i AS (
         |  SELECT s.doc_id,
         |         LEAST(1000000, GREATEST(0,
         |           500000 + ${dt(dt("s.z", "nd.n"), "4")})) AS p
         |  FROM s$i s JOIN nd USING (doc_id)),
         |e$i AS (
         |  SELECT lab.doc_id, lab.y * 1000000 - p.p AS err
         |  FROM lab JOIN p$i p USING (doc_id)),
         |g$i AS (
         |  SELECT f.b, CAST(sum(${dt("e.err * f.x", "nd.n")}) AS BIGINT) AS g
         |  FROM feats f JOIN e$i e USING (doc_id) JOIN nd USING (doc_id)
         |  GROUP BY f.b),
         |w$i AS (
         |  SELECT w.b,
         |         CAST(w.w + ${dt(s"500000 * (${dt("COALESCE(g.g, 0)", "tot.m")})", "1000000")} AS BIGINT) AS w
         |  FROM $prev w LEFT JOIN g$i g USING (b) CROSS JOIN tot)""".stripMargin
    sql(
      "q153_lr_train",
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         |feats AS (
         |  SELECT doc_id, ('0x' || substr(md5(tok), 1, 2))::BIGINT % 64 AS b,
         |         CAST(count(*) AS BIGINT) AS x
         |  FROM toks GROUP BY doc_id, 2),
         |nd AS (SELECT doc_id, CAST(sum(x) AS BIGINT) AS n FROM feats GROUP BY doc_id),
         |lab AS (SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
         |        FROM documents),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS m FROM documents),
         |w0 AS (SELECT unnest(range(0, 64)) AS b, CAST(0 AS BIGINT) AS w),
         |${step(1, "w0")},
         |${step(2, "w1")},
         |${step(3, "w2")}
         |SELECT b, w AS w_ppm FROM w3 ORDER BY b""".stripMargin) { (s, d) =>
      Curation.hardLrTrain(docs(s, d), "doc_id", "text",
          col("lang") === "en", buckets = 64, steps = 3)
        .select(col("b"), col("w_ppm"))
        .orderBy(col("b"))
    }
  }

  /** Iterative BPE tokenizer training, oracle-checked exactly — q116's
    * single merge step run as the REAL 3-iteration training loop
    * (`Curation.bpeTrain`): per step the top-frequency adjacent symbol
    * pair (lexicographic tiebreak) becomes a merge rule and is applied
    * to every word state by leftmost non-overlapping space-delimited
    * replace — integer counts and string ops only, so DuckDB unrolls
    * all three iterations as CTE chains and the learned rules
    * hash-match. Completes the integer-exact training trilogy
    * (q153 classifier, q154 k-means, q155 tokenizer). */
  val q155BpeTrain: QueryDef = {
    def step(i: Int, prev: String): String =
      s"""pc$i AS (
         |  SELECT syms[CAST(i AS INT)] AS a, syms[CAST(i AS INT) + 1] AS b,
         |         CAST(sum(f) AS BIGINT) AS cnt
         |  FROM (
         |    SELECT f, syms, unnest(range(1, len(syms))) AS i
         |    FROM (SELECT f, string_split(s, ' ') AS syms FROM $prev)
         |    WHERE len(syms) >= 2)
         |  GROUP BY 1, 2),
         |b$i AS (SELECT a, b, cnt FROM pc$i ORDER BY cnt DESC, a, b LIMIT 1),
         |st$i AS (
         |  SELECT f, trim(regexp_replace(
         |           replace(' ' || replace(s, ' ', '  ') || ' ',
         |                   ' ' || b.a || '  ' || b.b || ' ',
         |                   ' ' || b.a || b.b || ' '),
         |           ' +', ' ', 'g')) AS s
         |  FROM $prev CROSS JOIN b$i b)""".stripMargin
    sql(
      "q155_bpe_train",
      s"""WITH words AS (
         |  SELECT tok, CAST(count(*) AS BIGINT) AS f
         |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
         |  GROUP BY tok),
         |st0 AS (
         |  SELECT f, array_to_string(list_transform(range(1, len(tok) + 1),
         |           i -> substr(tok, CAST(i AS INT), 1)), ' ') AS s
         |  FROM words),
         |${step(1, "st0")},
         |${step(2, "st1")},
         |${step(3, "st2")}
         |SELECT CAST(1 AS BIGINT) AS step, a || b AS merged,
         |       a AS l_sym, b AS r_sym, cnt FROM b1
         |UNION ALL
         |SELECT CAST(2 AS BIGINT), a || b, a, b, cnt FROM b2
         |UNION ALL
         |SELECT CAST(3 AS BIGINT), a || b, a, b, cnt FROM b3
         |ORDER BY step""".stripMargin) { (s, d) =>
      Curation.bpeTrain(docs(s, d), "text", merges = 3)
        .select(col("step"), col("merged"), col("l_sym"), col("r_sym"), col("cnt"))
        .orderBy(col("step"))
    }
  }

  /** BPE train→APPLY, oracle-checked end to end — the inference half that
    * completes q155's training loop (a user of the reference tokenizes
    * with the rules it learned, not just learns them): the engine trains
    * 3 merges (`Curation.bpeTrain`, driver-held rules = the model
    * artifact), then `Curation.bpeApply` folds them into every document's
    * words with the SAME leftmost non-overlapping doubled-delimiter
    * replace, emitting per-doc post-merge token counts and an md5
    * fingerprint of the full tokenization. DuckDB re-derives the rules
    * with q155's unrolled CTE chain AND re-applies them word-by-word
    * (ordinality-ordered string_agg rebuilds the same fingerprint
    * string), so a divergence in training, application order, or merge
    * semantics flips the hash. */
  val q162BpeApply: QueryDef = {
    // every merge step falls back to IDENTITY when its b$i is empty (the
    // trainer's exhausted-pairs case: bpeTrain stops learning, bpeApply
    // applies only the learned rules — a CROSS JOIN against an empty rule
    // would instead empty the whole chain and desync the two engines on a
    // sparse corpus). A scalar subquery over an empty CTE is NULL, so the
    // count() CASE gates the replace.
    def mergeCase(i: Int): String =
      // single line: a multi-line margin string here would pass through
      // the enclosing templates' stripMargin a second time and eat any
      // line-leading || operators
      s"CASE WHEN (SELECT count(*) FROM b$i) = 0 THEN s " +
        s"ELSE trim(regexp_replace(replace(' ' || replace(s, ' ', '  ') || ' ', " +
        s"' ' || (SELECT a FROM b$i) || '  ' || (SELECT b FROM b$i) || ' ', " +
        s"' ' || (SELECT a FROM b$i) || (SELECT b FROM b$i) || ' '), " +
        "' +', ' ', 'g')) END"
    def trainStep(i: Int, prev: String): String =
      s"""pc$i AS (
         |  SELECT syms[CAST(i AS INT)] AS a, syms[CAST(i AS INT) + 1] AS b,
         |         CAST(sum(f) AS BIGINT) AS cnt
         |  FROM (
         |    SELECT f, syms, unnest(range(1, len(syms))) AS i
         |    FROM (SELECT f, string_split(s, ' ') AS syms FROM $prev)
         |    WHERE len(syms) >= 2)
         |  GROUP BY 1, 2),
         |b$i AS (SELECT a, b, cnt FROM pc$i ORDER BY cnt DESC, a, b LIMIT 1),
         |st$i AS (
         |  SELECT f, ${mergeCase(i)} AS s
         |  FROM $prev)""".stripMargin
    def applyStep(i: Int, prev: String): String =
      s"""ap$i AS (
         |  SELECT doc_id, wi, ${mergeCase(i)} AS s
         |  FROM $prev)""".stripMargin
    sql(
      "q162_bpe_apply",
      s"""WITH words AS (
         |  SELECT tok, CAST(count(*) AS BIGINT) AS f
         |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
         |  GROUP BY tok),
         |st0 AS (
         |  SELECT f, array_to_string(list_transform(range(1, len(tok) + 1),
         |           i -> substr(tok, CAST(i AS INT), 1)), ' ') AS s
         |  FROM words),
         |${trainStep(1, "st0")},
         |${trainStep(2, "st1")},
         |${trainStep(3, "st2")},
         |docw AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
         |         generate_subscripts(string_split(text, ' '), 1) AS wi
         |  FROM documents),
         |ap0 AS (
         |  SELECT doc_id, wi, array_to_string(list_transform(range(1, len(tok) + 1),
         |           i -> substr(tok, CAST(i AS INT), 1)), ' ') AS s
         |  FROM docw),
         |${applyStep(1, "ap0")},
         |${applyStep(2, "ap1")},
         |${applyStep(3, "ap2")}
         |SELECT doc_id,
         |       CAST(sum(len(string_split(s, ' '))) AS BIGINT) AS n_tokens,
         |       md5(string_agg(s, '|' ORDER BY wi)) AS toks_md5
         |FROM ap3
         |GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      // the rules are the config-bounded model artifact (3 rows) — the
      // q153/q154 driver-state discipline
      val rules = Curation.bpeTrain(docs(s, d), "text", merges = 3)
        .orderBy(col("step"))
        .select(col("l_sym"), col("r_sym"))
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq
      Curation.bpeApply(docs(s, d), "doc_id", "text", rules)
        .orderBy(col("doc_id"))
    }
  }

  /** The END-TO-END curation pipeline, composed from the verified pieces
    * the way a training-data run actually chains them:
    * quality funnel (q114's rules, kept docs only) → MinHash-LSH near-dup
    * canonicalization (the SQL-expressible q43/q122 salted-md5 scheme:
    * 4 one-hash bands → candidate self-join → exact Jaccard ≥ 0.5 →
    * connected components → min-id representative) → deterministic hash
    * split (q112's buckets, seed pipe-v1) → per-split token/512-window
    * accounting (q108's pure-integer math). Output: one row per split.
    *
    * DuckDB replays the WHOLE chain independently — funnel rules,
    * signatures, banding, the candidate join, Jaccard verification,
    * recursive-CTE components, the split thresholds, and the integer
    * window count — so an error in ANY stage (or in how the stages
    * compose: dedup must run on funnel survivors, the split on dedup
    * survivors) flips the 3-row hash. No scratch table anywhere.
    *
    * Scale: every stage keeps its own audited shape — per-row funnel
    * math, banded equi-join candidates (never all-pairs), star-contraction
    * CC above the local gate, zero-shuffle split, one final 3-group
    * aggregate. */
  val q129CurationPipeline: QueryDef = sql(
    "q129_curation_pipeline",
    """WITH RECURSIVE
      |s AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
      |r AS (
      |  SELECT doc_id, text, w, len(w) AS n_tok,
      |         CAST(len(list_filter(w, t -> t IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
      |           / len(w) AS stop_ratio,
      |         CASE WHEN len(w) >= 3
      |              THEN 1.0 - CAST(len(list_distinct(list_transform(range(len(w) - 2),
      |                     i -> w[i + 1] || ' ' || w[i + 2] || ' ' || w[i + 3]))) AS DOUBLE)
      |                   / (len(w) - 2)
      |              ELSE 0.0 END AS dup3
      |  FROM s),
      |kept AS (
      |  SELECT doc_id, text, w FROM r
      |  WHERE NOT (n_tok < 20) AND NOT (n_tok > 90)
      |    AND NOT (stop_ratio < 0.02) AND NOT (dup3 > 0.02)),
      |sh AS (SELECT doc_id,
      |              CASE WHEN len(w) >= 3
      |                   THEN list_transform(range(len(w) - 2),
      |                        i -> w[i + 1] || ' ' || w[i + 2] || ' ' || w[i + 3])
      |                   ELSE [] END AS shingles
      |       FROM kept),
      |sigs AS (SELECT doc_id,
      |                [list_aggregate(list_transform(shingles, x -> md5('0' || x)), 'min'),
      |                 list_aggregate(list_transform(shingles, x -> md5('1' || x)), 'min'),
      |                 list_aggregate(list_transform(shingles, x -> md5('2' || x)), 'min'),
      |                 list_aggregate(list_transform(shingles, x -> md5('3' || x)), 'min')] AS sigl
      |         FROM sh WHERE len(shingles) > 0),
      |bands AS (SELECT doc_id, CAST(i AS VARCHAR) || '|' || sigl[i + 1] AS band
      |          FROM sigs, unnest(range(4)) AS u(i)),
      |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |         FROM bands a JOIN bands b USING (band)
      |         WHERE b.doc_id > a.doc_id),
      |tt AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS tok FROM kept),
      |ver AS (SELECT id_a, id_b FROM cand
      |        JOIN tt a ON a.doc_id = id_a
      |        JOIN tt b ON b.doc_id = id_b
      |        WHERE CAST(len(list_filter(a.tok, x -> list_contains(b.tok, x))) AS DOUBLE)
      |              / len(list_distinct(a.tok || b.tok)) >= 0.5),
      |bidir AS (SELECT id_a AS a, id_b AS b FROM ver
      |          UNION SELECT id_b, id_a FROM ver),
      |nodes AS (SELECT DISTINCT a AS id FROM bidir),
      |reach AS (
      |  SELECT id AS src, id AS dst FROM nodes
      |  UNION
      |  SELECT r2.src, e.b FROM reach r2 JOIN bidir e ON e.a = r2.dst),
      |comp AS (SELECT src AS id, min(dst) AS component FROM reach GROUP BY src),
      |uniq AS (
      |  SELECT k.doc_id, len(k.w) AS n_tokens FROM kept k
      |  LEFT JOIN comp ON comp.id = k.doc_id
      |  WHERE COALESCE(comp.component, k.doc_id) = k.doc_id),
      |sp AS (
      |  SELECT n_tokens,
      |         CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || '|pipe-v1'), 1, 2) < 'fa' THEN 'train'
      |              WHEN substr(md5(CAST(doc_id AS VARCHAR) || '|pipe-v1'), 1, 2) < 'fd' THEN 'valid'
      |              ELSE 'test' END AS split
      |  FROM uniq)
      |SELECT split,
      |       CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
      |       CAST((CAST(sum(n_tokens) AS BIGINT) + 511) // 512 AS BIGINT) AS n_windows
      |FROM sp GROUP BY split
      |ORDER BY split""".stripMargin) { (s, d) =>
    import graft.dedup.Dedup
    val stop = Seq("the", "a", "of", "and", "to")
    // The funnel is the most expensive per-row expression in the query
    // and `kept` has FOUR consumers (bands, the verify's token sides,
    // canonicalize, the final split agg) — without a materialization
    // boundary each consumer re-runs it from the scan (and on a
    // single-row-group input, serialized on one task). The explicit
    // doc_id repartition puts ONE exchange above the funnel that every
    // consumer subtree shares via ReusedExchange (the q207 discipline:
    // an exchange, unlike a cache, keeps AQE planning and costs no
    // executor memory), and parallelizes the downstream tokenizations.
    val kept = docs(s, d)
      .withColumn("stage",
        Curation.funnelStage(col("text"), 20, 90, 0.02, 0.02, stop))
      .filter(col("stage") === "5_kept").drop("stage")
      .repartition(col("doc_id"))
    // SQL-replayable LSH (the q43/q122 salted-md5 scheme, one hash/band)
    def sig(salt: String) = graft.functions.salted_md5_min(col("tok"), salt)
    val bands = kept.select(col("doc_id"), split(col("text"), " ").as("tok"))
      .filter(size(col("tok")) >= 3)
      .select(col("doc_id"), explode(array(
        concat(lit("0|"), sig("0")), concat(lit("1|"), sig("1")),
        concat(lit("2|"), sig("2")), concat(lit("3|"), sig("3")))).as("band"))
    val cand = bands.select(col("band"), col("doc_id").as("id_a"))
      .join(bands.select(col("band"), col("doc_id").as("id_b")), "band")
      .filter(col("id_b") > col("id_a"))
      .select(col("id_a"), col("id_b")).distinct()
    val verified = Dedup.jaccardVerify(cand, kept, "doc_id", "text",
      threshold = 0.5)
    val uniq = kept.join(
      Dedup.canonicalize(verified, kept, "doc_id")
        .filter(!col("is_duplicate")).select("doc_id"),
      "doc_id")
    Curation.hashSplit(uniq, "doc_id", seed = "pipe-v1")
      .select(col("split"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .groupBy(col("split"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("n_tokens")).cast("long").as("n_tokens"))
      .withColumn("n_windows", expr("CAST((n_tokens + 511) DIV 512 AS BIGINT)"))
      .orderBy(col("split"))
  }

  /** Trainer-feed shard packing, value-checked END TO END (the q164
    * mechanism applied to ustar): per document a blob is synthesized from
    * an integer formula, packed into byte-exact tar shards
    * ([[graft.sources.TarShards]] — content-addressed 256-way bucketed
    * assignment, NO global sort), and the emitted index comes from the
    * independent checksum-verifying archive walk with `byte_sum` computed
    * from the SLICED payload. The oracle replays the whole layout in SQL:
    * salted-md5 order, hash-prefix bucketing, the per-bucket running
    * footprint that numbers shards, and the 512-byte header/padding
    * arithmetic of the ustar spec — a wrong pad, a misplaced header, or a
    * drifting assignment hash-mismatches. */
  val q167TarShards: QueryDef = sql(
    "q167_tar_shards",
    """WITH m AS (
      |  SELECT doc_id, 'doc-' || CAST(doc_id AS VARCHAR) AS name,
      |         100 + (doc_id * 13) % 923 AS sz,
      |         md5('tar|doc-' || CAST(doc_id AS VARCHAR)) AS ord
      |  FROM documents),
      |e AS (
      |  SELECT *, substr(ord, 1, 2) AS bucket,
      |         512 + ((sz + 511) // 512) * 512 AS entry_bytes
      |  FROM m),
      |pos AS (
      |  SELECT *, COALESCE(sum(entry_bytes) OVER (PARTITION BY bucket ORDER BY ord
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_off
      |  FROM e),
      |sh AS (
      |  SELECT *, bucket || '-' || CAST(start_off // 8192 AS VARCHAR) AS shard_id
      |  FROM pos),
      |ish AS (
      |  SELECT *,
      |         CAST(row_number() OVER (PARTITION BY shard_id ORDER BY ord) - 1 AS INT) AS member_no,
      |         512 + COALESCE(sum(entry_bytes) OVER (PARTITION BY shard_id ORDER BY ord
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS data_offset,
      |         sum(entry_bytes) OVER (PARTITION BY shard_id) + 1024 AS shard_len,
      |         count(*) OVER (PARTITION BY shard_id) AS shard_members
      |  FROM sh),
      |b AS (
      |  SELECT doc_id, sum((doc_id * 31 + u.j * 7) % 256) AS byte_sum
      |  FROM m CROSS JOIN range(1023) u(j) WHERE u.j < sz GROUP BY doc_id)
      |SELECT ish.shard_id, ish.member_no, ish.name,
      |       CAST(ish.data_offset AS BIGINT) AS data_offset,
      |       CAST(ish.sz AS BIGINT) AS size,
      |       CAST(b.byte_sum AS BIGINT) AS byte_sum,
      |       CAST(ish.shard_len AS BIGINT) AS shard_len,
      |       CAST(ish.shard_members AS INT) AS n_members
      |FROM ish JOIN b ON ish.doc_id = b.doc_id
      |ORDER BY shard_id, member_no""".stripMargin) { (s, d) =>
    import s.implicits._
    val blobs = docs(s, d).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val sz = (100 + (id * 13) % 923).toInt
          ("doc-" + id,
            Array.tabulate(sz)(j => ((id * 31 + j * 7) % 256).toByte))
        }
      }
      .toDF("name", "bytes")
    val shards = graft.sources.TarShards.pack(blobs, targetShardBytes = 8192)
    graft.sources.TarShards.index(shards)
      .orderBy(col("shard_id"), col("member_no"))
  }

  /** Exact Mann–Whitney AUC of a quality score against class labels — the
    * EVALUATION step that closes the classifier loop (q127 scores, q153
    * trains, this measures). Score = the q148 stopword-density ppm integer;
    * task = one-vs-rest language identification (5 rows, one per language
    * evaluated as the positive class).
    *
    * The statistic is computed without ever enumerating pairs: the corpus
    * collapses to a per-(language, score) histogram (one shuffle, output
    * bounded by |langs|·10^6, not by corpus size), then
    * `u2 = Σ pos·(2·negBelow + neg)` — ties at half credit, kept doubled
    * so the whole computation is integer-exact in both engines — and
    * `auc_ppm = (10^6·u2) div (2·nPos·nNeg)`. The running `negBelow` is a
    * window over DISTINCT scores per language (≤10^6 rows/partition), not
    * over documents. */
  val q178AucEval: QueryDef = sql(
    "q178_auc_eval",
    """WITH s AS (
      |  SELECT doc_id, lang,
      |         (CAST(len(list_filter(string_split(text, ' '),
      |                    t -> t IN ('the', 'a', 'of', 'and', 'to'))) AS BIGINT)
      |          * 1000000) // len(string_split(text, ' ')) AS sw_ppm
      |  FROM documents),
      |langs AS (SELECT DISTINCT lang AS eval_lang FROM documents),
      |hist AS (
      |  SELECT l.eval_lang, s.sw_ppm AS sc,
      |         sum(CASE WHEN s.lang = l.eval_lang THEN 1 ELSE 0 END) AS pos_n,
      |         sum(CASE WHEN s.lang = l.eval_lang THEN 0 ELSE 1 END) AS neg_n
      |  FROM s CROSS JOIN langs l
      |  GROUP BY 1, 2),
      |r AS (
      |  SELECT eval_lang, pos_n, neg_n,
      |         coalesce(sum(neg_n) OVER (PARTITION BY eval_lang ORDER BY sc
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |           AS neg_below
      |  FROM hist),
      |a AS (
      |  SELECT eval_lang,
      |         CAST(sum(pos_n) AS BIGINT) AS n_pos,
      |         CAST(sum(neg_n) AS BIGINT) AS n_neg,
      |         CAST(sum(pos_n * (2 * neg_below + neg_n)) AS BIGINT) AS u2
      |  FROM r GROUP BY eval_lang)
      |SELECT eval_lang, n_pos, n_neg, u2,
      |       CAST((u2 * 1000000) // (2 * n_pos * n_neg) AS BIGINT) AS auc_ppm
      |FROM a ORDER BY eval_lang""".stripMargin) { (s, d) =>
    val scored = docs(s, d).select(col("doc_id"), col("lang"),
      expr("(CAST(size(filter(split(text, ' '), " +
        "t -> t IN ('the', 'a', 'of', 'and', 'to'))) AS BIGINT) * 1000000) " +
        "div size(split(text, ' '))").as("sw_ppm"))
    val langs = scored.select(col("lang").as("eval_lang")).distinct()
    val tasks = scored.crossJoin(broadcast(langs))
      .withColumn("is_pos", (col("lang") === col("eval_lang")).cast("int"))
    graft.text.Eval.rankAucByGroup(tasks, "eval_lang", "sw_ppm", "is_pos")
      .orderBy(col("eval_lang"))
  }

  /** Exact average precision (non-interpolated Σ prec@k — the PR-curve
    * companion to q178's ROC rank-AUC; same score, same one-vs-rest
    * language task) with the deterministic (score DESC, doc_id ASC)
    * tie-break. The per-term `(tp·10^9) div rank` floor keeps the whole
    * statistic integer (float policy), and the shape never sorts the
    * corpus globally: above-score terms come from the q178 histogram
    * prefix, tie-local terms from a window bounded by the largest tie
    * block — see `Eval.averagePrecisionByGroup`. */
  val q201ApEval: QueryDef = sql(
    "q201_ap_eval",
    """WITH s AS (
      |  SELECT doc_id, lang,
      |         (CAST(len(list_filter(string_split(text, ' '),
      |                    t -> t IN ('the', 'a', 'of', 'and', 'to'))) AS BIGINT)
      |          * 1000000) // len(string_split(text, ' ')) AS sw_ppm
      |  FROM documents),
      |langs AS (SELECT DISTINCT lang AS eval_lang FROM documents),
      |b AS (
      |  SELECT l.eval_lang, s.doc_id, s.sw_ppm AS sc,
      |         CASE WHEN s.lang = l.eval_lang THEN 1 ELSE 0 END AS is_pos
      |  FROM s CROSS JOIN langs l),
      |hist AS (
      |  SELECT eval_lang, sc, CAST(sum(is_pos) AS BIGINT) AS pos_n,
      |         CAST(count(*) AS BIGINT) AS n
      |  FROM b GROUP BY 1, 2),
      |pre AS (
      |  SELECT eval_lang, sc,
      |         CAST(coalesce(sum(pos_n) OVER (PARTITION BY eval_lang ORDER BY sc DESC
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS pos_above,
      |         CAST(coalesce(sum(n) OVER (PARTITION BY eval_lang ORDER BY sc DESC
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_above
      |  FROM hist),
      |r AS (
      |  SELECT b.eval_lang, b.is_pos,
      |         pre.n_above + row_number() OVER (PARTITION BY b.eval_lang, b.sc
      |           ORDER BY b.doc_id) AS rnk,
      |         pre.pos_above + CAST(sum(b.is_pos) OVER (PARTITION BY b.eval_lang, b.sc
      |           ORDER BY b.doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tp
      |  FROM b JOIN pre ON b.eval_lang = pre.eval_lang AND b.sc = pre.sc),
      |a AS (
      |  SELECT eval_lang, CAST(sum(is_pos) AS BIGINT) AS n_pos,
      |         CAST(count(*) - sum(is_pos) AS BIGINT) AS n_neg,
      |         CAST(sum(CASE WHEN is_pos = 1 THEN (tp * 1000000000) // rnk
      |                       ELSE 0 END) AS BIGINT) AS ap_e9_sum
      |  FROM r GROUP BY 1)
      |SELECT eval_lang, n_pos, n_neg, ap_e9_sum,
      |       CAST(CASE WHEN n_pos > 0 THEN ap_e9_sum // (n_pos * 1000) END AS BIGINT) AS ap_ppm
      |FROM a ORDER BY eval_lang""".stripMargin) { (s, d) =>
    val scored = docs(s, d).select(col("doc_id"), col("lang"),
      expr("(CAST(size(filter(split(text, ' '), " +
        "t -> t IN ('the', 'a', 'of', 'and', 'to'))) AS BIGINT) * 1000000) " +
        "div size(split(text, ' '))").as("sw_ppm"))
    val langs = scored.select(col("lang").as("eval_lang")).distinct()
    val tasks = scored.crossJoin(broadcast(langs))
      .withColumn("is_pos", (col("lang") === col("eval_lang")).cast("int"))
    graft.text.Eval.averagePrecisionByGroup(tasks, "eval_lang", "doc_id",
        "sw_ppm", "is_pos")
      .orderBy(col("eval_lang"))
  }

  /** Corpus-level modified n-gram precision (the BLEU core, Papineni et
    * al. 2002) — `Eval.ngramPrecision`, the generation-eval companion to
    * q178/q201/q191's classifier metrics. The "candidate" is a
    * deterministic lossy paraphrase of each document (1-based positions
    * ≡ 1 mod 7 dropped, positions ≡ 4 mod 7 DOUBLED — both engines
    * build it with the same indexed per-token list expansion), the
    * document itself is the reference, so every branch is exercised:
    * drops depress higher-n precision more than unigram (a shifted
    * window breaks n-grams), and the stutter makes candidate counts
    * EXCEED reference counts so the clip genuinely binds (unigram
    * precision < 1). Per
    * (lang, n ∈ 1..4): clipped matches, candidate total, precision on
    * the ppm grid, with candidate/reference token totals and their ppm
    * ratio (the brevity-penalty argument) alongside. */
  val q205BleuEval: QueryDef = sql(
    "q205_bleu_eval",
    """WITH base AS (
      |  -- candidate rebuilt split(join(...)) exactly like the engine's
      |  -- string contract, so a fully-dropped doc is [''] in BOTH engines
      |  SELECT lang, doc_id,
      |         string_split(array_to_string(flatten(
      |           list_transform(string_split(text, ' '), (t, i) ->
      |             CASE WHEN i % 7 = 1 THEN []
      |                  WHEN i % 7 = 4 THEN [t, t]
      |                  ELSE [t] END)),
      |           ' '), ' ') AS c_arr,
      |         string_split(text, ' ') AS r_arr
      |  FROM documents),
      |ns AS (SELECT unnest(generate_series(1, 4)) AS n),
      |cg AS (
      |  SELECT lang, doc_id, n, gram, CAST(count(*) AS BIGINT) AS c_cnt
      |  FROM (SELECT lang, doc_id, n,
      |          unnest(list_transform(generate_series(1, len(c_arr) - n + 1),
      |            i -> array_to_string(c_arr[i:i+n-1], ' '))) AS gram
      |        FROM base CROSS JOIN ns)
      |  GROUP BY 1, 2, 3, 4),
      |rg AS (
      |  SELECT lang, doc_id, n, gram, CAST(count(*) AS BIGINT) AS r_cnt
      |  FROM (SELECT lang, doc_id, n,
      |          unnest(list_transform(generate_series(1, len(r_arr) - n + 1),
      |            i -> array_to_string(r_arr[i:i+n-1], ' '))) AS gram
      |        FROM base CROSS JOIN ns)
      |  GROUP BY 1, 2, 3, 4),
      |cl AS (
      |  SELECT cg.lang, cg.n,
      |         CAST(sum(least(cg.c_cnt, coalesce(rg.r_cnt, 0))) AS BIGINT) AS match_n,
      |         CAST(sum(cg.c_cnt) AS BIGINT) AS total_n
      |  FROM cg LEFT JOIN rg ON cg.lang = rg.lang AND cg.doc_id = rg.doc_id
      |                      AND cg.n = rg.n AND cg.gram = rg.gram
      |  GROUP BY 1, 2),
      |lens AS (
      |  SELECT lang, CAST(sum(len(c_arr)) AS BIGINT) AS c_tokens,
      |         CAST(sum(len(r_arr)) AS BIGINT) AS r_tokens
      |  FROM base GROUP BY lang)
      |SELECT cl.lang, CAST(cl.n AS INT) AS n, match_n, total_n,
      |       CAST(CASE WHEN total_n > 0
      |                 THEN (match_n * 1000000) // total_n END AS BIGINT) AS prec_ppm,
      |       c_tokens, r_tokens,
      |       CAST(CASE WHEN r_tokens > 0
      |                 THEN (c_tokens * 1000000) // r_tokens END AS BIGINT) AS len_ratio_ppm
      |FROM cl JOIN lens USING (lang)
      |ORDER BY cl.lang, cl.n""".stripMargin) { (s, d) =>
    val pairs = docs(s, d).select(col("lang"), col("doc_id"),
      expr("array_join(flatten(transform(split(text, ' '), (t, i) -> " +
        "CASE WHEN i % 7 = 0 THEN array() " +
        "WHEN i % 7 = 3 THEN array(t, t) ELSE array(t) END)), ' ')")
        .as("cand"),
      col("text").as("ref"))
    graft.text.Eval.ngramPrecision(pairs, "lang", "doc_id", "cand", "ref",
        maxN = 4)
      .orderBy(col("lang"), col("n"))
  }

  /** Corpus-level chrF2 (Popović, WMT 2015) — `Eval.chrF`, the CHARACTER
    * n-gram F-β generation metric beside q205's word-level BLEU core
    * (chrF survives tokenizer drift and morphology — its original
    * motivation). Same deterministic lossy paraphrase as q205 (positions
    * ≡ 1 mod 7 dropped, ≡ 4 mod 7 doubled) so the two metrics grade the
    * same degradation: per (lang, n ∈ 1..6) clipped char-n-gram matches
    * over whitespace-stripped strings, P/R/F2 on the ppm grid (β = 2:
    * recall weighted 4×), and the per-lang mean F2 over orders. The
    * char-gram side uses the codegen'd `char_shingles` kernel; the
    * oracle replays paraphrase, space-stripping, all six gram orders,
    * the clip join, and every ratio. */
  val q239ChrfEval: QueryDef = sql(
    "q239_chrf_eval",
    """WITH base AS (
      |  SELECT lang, doc_id,
      |         replace(array_to_string(flatten(
      |           list_transform(string_split(text, ' '), (t, i) ->
      |             CASE WHEN i % 7 = 1 THEN []
      |                  WHEN i % 7 = 4 THEN [t, t]
      |                  ELSE [t] END)),
      |           ' '), ' ', '') AS c_str,
      |         replace(text, ' ', '') AS r_str
      |  FROM documents),
      |ns AS (SELECT unnest(generate_series(1, 6)) AS n),
      |cg AS (
      |  SELECT lang, doc_id, n, gram, CAST(count(*) AS BIGINT) AS c_cnt
      |  FROM (SELECT lang, doc_id, n,
      |          unnest(list_transform(generate_series(1, length(c_str) - n + 1),
      |            i -> substr(c_str, CAST(i AS INT), CAST(n AS INT)))) AS gram
      |        FROM base CROSS JOIN ns)
      |  GROUP BY 1, 2, 3, 4),
      |rg AS (
      |  SELECT lang, doc_id, n, gram, CAST(count(*) AS BIGINT) AS r_cnt
      |  FROM (SELECT lang, doc_id, n,
      |          unnest(list_transform(generate_series(1, length(r_str) - n + 1),
      |            i -> substr(r_str, CAST(i AS INT), CAST(n AS INT)))) AS gram
      |        FROM base CROSS JOIN ns)
      |  GROUP BY 1, 2, 3, 4),
      |cl AS (
      |  SELECT cg.lang, cg.n,
      |         CAST(sum(least(cg.c_cnt, coalesce(rg.r_cnt, 0))) AS BIGINT) AS match_n,
      |         CAST(sum(cg.c_cnt) AS BIGINT) AS c_total_n
      |  FROM cg LEFT JOIN rg ON cg.lang = rg.lang AND cg.doc_id = rg.doc_id
      |                      AND cg.n = rg.n AND cg.gram = rg.gram
      |  GROUP BY 1, 2),
      |rt AS (SELECT lang, n, CAST(sum(r_cnt) AS BIGINT) AS r_total_n
      |       FROM rg GROUP BY 1, 2),
      |st AS (
      |  SELECT coalesce(cl.lang, rt.lang) AS lang,
      |         CAST(coalesce(cl.n, rt.n) AS INT) AS n,
      |         coalesce(match_n, 0) AS match_n,
      |         coalesce(c_total_n, 0) AS c_total_n,
      |         coalesce(r_total_n, 0) AS r_total_n
      |  FROM cl FULL OUTER JOIN rt ON cl.lang = rt.lang AND cl.n = rt.n),
      |pr AS (
      |  SELECT lang, n, match_n, c_total_n, r_total_n,
      |         CAST(CASE WHEN c_total_n > 0
      |                   THEN (match_n * 1000000) // c_total_n END AS BIGINT)
      |           AS prec_ppm,
      |         CAST(CASE WHEN r_total_n > 0
      |                   THEN (match_n * 1000000) // r_total_n END AS BIGINT)
      |           AS rec_ppm
      |  FROM st),
      |f AS (
      |  SELECT *, CAST(CASE WHEN prec_ppm IS NOT NULL AND rec_ppm IS NOT NULL
      |                       AND 4 * prec_ppm + rec_ppm > 0
      |                      THEN (5 * prec_ppm * rec_ppm)
      |                           // (4 * prec_ppm + rec_ppm)
      |                 END AS BIGINT) AS f2_ppm
      |  FROM pr),
      |av AS (SELECT lang, CAST(sum(coalesce(f2_ppm, 0)) // 6 AS BIGINT)
      |                      AS chrf2_ppm
      |       FROM f GROUP BY lang)
      |SELECT f.lang, f.n, match_n, c_total_n, r_total_n, prec_ppm, rec_ppm,
      |       f2_ppm, chrf2_ppm
      |FROM f JOIN av USING (lang)
      |ORDER BY f.lang, f.n""".stripMargin) { (s, d) =>
    val pairs = docs(s, d).select(col("lang"), col("doc_id"),
      expr("array_join(flatten(transform(split(text, ' '), (t, i) -> " +
        "CASE WHEN i % 7 = 0 THEN array() " +
        "WHEN i % 7 = 3 THEN array(t, t) ELSE array(t) END)), ' ')")
        .as("cand"),
      col("text").as("ref"))
    graft.text.Eval.chrF(pairs, "lang", "doc_id", "cand", "ref", maxN = 6)
      .orderBy(col("lang"), col("n"))
  }

  /** Maximal duplicated REGIONS per document (the exact-substring-dedup
    * output shape of Lee et al. 2022): q118's overlapping windows (width
    * 8, stride 4), every non-first occurrence marks its token interval,
    * and overlapping/touching intervals merge into maximal regions via
    * gaps-and-islands — a splice-out writer consumes exactly these
    * ranges. Island numbering is a running sum over a per-document
    * window on the (unique) window start offsets; all integer. */
  val q180DupRegions: QueryDef = sql(
    "q180_dup_regions",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sp AS (
      |  SELECT doc_id, i AS pos,
      |         md5(array_to_string(w[CAST(i * 4 + 1 AS INT):CAST(i * 4 + 8 AS INT)], ' ')) AS h,
      |         len(w[CAST(i * 4 + 1 AS INT):CAST(i * 4 + 8 AS INT)]) AS span_len,
      |         doc_id * 100000 + i AS okey
      |  FROM (SELECT doc_id, w,
      |               unnest(range(CAST(ceil(greatest(len(w) - 8, 0) / 4.0) AS BIGINT) + 1)) AS i
      |        FROM t)),
      |f AS (SELECT h, min(okey) AS first_key FROM sp GROUP BY h),
      |dup AS (
      |  SELECT sp.doc_id, CAST(pos * 4 AS BIGINT) AS start_tok,
      |         CAST(pos * 4 + span_len AS BIGINT) AS end_tok
      |  FROM sp JOIN f USING (h) WHERE okey <> first_key),
      |isl AS (
      |  SELECT doc_id, start_tok, end_tok,
      |         max(end_tok) OVER (PARTITION BY doc_id ORDER BY start_tok
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max_end
      |  FROM dup),
      |num AS (
      |  SELECT doc_id, start_tok, end_tok,
      |         sum(CASE WHEN prev_max_end IS NULL OR start_tok > prev_max_end
      |                  THEN 1 ELSE 0 END)
      |           OVER (PARTITION BY doc_id ORDER BY start_tok
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS region_no
      |  FROM isl)
      |SELECT doc_id, CAST(region_no AS BIGINT) AS region_no,
      |       min(start_tok) AS start_tok, max(end_tok) AS end_tok,
      |       max(end_tok) - min(start_tok) AS n_tokens,
      |       CAST(count(*) AS BIGINT) AS n_windows
      |FROM num GROUP BY doc_id, region_no
      |ORDER BY doc_id, region_no""".stripMargin) { (s, d) =>
    Curation.dupRegions(docs(s, d), "doc_id", "text",
        spanTokens = 8, stride = 4)
      .orderBy(col("doc_id"), col("region_no"))
  }

  /** Skip-gram pair counts (±2 window, deterministic rational
    * subsampling at t = 1000 ppm, min count 3) — `Curation.skipgramPairs`,
    * the word2vec data-prep stage. The oracle replays frequency →
    * keep_ppm → per-occurrence md5 draw → compaction window → band
    * self-join → pair counts, all integer. */
  val q185SkipgramPairs: QueryDef = sql(
    "q185_skipgram_pairs",
    """WITH toks AS (
      |  SELECT doc_id AS doc, CAST(u.i AS BIGINT) AS pos,
      |         w[CAST(u.i + 1 AS INT)] AS tok
      |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |       unnest(range(len(w))) AS u(i)),
      |freq AS (SELECT tok, CAST(count(*) AS BIGINT) AS freq FROM toks GROUP BY tok),
      |tot AS (SELECT CAST(sum(freq) AS BIGINT) AS n FROM freq),
      |keep AS (
      |  SELECT tok,
      |         CASE WHEN (freq * 1000000) // n <= 1000 THEN 1000000
      |              ELSE (1000 * 1000000) // ((freq * 1000000) // n) END AS keep_ppm
      |  FROM freq CROSS JOIN tot),
      |drawn AS (
      |  SELECT doc, pos, toks.tok
      |  FROM toks JOIN keep USING (tok)
      |  WHERE ('0x' || substr(md5(CAST(doc AS VARCHAR) || '|' ||
      |           CAST(pos AS VARCHAR) || '|sg-v1'), 1, 12))::BIGINT % 1000000
      |        < keep_ppm),
      |compact AS (
      |  SELECT doc, tok,
      |         row_number() OVER (PARTITION BY doc ORDER BY pos) AS idx
      |  FROM drawn),
      |pairs AS (
      |  SELECT a.tok AS center, b.tok AS context
      |  FROM compact a JOIN compact b
      |    ON a.doc = b.doc AND abs(a.idx - b.idx) <= 2 AND a.idx <> b.idx)
      |SELECT center, context, CAST(count(*) AS BIGINT) AS n
      |FROM pairs GROUP BY center, context
      |HAVING count(*) >= 3
      |ORDER BY center, context""".stripMargin) { (s, d) =>
    Curation.skipgramPairs(docs(s, d), "doc_id", "text",
        window = 2, thresholdPpm = 1000L, minCount = 3L)
      .orderBy(col("center"), col("context"))
  }

  /** One argmin-Gini split search as SQL text (the engine's bestSplit
    * replayed): histogram → per-feature totals → prefix sums → candidate
    * filter → the 1e-15-grid integer score with (f, bin) tie-break.
    * Single-line concatenation (nested-stripMargin discipline). */
  private def giniCte(tag: String, src: String): String =
    s"h$tag AS (SELECT f, bin, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS p FROM $src GROUP BY f, bin), " +
      s"t$tag AS (SELECT f, CAST(sum(n) AS BIGINT) AS tn, CAST(sum(p) AS BIGINT) AS tp FROM h$tag GROUP BY f), " +
      s"c$tag AS (SELECT f, bin, CAST(sum(n) OVER (PARTITION BY f ORDER BY bin) AS BIGINT) AS nl, CAST(sum(p) OVER (PARTITION BY f ORDER BY bin) AS BIGINT) AS pl FROM h$tag), " +
      s"k$tag AS (SELECT c.f, c.bin, c.nl, c.pl, t.tn - c.nl AS nr, t.tp - c.pl AS pr FROM c$tag c JOIN t$tag t USING (f) WHERE c.nl > 0 AND t.tn - c.nl > 0), " +
      s"b$tag AS (SELECT f, bin, nl, pl, nr, pr FROM k$tag ORDER BY CAST((CAST(pl * (nl - pl) AS HUGEINT) * nr + CAST(pr * (nr - pr) AS HUGEINT) * nl) * 1000000000000000 // (CAST(nl AS HUGEINT) * nr) AS BIGINT), f, bin LIMIT 1)"

  /** Depth-2 CART training — `cluster.GiniTree.fitDepth2`: the
    * tree-family classifier trainer beside q153's logistic GD, exact
    * integer Gini on a 64-bin ppm feature grid (see GiniTree's scaladoc
    * for the 1e-15-grid total-order trick: DECIMAL(38,0) in Spark ≡
    * HUGEINT in DuckDB, identical truncation). Features: stopword ratio,
    * scaled mean word length, distinct-token ratio; label lang='en'. The
    * oracle replays ALL THREE split searches (root + both children),
    * the node assignment, and the leaf histograms; the 7-row node table
    * hash-pins the whole fitted model. Non-degenerate at every sf by
    * construction (continuous ppm features), but the oracle ALSO replays
    * the degenerate-child fallback (NOT EXISTS branches: pure/constant
    * child → leaf node + two empty leaves, same fixed 7 rows) so a
    * datagen change can't silently desynchronize the engines — DuckDB
    * cross-checked against `fitDepth2` on a two-text degenerate fixture
    * (both children constant; spec also pins the Spark side). */
  val q193GiniTree: QueryDef = sql(
    "q193_gini_tree",
    s"""WITH d AS (
       |  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
       |         (CAST(len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a', 'of', 'and', 'to'))) AS BIGINT) * 1000000) // len(string_split(text, ' ')) AS sw,
       |         (n_chars * 1000000) // (len(string_split(text, ' ')) * 12) AS wl,
       |         (CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) * 1000000) // len(string_split(text, ' ')) AS dr
       |  FROM documents),
       |feats AS (
       |  SELECT doc_id, y, 'sw' AS f, least(63, sw // 15625) AS bin FROM d
       |  UNION ALL
       |  SELECT doc_id, y, 'wl', least(63, wl // 15625) FROM d
       |  UNION ALL
       |  SELECT doc_id, y, 'dr', least(63, dr // 15625) FROM d),
       |${giniCte("0", "feats")},
       |a0 AS (SELECT fe.doc_id, CASE WHEN fe.bin <= b0.bin THEN 1 ELSE 0 END AS isl
       |       FROM feats fe, b0 WHERE fe.f = b0.f),
       |fl AS (SELECT fe.* FROM feats fe JOIN a0 USING (doc_id) WHERE a0.isl = 1),
       |fr AS (SELECT fe.* FROM feats fe JOIN a0 USING (doc_id) WHERE a0.isl = 0),
       |${giniCte("1", "fl")},
       |${giniCte("2", "fr")},
       |leaf34 AS (
       |  SELECT CASE WHEN fe.bin <= b1.bin THEN 3 ELSE 4 END AS node_id,
       |         CAST(count(*) AS BIGINT) AS n, CAST(sum(fe.y) AS BIGINT) AS pos
       |  FROM fl fe, b1 WHERE fe.f = b1.f GROUP BY 1
       |  UNION ALL
       |  SELECT u.node_id, CAST(0 AS BIGINT), CAST(0 AS BIGINT)
       |  FROM (SELECT 3 AS node_id UNION ALL SELECT 4) u
       |  WHERE NOT EXISTS (SELECT 1 FROM b1)),
       |leaf56 AS (
       |  SELECT CASE WHEN fe.bin <= b2.bin THEN 5 ELSE 6 END AS node_id,
       |         CAST(count(*) AS BIGINT) AS n, CAST(sum(fe.y) AS BIGINT) AS pos
       |  FROM fr fe, b2 WHERE fe.f = b2.f GROUP BY 1
       |  UNION ALL
       |  SELECT u.node_id, CAST(0 AS BIGINT), CAST(0 AS BIGINT)
       |  FROM (SELECT 5 AS node_id UNION ALL SELECT 6) u
       |  WHERE NOT EXISTS (SELECT 1 FROM b2)),
       |nodes AS (
       |  SELECT 0 AS node_id, 'split' AS kind, f AS feature, bin AS thr_bin,
       |         (bin + 1) * 15625 AS thr_ppm, nl + nr AS n, pl + pr AS pos FROM b0
       |  UNION ALL
       |  SELECT 1, 'split', f, bin, (bin + 1) * 15625, nl + nr, pl + pr FROM b1
       |  UNION ALL
       |  SELECT 1, 'leaf', '', -1, 0, b0.nl, b0.pl FROM b0
       |  WHERE NOT EXISTS (SELECT 1 FROM b1)
       |  UNION ALL
       |  SELECT 2, 'split', f, bin, (bin + 1) * 15625, nl + nr, pl + pr FROM b2
       |  UNION ALL
       |  SELECT 2, 'leaf', '', -1, 0, b0.nr, b0.pr FROM b0
       |  WHERE NOT EXISTS (SELECT 1 FROM b2)
       |  UNION ALL
       |  SELECT node_id, 'leaf', '', -1, 0, n, pos FROM leaf34
       |  UNION ALL
       |  SELECT node_id, 'leaf', '', -1, 0, n, pos FROM leaf56)
       |SELECT CAST(node_id AS INT) AS node_id, kind, feature,
       |       CAST(thr_bin AS BIGINT) AS thr_bin,
       |       CAST(thr_ppm AS BIGINT) AS thr_ppm,
       |       CAST(n AS BIGINT) AS n, CAST(pos AS BIGINT) AS pos,
       |       CAST(CASE WHEN 2 * pos >= n THEN 1 ELSE 0 END AS INT) AS pred
       |FROM nodes
       |ORDER BY node_id""".stripMargin) { (s, d) =>
    val base = Tables.documents(s, d).select(col("doc_id"),
      when(col("lang") === "en", 1).otherwise(0).as("y"),
      expr("(CAST(size(filter(split(text, ' '), t -> t IN ('the', 'a', 'of', 'and', 'to'))) AS BIGINT) * 1000000) div size(split(text, ' '))").as("sw"),
      expr("(n_chars * 1000000) div (size(split(text, ' ')) * 12)").as("wl"),
      expr("(CAST(size(array_distinct(split(text, ' '))) AS BIGINT) * 1000000) div size(split(text, ' '))").as("dr"))
    val feats = base.select(col("doc_id"), col("y"),
        explode(array(
          struct(lit("sw").as("f"), col("sw").as("v")),
          struct(lit("wl").as("f"), col("wl").as("v")),
          struct(lit("dr").as("f"), col("dr").as("v")))).as("fv"))
      .select(col("doc_id"), col("y"), col("fv.f").as("f"),
        least(lit(63L), expr("fv.v div 15625")).as("bin"))
    graft.cluster.GiniTree.fitDepth2(s, feats)
  }

  /** Deterministic text augmentation — `Curation.augmentDropout` /
    * `augmentSwap` (EDA, Wei & Zou 2019, with md5 draws instead of RNG
    * so a rerun regenerates the identical corpus — the reproducibility
    * property an augmented-training run needs): 10% token dropout and
    * 20% non-overlapping adjacent-pair swaps. The augmented STRINGS are
    * pinned through md5 hashes (the oracle rebuilds each augmented text
    * with string_agg ORDER BY the replayed position permutation), so a
    * draw-salt slip, an off-by-one in pair indexing, or an unstable
    * re-join order all hash-mismatch. */
  val q197Augment: QueryDef = sql(
    "q197_augment",
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |t AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n, r.p AS pos, w[r.p + 1] AS tok
      |      FROM d CROSS JOIN range(0, 1024) r(p) WHERE r.p < len(w)),
      |drp AS (
      |  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS aug
      |  FROM t
      |  WHERE ('0x' || substr(md5(CAST(doc_id AS STRING) || '|aug-drop|' || CAST(pos AS STRING)), 1, 12))::BIGINT % 1000000 >= 100000
      |  GROUP BY doc_id),
      |swp AS (
      |  SELECT doc_id, string_agg(tok, ' ' ORDER BY new_pos) AS aug
      |  FROM (SELECT doc_id, n, tok,
      |          CASE WHEN sw AND pos % 2 = 0 AND pos + 1 < n THEN pos + 1
      |               WHEN sw AND pos % 2 = 1 THEN pos - 1 ELSE pos END AS new_pos
      |        FROM (SELECT t.*,
      |                ('0x' || substr(md5(CAST(doc_id AS STRING) || '|aug-swap|' || CAST(pos // 2 AS STRING)), 1, 12))::BIGINT % 1000000 < 200000 AS sw
      |              FROM t))
      |  GROUP BY doc_id),
      |u AS (
      |  SELECT d.doc_id, 'drop' AS variant, CAST(len(d.w) AS BIGINT) AS n_orig,
      |         COALESCE(drp.aug, '') AS aug
      |  FROM d LEFT JOIN drp USING (doc_id)
      |  UNION ALL
      |  SELECT d.doc_id, 'swap', CAST(len(d.w) AS BIGINT), swp.aug
      |  FROM d JOIN swp USING (doc_id))
      |SELECT doc_id, variant, n_orig,
      |       CAST(CASE WHEN aug = '' THEN 0
      |                 ELSE len(string_split(aug, ' ')) END AS BIGINT) AS n_aug,
      |       md5(aug) AS aug_hash
      |FROM u
      |ORDER BY doc_id, variant""".stripMargin) { (s, d) =>
    import graft.text.Curation
    val base = Tables.documents(s, d)
    val nOrig = base.select(col("doc_id").as("id"),
      size(split(col("text"), " ")).cast("long").as("n_orig"))
    def shape(aug: org.apache.spark.sql.DataFrame, variant: String) =
      aug.join(nOrig, "id")
        .select(col("id").as("doc_id"), lit(variant).as("variant"),
          col("n_orig"),
          when(col("aug_text") === "", 0L)
            .otherwise(size(split(col("aug_text"), " ")).cast("long")).as("n_aug"),
          md5(col("aug_text")).as("aug_hash"))
    shape(Curation.augmentDropout(base, "doc_id", "text", 100000L), "drop")
      .unionAll(shape(Curation.augmentSwap(base, "doc_id", "text", 200000L), "swap"))
      .orderBy(col("doc_id"), col("variant"))
  }
}
