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
    q111SpanDedup, q112HashSplit, q113UnigramLogprob, q114FilterFunnel)

  private def docs(s: SparkSession, d: String): DataFrame = Tables.documents(s, d)

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
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |vocab AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
      |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM vocab)
      |SELECT t.doc_id,
      |       CAST(count(*) AS BIGINT) AS n_tokens,
      |       round(sum(log10(CAST(cnt AS DOUBLE) / n)) / count(*), 6) AS mean_logprob
      |FROM toks t JOIN vocab USING (tok) CROSS JOIN tot
      |GROUP BY t.doc_id
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
}
