package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted INVERTED INDEX for text retrieval — the standing-index
  * analogue of `sources.IvfIndex` for the lexical shelf: build the
  * postings ONCE, persist them partitioned by a token-hash bucket, and
  * serve every q184-style BM25 batch and q210-style phrase probe from
  * the index instead of re-deriving (doc, tok, tf) / (doc, pos, tok)
  * from the corpus per run. This is the shape of the reference's
  * standing Postgres tables + index queried per request
  * (assets/recent_history.py:134,368-371) — the corpus is read at BUILD
  * time; a serve touches only the probed index partitions.
  *
  * Layout (all parquet under `path`):
  *  - `postings/bkt=<b>/…`  (tok, doc_id, tf) — term postings with the
  *    token's document frequency folded in as `df` (denormalized: df is
  *    per-token, so carrying it on each posting row costs one long and
  *    saves the serve a second bucketed lookup).
  *  - `positions/bkt=<b>/…` (tok, doc_id, pos) — positional postings.
  *  - `lengths/…`           (doc_id, dl) — document lengths.
  *  - `stats/…`             (t, nd) — 1-row corpus totals.
  *
  * `bkt = pmod(xxhash64(tok), nBuckets)` is a DIRECTORY partition, so a
  * probe's terms resolve to a literal `isin` partition filter (the
  * IvfIndex discipline: collecting the probed buckets is bounded by the
  * probe term count — a serving workload, small next to the corpus) and
  * pruning is static and visible in the scan node. 100 TB shape: the
  * build is two linear corpus passes (postings groupBy, df groupBy)
  * plus the bucketed write's shuffle; a serve reads ≤ the probed
  * buckets' postings — cost tracks the probe set and the matched
  * posting lists, never the corpus (`ScaleSmoke postings_index_probe`).
  */
final class PostingsIndex(spark: SparkSession, path: String, nBuckets: Int) {

  def postings: DataFrame = spark.read.parquet(s"$path/postings")
  def positions: DataFrame = spark.read.parquet(s"$path/positions")
  def lengths: DataFrame = spark.read.parquet(s"$path/lengths")
  def stats: DataFrame = spark.read.parquet(s"$path/stats")

  /** The probed buckets of a term frame as a literal partition filter.
    * The collect is bounded by the DISTINCT probe terms (serving-batch
    * sized by construction — same argument as IvfIndex.topK's probe
    * collect). */
  private def probedBuckets(toks: DataFrame): Seq[Long] =
    toks.select(pmod(xxhash64(col("tok")), lit(nBuckets.toLong)).as("bkt"))
      .distinct().collect().map(_.getLong(0)).toSeq

  /** Top-`k` BM25 per probe, served from the PERSISTED index: identical
    * scoring to `Bm25.topK` by construction (both call `Bm25.contrib` /
    * `Bm25.sumAndRank`), but the corpus-side inputs are bucket-pruned
    * index scans. `queries`: (qid, tok) distinct term rows. */
  def bm25TopK(queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("qid").cast("long").as("qid"), col("tok"))
    val probed = probedBuckets(q)
    val post = postings.filter(col("bkt").isin(probed: _*))
      .select(col("tok"), col("doc_id"), col("tf"), col("df"))
    val perTerm = broadcast(q)
      .join(post, "tok")
      .filter(col("doc_id") =!= col("qid"))
      // lengths is a corpus-sized dimension: it could never broadcast
      // at real scale, and the matched-postings side is already bounded
      // by the probe, so an equi-join (hash) is the honest shape
      .join(lengths.hint("shuffle_hash"), "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("qid"), col("doc_id"), Bm25.contrib.as("contrib"))
    Bm25.sumAndRank(perTerm, k)
  }

  /** Exact phrase occurrences served from the persisted POSITIONAL
    * postings — `PhraseSearch.phraseMatchesFromPostings` over the
    * bucket-pruned scan. `queries`: (qid, phrase). */
  def phraseMatches(queries: DataFrame, qidCol: String = "qid",
      phraseCol: String = "phrase"): DataFrame = {
    val toks = queries.select(
      explode(split(col(phraseCol), " ")).as("tok"))
    val probed = probedBuckets(toks)
    PhraseSearch.phraseMatchesFromPostings(
      positions.filter(col("bkt").isin(probed: _*))
        .select(col("doc_id"), col("pos"), col("tok")),
      queries, qidCol, phraseCol)
  }
}

object PostingsIndex {

  /** Build + persist the index: two linear passes over the corpus (term
    * postings with df folded in; positional postings), one tiny lengths
    * table, one 1-row stats table. Writes shuffle on the token-hash
    * bucket so each bucket directory is written co-located. */
  def build(docs: DataFrame, path: String, idCol: String, textCol: String,
      nBuckets: Int = 64): PostingsIndex = {
    val spark = docs.sparkSession
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      split(col(textCol), " ").as("w"))
    val dl = base.select(col("doc_id"), size(col("w")).cast("long").as("dl"))
    dl.write.mode("overwrite").parquet(s"$path/lengths")
    dl.agg(sum(col("dl")).as("t"), count(lit(1)).as("nd"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/stats")
    val bkt = pmod(xxhash64(col("tok")), lit(nBuckets.toLong)).as("bkt")
    val dt = base.select(col("doc_id"), explode(col("w")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val dfreq = dt.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .hint("shuffle_hash") // vocabulary-sized: never broadcastable at scale
    dt.join(dfreq, "tok")
      .select(col("tok"), col("doc_id"), col("tf"), col("df"), bkt)
      .repartition(col("bkt"))
      .write.mode("overwrite").partitionBy("bkt").parquet(s"$path/postings")
    base.select(col("doc_id"),
        posexplode(col("w")).as(Seq("pos", "tok")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("tok"), bkt)
      .repartition(col("bkt"))
      .write.mode("overwrite").partitionBy("bkt").parquet(s"$path/positions")
    new PostingsIndex(spark, path, nBuckets)
  }
}
