package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact PHRASE search over a positional inverted index — the retrieval
  * primitive BM25's bag-of-words scoring cannot express ("new york
  * times" as a phrase, not three independent terms), and the dedup-side
  * tool for finding verbatim quotation of a specific passage across a
  * corpus.
  *
  * Algorithm (the classic positional-intersection, re-expressed as one
  * join + one aggregate instead of a per-term join chain): posting
  * (doc, pos, tok) matches query token (qid, off, tok) at anchor
  * `pos − off`; a phrase of length L occurs at (doc, anchor) iff ALL L
  * offsets matched there — `count(hits) = L` after grouping by
  * (qid, doc, anchor). Occurrences per document are then a second
  * count. Handles any phrase length, repeated tokens inside a phrase
  * (offsets are distinct rows), and OVERLAPPING occurrences ("a a a"
  * contains "a a" twice) with no special cases.
  *
  * Scale shape: the query set is broadcast (a serving workload's phrase
  * list is tiny next to the corpus); the posting list never self-joins —
  * one equi-join on tok ships only rows for tokens that appear in some
  * phrase, then two partial-aggregable counts. The corpus-side work is
  * proportional to the matched postings, never corpus². */
object PhraseSearch {

  /** Exact occurrences of each whitespace phrase. `queries`: (qid,
    * phrase). Output: (qid, doc_id, n_occ) for documents containing the
    * phrase at least once. */
  def phraseMatches(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String = "qid",
      phraseCol: String = "phrase"): DataFrame =
    phraseMatchesFromPostings(
      docs.select(col(idCol).cast("long").as("doc_id"),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "tok"))),
      queries, qidCol, phraseCol)

  /** The same anchor intersection over a PREBUILT positional postings
    * frame `(doc_id, pos, tok)` — the serving entry `PostingsIndex`
    * probes with its bucket-pruned scan instead of re-deriving the
    * postings from the corpus per query batch. */
  def phraseMatchesFromPostings(post: DataFrame, queries: DataFrame,
      qidCol: String = "qid", phraseCol: String = "phrase"): DataFrame =
    phraseAnchors(post, queries, qidCol, phraseCol)
      .groupBy(col("qid"), col("doc_id"))
      .agg(count(lit(1)).as("n_occ"))

  /** Every exact occurrence as its anchor position: (qid, doc_id,
    * anchor, plen) — the granular form [[phraseMatchesFromPostings]]
    * counts and [[snippets]] renders. */
  def phraseAnchors(post: DataFrame, queries: DataFrame,
      qidCol: String = "qid", phraseCol: String = "phrase"): DataFrame = {
    val qtok = queries.select(col(qidCol).cast("long").as("qid"),
        posexplode(split(col(phraseCol), " ")).as(Seq("off", "tok")))
      .withColumn("plen",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("qid"))))
    broadcast(qtok).join(post.select(col("doc_id"), col("pos"), col("tok")), "tok")
      .select(col("qid"), col("doc_id"),
        (col("pos") - col("off")).as("anchor"), col("plen"))
      .groupBy(col("qid"), col("doc_id"), col("anchor"), col("plen"))
      .agg(count(lit(1)).as("hits"))
      .filter(col("hits") === col("plen"))
      .select(col("qid"), col("doc_id"), col("anchor"), col("plen"))
  }

  /** Render a ±`window`-token SNIPPET around each match's FIRST anchor —
    * the serving step after retrieval: the inverted index FINDS (the
    * anchors come from the tok-partitioned positional postings), the
    * FORWARD store renders (`forward`: (doc_id, text) — re-reading
    * around a position from tok-partitioned postings would scan every
    * bucket, so snippets correctly come from the row-oriented side, and
    * the join touches only the MATCHED doc ids, never the corpus).
    * Output: (qid, doc_id, n_occ, first_anchor, snippet). */
  def snippets(anchors: DataFrame, forward: DataFrame, idCol: String,
      textCol: String, window: Int): DataFrame = {
    val firsts = anchors
      .groupBy(col("qid"), col("doc_id"))
      .agg(count(lit(1)).as("n_occ"), min(col("anchor")).as("first_anchor"),
        min_by(col("plen"), col("anchor")).as("plen"))
    firsts.join(forward.select(col(idCol).cast("long").as("doc_id"),
        split(col(textCol), " ").as("w")), "doc_id")
      .select(col("qid"), col("doc_id"), col("n_occ"), col("first_anchor"),
        concat_ws(" ", slice(col("w"),
          (greatest(col("first_anchor") - window, lit(0)) + 1).cast("int"),
          (col("first_anchor") + col("plen") + window -
            greatest(col("first_anchor") - window, lit(0))).cast("int")))
          .as("snippet"))
  }
}
