package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Phrase-search contract. Independent reference: a literal sliding-
  * window scan over every document (every start position compared token
  * by token), which the anchor-intersection implementation must match
  * exactly — including OVERLAPPING occurrences and phrases with repeated
  * tokens. */
class PhraseSearchSpec extends SparkSpec {

  private def run(docs: Seq[(Long, String)], qs: Seq[(Long, String)]) = {
    import spark.implicits._
    PhraseSearch.phraseMatches(docs.toDF("doc_id", "text"), "doc_id",
        "text", qs.toDF("qid", "phrase"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
  }

  private def brute(docs: Seq[(Long, String)],
      qs: Seq[(Long, String)]): Map[(Long, Long), Long] =
    (for {
      (qid, phrase) <- qs
      p = phrase.split(" ", -1).toSeq
      (did, text) <- docs
      w = text.split(" ", -1).toSeq
      n = w.sliding(p.size).count(_ == p) if n > 0
    } yield (qid, did) -> n.toLong).toMap

  test("hand goldens: overlap, repeated tokens, absence") {
    val docs = Seq(
      1L -> "a a a b",       // "a a" occurs at anchors 0 and 1 (overlap)
      2L -> "x a a y a a z", // "a a" occurs twice, disjoint
      3L -> "a b a b a")     // "a a" never occurs
    val out = run(docs, Seq(10L -> "a a"))
    assert(out == Map((10L, 1L) -> 2L, (10L, 2L) -> 2L))
  }

  test("full-phrase semantics: all offsets must land on one anchor") {
    // doc has both tokens but never adjacent in order
    val docs = Seq(1L -> "new times york new", 2L -> "the new york times co")
    val out = run(docs, Seq(7L -> "new york times"))
    assert(out == Map((7L, 2L) -> 1L))
  }

  test("randomized agreement with the sliding-window scan") {
    val rnd = new scala.util.Random(29)
    val vocab = Vector("a", "b", "c")
    def words(n: Int) = Seq.fill(n)(vocab(rnd.nextInt(vocab.size)))
    for (trial <- 1 to 5) {
      val docs = (1L to 15L).map(i => i -> words(6 + rnd.nextInt(10)).mkString(" "))
      val qs = (1L to 4L).map(q => q -> words(1 + rnd.nextInt(3)).mkString(" "))
      assert(run(docs, qs) == brute(docs, qs), s"trial $trial")
    }
  }

  test("snippets: first-anchor window, clamped at both document edges") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x y a b c d e"), // mid-doc match: 2 tokens either side
      (2L, "a b z z z z z"), // match at position 0: left clamp
      (3L, "z z z z z a b"), // match at the end: right clamp
      (4L, "a b q a b r s")) // two occurrences: FIRST anchor renders
    val qs = Seq((7L, "a b"))
    val post = docs.toDF("doc_id", "text")
      .select(col("doc_id"), posexplode(split(col("text"), " "))
        .as(Seq("pos", "tok")))
    val anchors = PhraseSearch.phraseAnchors(post, qs.toDF("qid", "phrase"))
    val got = PhraseSearch.snippets(anchors, docs.toDF("doc_id", "text"),
        "doc_id", "text", window = 2)
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._2 -> ((r._3, r._4, r._5))).toMap
    assert(got(1L) == ((1L, 2L, "x y a b c d")))
    assert(got(2L) == ((1L, 0L, "a b z z")))
    assert(got(3L) == ((1L, 5L, "z z a b")))
    assert(got(4L) == ((2L, 0L, "a b q a"))) // first anchor, not the second
  }
}
