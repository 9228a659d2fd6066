package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BM25 contract. Independent reference: the textbook double-precision
  * Okapi formula (with the same rational idf convention) computed in
  * plain Scala — the integer fixed-point ranking must reproduce its
  * order on corpora without near-ties. */
class Bm25Spec extends SparkSpec {

  import spark.implicits._

  private def run(docs: Seq[(Long, String)], probes: Seq[(Long, String)], k: Int) =
    Bm25.topK(docs.toDF("doc_id", "text"), "doc_id", "text",
        probes.toDF("qid", "tok"), k)
      .as[(Long, Int, Long, Long)].collect().toSeq

  private def reference(docs: Seq[(Long, String)], q: Seq[String]): Map[Long, Double] = {
    val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    val nd = docs.size.toDouble
    val avgdl = toks.values.map(_.size).sum / nd
    docs.map { case (id, _) =>
      val dl = toks(id).size.toDouble
      val score = q.map { t =>
        val tf = toks(id).count(_ == t).toDouble
        if (tf == 0) 0.0
        else {
          val df = toks.values.count(_.contains(t)).toDouble
          val idf = nd / df
          idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
        }
      }.sum
      id -> score
    }.toMap
  }

  test("ranking agrees with the double-precision reference formula") {
    val docs = Seq(
      (10L, "spark shuffles data across executors"),
      (11L, "spark spark spark spark nothing else here at all"),
      (12L, "data pipelines move data between systems"),
      (13L, "executors run tasks"),
      (14L, "completely unrelated words occupy this document"))
    val q = Seq("spark", "data")
    val got = run(docs, q.map(t => (99L, t)), 5).map(_._3)
    val want = reference(docs, q).toSeq
      .filter(_._2 > 0).sortBy { case (id, s) => (-s, id) }.map(_._1)
    assert(got == want)
  }

  test("tf saturation: the term ratio never exceeds (k1+1) on the ppm grid") {
    // a doc that is ONE repeated term: ratio -> k1+1 but never over
    val docs = Seq((1L, Seq.fill(50)("x").mkString(" ")), (2L, "x y z w"))
    val out = run(docs, Seq((9L, "x")), 2)
    // idf_m = (2*1000) div 2 = 1000; contribution <= 1000 * 2200000
    assert(out.forall(_._4 <= 1000L * 2200000L))
  }

  test("rarer terms weigh more at equal tf and length") {
    val docs = Seq(
      (1L, "rare aaa bbb ccc"), (2L, "common aaa bbb ccc"),
      (3L, "common ddd eee fff"), (4L, "common ggg hhh iii"))
    val byRare = run(docs, Seq((9L, "rare")), 1)
    val byCommon = run(docs, Seq((8L, "common")), 1)
    assert(byRare.head._4 > byCommon.head._4)
  }

  test("self-hit excluded when qid is a doc_id") {
    val docs = Seq((1L, "alpha beta"), (2L, "alpha gamma"))
    val out = run(docs, Seq((1L, "alpha")), 5)
    assert(out.map(_._3) == Seq(2L))
  }

  test("hardNegatives: best-ranked relevant is the positive, first nNeg others are negatives") {
    // ranked list for qid 1: ranks 1..5, labels: doc 11 'b', 12 'a',
    // 13 'b', 14 'b', 15 'a'; query label 'a' -> pos = 12 (first 'a',
    // rank 2), negs = 11 (seq 1), 13 (seq 2) at nNeg = 2
    val ranked = Seq((1L, 1, 11L, 500L), (1L, 2, 12L, 400L),
      (1L, 3, 13L, 300L), (1L, 4, 14L, 200L), (1L, 5, 15L, 100L))
      .toDF("qid", "rank", "doc_id", "score_i")
    val labels = Seq((1L, "a"), (11L, "b"), (12L, "a"), (13L, "b"),
      (14L, "b"), (15L, "a")).toDF("id", "label")
    val out = Bm25.hardNegatives(ranked, labels, nNeg = 2)
      .select("qid", "pos_id", "pos_rank", "neg_seq", "neg_id", "neg_rank")
      .as[(Long, Long, Int, Int, Long, Int)].collect().sortBy(_._4)
    assert(out.toSeq == Seq((1L, 12L, 2, 1, 11L, 1), (1L, 12L, 2, 2, 13L, 3)))
  }

  test("hardNegatives: queries with no relevant result drop out entirely") {
    val ranked = Seq((7L, 1, 21L, 900L), (7L, 2, 22L, 800L))
      .toDF("qid", "rank", "doc_id", "score_i")
    val labels = Seq((7L, "zz"), (21L, "a"), (22L, "b")).toDF("id", "label")
    assert(Bm25.hardNegatives(ranked, labels, nNeg = 3).count() == 0L)
  }

  test("rm3ExpandedTerms: expansion equals the brute feedback term vote, " +
      "never re-adds an original term, and caps at fbTerms") {
    val rnd = new scala.util.Random(31)
    val vocab = Vector("ash", "oak", "fir", "elm", "yew", "bay", "box", "may")
    val docs = (1L to 12L).map(i =>
      i -> Seq.fill(6 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    val probes = Seq((1L, "ash"), (1L, "oak"), (2L, "fir"))
    val got = Bm25.rm3ExpandedTerms(docs.toDF("doc_id", "text"),
        "doc_id", "text", probes.toDF("qid", "tok"),
        k = 10, fbDocs = 3, fbTerms = 2)
      .as[(Long, String)].collect().toSet
    // brute reference: first-pass ranking via topK (already pinned
    // against the textbook formula above), then a driver-side vote
    val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    val df = vocab.map(t => t -> toks.values.count(_.contains(t)).toLong).toMap
    val nd = docs.size.toLong
    val fb = Bm25.topK(docs.toDF("doc_id", "text"), "doc_id", "text",
        probes.toDF("qid", "tok"), 10)
      .filter(col("rank") <= 3).select("qid", "doc_id")
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2))
    val expect = probes.toSet ++ fb.flatMap { case (qid, ids) =>
      val orig = probes.filter(_._1 == qid).map(_._2).toSet
      ids.flatMap(id => toks(id)).groupBy(identity).view
        .mapValues(g => g.map(t => BigInt(1) * (nd * 1000 / df(t))).sum)
        .toSeq.filterNot { case (t, _) => orig(t) }
        .sortBy { case (t, w) => (-w, t) }.take(2)
        .map { case (t, _) => (qid, t) }
    }.toSet
    assert(got == expect)
    val origSet = probes.toSet
    val added = got -- origSet
    assert(added.groupBy(_._1).values.forall(_.size <= 2))
    assert(added.forall(p => !origSet.contains(p)))
  }
}
