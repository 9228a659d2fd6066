package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion contract. Independent reference: the literal
  * Cormack definition — fused(q, d) = Σ_r floor(10^9 / (k + rank_r(d)))
  * summed over the lists d appears in — enumerated driver-side over every
  * (query, doc) and re-ranked, which the outer-join implementation must
  * match exactly. */
class FusionSpec extends SparkSpec {

  private def df(rows: Seq[(Long, Long, Int)]) = {
    import spark.implicits._
    rows.toDF("qid", "doc_id", "rank")
  }

  private def run(a: Seq[(Long, Long, Int)], b: Seq[(Long, Long, Int)],
      k: Int = 60, topK: Int = 10) =
    Fusion.reciprocalRank(Seq("a" -> df(a), "b" -> df(b)), k, topK)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4),
          if (r.isNullAt(5)) -1L else r.getLong(5)))
      .toMap

  test("hand golden: overlap beats a single first place") {
    // doc 7 is rank 2 in BOTH lists: 2·(10^9 div 62) = 32258064
    // doc 1 is rank 1 in list a only: 10^9 div 61 = 16393442
    // doc 2 is rank 1 in list b only: same — tie broken by doc_id
    val out = run(
      a = Seq((0L, 1L, 1), (0L, 7L, 2)),
      b = Seq((0L, 2L, 1), (0L, 7L, 2)))
    assert(out((0L, 1)) == ((7L, 32258064L, 2L, 2L)))
    assert(out((0L, 2)) == ((1L, 16393442L, 1L, -1L)))
    assert(out((0L, 3)) == ((2L, 16393442L, -1L, 1L)))
  }

  test("absent-from-a-list docs contribute zero, not null poisoning") {
    val out = run(a = Seq((5L, 9L, 3)), b = Seq.empty)
    assert(out((5L, 1)) == ((9L, 1000000000L / 63L, 3L, -1L)))
  }

  test("topK truncates per query after fusion") {
    val a = (1 to 15).map(i => (0L, i.toLong, i))
    val out = run(a, Seq.empty, topK = 4)
    assert(out.size == 4)
    assert(out((0L, 4)) == ((4L, 1000000000L / 64L, 4L, -1L)))
  }

  test("randomized agreement with the enumerated definition") {
    val rnd = new scala.util.Random(13)
    def list() = (for (q <- 0L to 2L) yield {
      val docs = rnd.shuffle((1L to 20L).toList).take(10)
      docs.zipWithIndex.map { case (d, i) => (q, d, i + 1) }
    }).flatten
    val (la, lb) = (list(), list())
    val got = run(la, lb, k = 60, topK = 10)
    // brute: enumerate every (q, d), sum floor contributions, sort
    val byQ = (la.map(t => (t._1, t._2) -> ("a", t._3)) ++
      lb.map(t => (t._1, t._2) -> ("b", t._3)))
      .groupBy(_._1._1)
    for ((q, entries) <- byQ) {
      val fusedByDoc = entries.groupBy(_._1._2).map { case (d, es) =>
        d -> es.map { case (_, (_, r)) => 1000000000L / (60L + r) }.sum
      }
      val expect = fusedByDoc.toSeq.sortBy { case (d, s) => (-s, d) }.take(10)
      expect.zipWithIndex.foreach { case ((d, s), i) =>
        val (gd, gs, _, _) = got((q, i + 1))
        assert((gd, gs) == ((d, s)), s"q=$q rank=${i + 1}")
      }
    }
  }
}
