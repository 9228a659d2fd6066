package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MaxSim late-interaction contract: exact agreement with a literal
  * Scala replay of Σ_qt max_dt ⟨e_qt, e_dt⟩ on random integer-grid
  * embeddings, plus the token-level-matching property a pooled vector
  * loses. */
class MaxSimSpec extends SparkSpec {
  import spark.implicits._

  private def brute(cands: Seq[(Long, Long)],
      q: Map[Long, Seq[Array[Long]]],
      d: Map[Long, Seq[Array[Long]]]): Map[(Long, Long), Long] =
    cands.map { case (qid, doc) =>
      (qid, doc) -> q(qid).map { qe =>
        d(doc).map(de => qe.zip(de).map { case (a, b) => a * b }.sum).max
      }.sum
    }.toMap

  test("rerank equals the literal sum-of-max replay on random vectors") {
    val rnd = new scala.util.Random(7)
    def vec() = Array.fill(4)(rnd.nextInt(2001).toLong - 1000L)
    val q = (1L to 3L).map(i => i -> Seq.fill(3)(vec())).toMap
    val d = (10L to 17L).map(i => i -> Seq.fill(5)(vec())).toMap
    val cands = for (qi <- 1L to 3L; di <- 10L to 17L) yield (qi, di)
    val qtok = q.toSeq.flatMap { case (qi, vs) =>
      vs.zipWithIndex.map { case (v, t) => (qi, s"q$t", v(0), v(1), v(2), v(3)) } }
      .toDF("qid", "qt", "e0", "e1", "e2", "e3")
    val dtok = d.toSeq.flatMap { case (di, vs) =>
      vs.zipWithIndex.map { case (v, t) => (di, s"d$t", v(0), v(1), v(2), v(3)) } }
      .toDF("doc_id", "dt", "e0", "e1", "e2", "e3")
    val got = MaxSim.rerank(cands.toDF("qid", "doc_id"), qtok, dtok,
        dims = 4, k = 8)
      .select("qid", "doc_id", "score_i", "rank")
      .as[(Long, Long, Long, Int)].collect()
    val exp = brute(cands, q, d)
    assert(got.length == 24)
    got.foreach { case (qi, di, s, _) =>
      assert(s == exp((qi, di)), s"($qi, $di): got $s, want ${exp((qi, di))}")
    }
    // ranks follow (score DESC, doc_id) exactly
    got.groupBy(_._1).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_._4).map(r => (r._3, r._2))
      assert(byRank.sameElements(rows.sortBy(r => (-r._3, r._2)).map(r => (r._3, r._2))))
    }
  }

  test("token-level matching: MaxSim finds the per-token best a pooled centroid blurs") {
    // doc 10 matches query token A exactly and token B not at all;
    // doc 11 is mediocre on both. Pooled centroids tie (same sum), but
    // MaxSim must prefer doc 10 for a single-token query on A.
    val qtok = Seq((1L, "A", 1000L, 0L)).toDF("qid", "qt", "e0", "e1")
    val dtok = Seq(
      (10L, "x", 1000L, 0L), (10L, "y", -1000L, 0L),
      (11L, "u", 0L, 0L), (11L, "v", 0L, 0L))
      .toDF("doc_id", "dt", "e0", "e1")
    val cands = Seq((1L, 10L), (1L, 11L)).toDF("qid", "doc_id")
    val top = MaxSim.rerank(cands, qtok, dtok, dims = 2, k = 2)
      .filter(col("rank") === 1).select("doc_id").as[Long].collect()
    assert(top.sameElements(Array(10L)),
      "the exact per-token match must win under sum-of-max")
  }
}
