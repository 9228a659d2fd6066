package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MMR contract. Independent reference: the literal greedy definition
  * enumerated driver-side — per round, score every remaining candidate
  * `λ·simq − (1−λ)·max sim to selected`, pick max with id tie-break. */
class MmrSpec extends SparkSpec {

  private def run(cands: Seq[(Long, Long, Long)],
      pairs: Seq[(Long, Long, Long, Long)], k: Int, lambdaPpm: Long) = {
    import spark.implicits._
    val sym = pairs ++ pairs.map { case (q, a, b, s) => (q, b, a, s) }
    Mmr.select(cands.toDF("qid", "id", "simq_ppb"),
        sym.toDF("qid", "id_a", "id_b", "sim_ppb"), k, lambdaPpm)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
  }

  private def brute(cands: Seq[(Long, Long, Long)],
      pairs: Seq[(Long, Long, Long, Long)], k: Int,
      lambdaPpm: Long): Map[(Long, Int), (Long, Long)] = {
    val sim = (pairs ++ pairs.map { case (q, a, b, s) => (q, b, a, s) })
      .map { case (q, a, b, s) => (q, a, b) -> s }.toMap
    cands.groupBy(_._1).flatMap { case (q, cs) =>
      var remaining = cs.map { case (_, id, s) => (id, s) }
      var selected = Vector.empty[Long]
      (1 to math.min(k, remaining.size)).map { r =>
        val scored = remaining.map { case (id, sq) =>
          val pen = if (selected.isEmpty) 0L
            else selected.map(s => sim((q, id, s))).max
          (id, lambdaPpm * sq - (if (selected.isEmpty) 0L
            else (1000000L - lambdaPpm) * pen))
        }
        val (id, sc) = scored.minBy { case (i, s) => (-s, i) }
        selected :+= id
        remaining = remaining.filterNot(_._1 == id)
        (q, r) -> (id, sc)
      }
    }
  }

  test("hand golden: redundancy demotes the second-most-relevant hit") {
    // q0: ids 1, 2, 3 with simq 0.9, 0.8, 0.5 (ppb); 1 and 2 nearly
    // identical (sim 0.99), 3 unrelated (sim 0.0 to both).
    // Round 1 → 1. Round 2: score(2) = .7·.8e9 − .3·.99e9 = 263e6;
    // score(3) = .7·.5e9 − 0 = 350e6 → MMR picks the DIVERSE 3.
    val cands = Seq((0L, 1L, 900000000L), (0L, 2L, 800000000L),
      (0L, 3L, 500000000L))
    val pairs = Seq((0L, 1L, 2L, 990000000L), (0L, 1L, 3L, 0L),
      (0L, 2L, 3L, 0L))
    val out = run(cands, pairs, k = 3, lambdaPpm = 700000L)
    assert(out((0L, 1)) == ((1L, 700000L * 900000000L)))
    // diversity beats raw relevance: score(3) = .7·.5e9 ppm·ppb
    assert(out((0L, 2)) == ((3L, 700000L * 500000000L)))
    // the redundant 2 comes last, penalized by its sim to 1
    assert(out((0L, 3)) ==
      ((2L, 700000L * 800000000L - 300000L * 990000000L)))
  }

  test("sparse pair tables: a candidate with no sim row to the selected " +
      "set penalizes at zero, it is not dropped") {
    // only the nonzero pair (1,2) is present — the natural sparse
    // representation; the diverse id 3 must still win round 2 with
    // score λ·simq − 0, and round 3 must still emit a row
    val cands = Seq((0L, 1L, 900000000L), (0L, 2L, 800000000L),
      (0L, 3L, 500000000L))
    val pairs = Seq((0L, 1L, 2L, 990000000L))
    val out = run(cands, pairs, k = 3, lambdaPpm = 700000L)
    assert(out((0L, 1))._1 == 1L)
    assert(out((0L, 2)) == ((3L, 700000L * 500000000L)))
    assert(out((0L, 3))._1 == 2L)
  }

  test("lambda = 1 reduces to pure relevance order") {
    val cands = Seq((0L, 5L, 100L), (0L, 6L, 300L), (0L, 7L, 200L))
    val pairs = for (a <- Seq(5L, 6L, 7L); b <- Seq(5L, 6L, 7L) if a < b)
      yield (0L, a, b, 999999999L)
    val out = run(cands, pairs, k = 3, lambdaPpm = 1000000L)
    assert(Seq(1, 2, 3).map(r => out((0L, r))._1) == Seq(6L, 7L, 5L))
  }

  test("randomized agreement with the enumerated greedy definition") {
    val rnd = new scala.util.Random(31)
    for (trial <- 1 to 5) {
      val cands = for (q <- 0L to 2L; i <- 1L to 6L)
        yield (q, i, rnd.nextInt(1000000000).toLong)
      val pairs = for (q <- 0L to 2L; a <- 1L to 6L; b <- (a + 1) to 6L)
        yield (q, a, b, rnd.nextInt(1000000000).toLong)
      val got = run(cands, pairs, k = 4, lambdaPpm = 700000L)
      val want = brute(cands, pairs, k = 4, lambdaPpm = 700000L)
      assert(got == want, s"trial $trial")
    }
  }
}
