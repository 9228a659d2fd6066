package graft.similarity

import graft.SparkSpec

/** Margin mining against a literal Scala replay of the definition (same
  * cosine accumulation order as the Expression, same integer grids and
  * tie-breaks), plus the hub theorem the margin exists for: a target
  * close to EVERYTHING loses to a target specifically close to one
  * source even when its raw cosine is higher. */
class BitextMineSpec extends SparkSpec {
  import spark.implicits._

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Literal replay of BitextMine.mutualMargin. */
  private def reference(src: Seq[(Long, Array[Double])],
      tgt: Seq[(Long, Array[Double])], k: Int)
      : Set[(Long, Long, Long, Long)] = {
    val sims = (for ((sid, sv) <- src; (tid, tv) <- tgt) yield {
      val c = cos(sv, tv)
      (sid, tid, (math.signum(c) * math.floor(math.abs(c * 1e9) + 0.5)).toLong)
    }).filter(_._3 > 0)
    def topkSum[K](rows: Seq[(Long, Long, Long)], key: ((Long, Long, Long)) => Long,
        other: ((Long, Long, Long)) => Long): Map[Long, Long] =
      rows.groupBy(key).map { case (g, rs) =>
        g -> rs.sortBy(r => (-r._3, other(r))).take(k).map(_._3).sum
      }
    val sumX = topkSum(sims, _._1, _._2)
    val sumY = topkSum(sims, _._2, _._1)
    val scored = sims.map { case (sid, tid, sp) =>
      (sid, tid, sp, sp * 2 * k * 1000000L / (sumX(sid) + sumY(tid)))
    }
    val fwd = scored.groupBy(_._1).map { case (_, rs) =>
      rs.minBy(r => (-r._4, -r._3, r._2)) }.toSet
    val bwd = scored.groupBy(_._2).map { case (_, rs) =>
      rs.minBy(r => (-r._4, -r._3, r._1)) }
      .map(r => (r._1, r._2)).toSet
    fwd.filter(r => bwd((r._1, r._2))).map(r => (r._1, r._2, r._3, r._4))
  }

  private def run(src: Seq[(Long, Array[Double])],
      tgt: Seq[(Long, Array[Double])], k: Int) =
    BitextMine.mutualMargin(
      src.map { case (i, v) => (i, v.toSeq) }.toDF("id", "vec"),
      tgt.map { case (i, v) => (i, v.toSeq) }.toDF("id", "vec"),
      "id", "vec", k)
      .as[(Long, Long, Long, Long)].collect().toSet

  test("exact agreement with the literal replay on random pools") {
    for (trial <- 1 to 2) {
      val rnd = new scala.util.Random(30 + trial)
      def pool(off: Long, n: Int) = (0 until n).map(i =>
        (off + i, Array.fill(8)(rnd.nextDouble() * 2 - 1)))
      val src = pool(0L, 12); val tgt = pool(100L, 15)
      assert(run(src, tgt, k = 4) == reference(src, tgt, k = 4), s"trial $trial")
    }
  }

  test("the margin demotes a hub: specific target wins even at lower " +
      "raw cosine") {
    // sources: x1 distinct, x2..x5 clustered; y_hub near EVERY source
    // (raw cos to x1 = 0.90); y_spec near x1 only (raw cos 0.85,
    // negative to the cluster so its neighborhood sum stays small)
    val e1 = Array(1.0, 0.0); val e2 = Array(0.0, 1.0)
    def mix(a: Double, b: Double) = Array(a, b)
    val src = Seq(1L -> e1) ++ (2L to 5L).map(i => i -> mix(0.05, 1.0))
    val tgt = Seq(
      10L -> mix(0.90, math.sqrt(1 - 0.81)), // hub: cos 0.90 to x1, ~0.48 to cluster... and high to e2 cluster
      11L -> mix(0.85, -math.sqrt(1 - 0.7225))) // specific: cos 0.85 to x1, negative to cluster
    val got = run(src, tgt, k = 4)
    // sanity of the construction: raw cosine prefers the hub for x1
    assert(cos(e1, tgt(0)._2) > cos(e1, tgt(1)._2))
    // the mined match for x1 is the SPECIFIC target
    val x1matches = got.filter(_._1 == 1L).map(_._2)
    assert(x1matches == Set(11L),
      s"margin must pick the specific target, got $x1matches in $got")
    // and the engine agrees with the replay on the fixture too
    assert(got == reference(src, tgt, k = 4))
  }
}
