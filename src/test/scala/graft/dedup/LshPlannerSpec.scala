package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Band-planner contract: the integer S-curve and both error integrals
  * agree with a literal Scala replay of the truncating product chains,
  * the curve is monotone in s, and the k = 8 family's argmin at
  * t = 0.5 is the repo's (4, 2) convention. */
class LshPlannerSpec extends SparkSpec {
  import spark.implicits._

  private def powPpm(x: Long, e: Int): Long =
    (2 to e).foldLeft(x)((acc, _) => acc * x / 1000000L)

  private def replay(b: Int, r: Int, tPpm: Long): (Long, Long) = {
    var fp = 0L; var fn = 0L
    (0 to 100).foreach { i =>
      val s = i * 10000L
      val p = 1000000L - powPpm(1000000L - powPpm(s, r), b)
      if (s <= tPpm) fp += p else fn += 1000000L - p
    }
    (fp, fn)
  }

  test("curve + integrals equal the literal replay; (4,2) chosen for k=8 at t=0.5") {
    val splits = Seq((1, 8), (2, 4), (4, 2), (8, 1))
    val out = LshPlanner.sCurve(spark, splits, tPpm = 500000L)
    assert(out.count() == splits.size * 101L)
    val sums = out.select("b", "r", "fp_sum_ppm", "fn_sum_ppm", "chosen")
      .distinct()
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(t => (t._1.toInt, t._2.toInt) -> ((t._3, t._4), t._5)).toMap
    splits.foreach { case (b, r) =>
      val ((fp, fn), _) = sums((b, r))
      assert((fp, fn) == replay(b, r, 500000L), s"sums mismatch at ($b, $r)")
    }
    assert(sums.collect { case (br, (_, 1L)) => br }.toSet == Set((4, 2)),
      "the k = 8 argmin at t = 0.5 must be the repo's (4, 2) convention")
    // per-pair monotone S-curve (collision probability rises with s)
    splits.foreach { case (b, r) =>
      val curve = out.filter(col("b") === b.toLong && col("r") === r.toLong)
        .orderBy(col("s_ppm")).select("p_ppm").as[Long].collect()
      assert(curve.zip(curve.tail).forall { case (a, c) => a <= c },
        s"curve not monotone at ($b, $r)")
      assert(curve.head == 0L && curve.last == 1000000L,
        "P(0) = 0 and P(1) = 1 exactly on the grid")
    }
  }

  test("kPlan: hash cost flips the argmin from k=16 (4,4) to k=8 (4,2); sums replay exactly") {
    val ks = Seq(4, 8, 16)
    // with no hash cost, more hashes always win: k=16's (4,4) has the
    // smallest FP+FN on this grid (16.26M vs k=8's best 17.50M)
    val free = LshPlanner.kPlan(spark, ks, tPpm = 500000L, hashCostPpm = 0L)
      .filter(col("chosen") === 1L).select("k", "b", "r").distinct()
      .as[(Long, Long, Long)].collect()
    assert(free.toSeq == Seq((16L, 4L, 4L)),
      s"zero-cost argmin must be the largest-k split, got ${free.toSeq}")
    // at a quarter grid-point per hash the cost term flips it to k=8
    val out = LshPlanner.kPlan(spark, ks, tPpm = 500000L,
      hashCostPpm = 250000L)
    val gridSize = ks.map(k => LshPlanner.splitsOf(k).size).sum
    assert(out.count() == gridSize * 101L)
    val chosen = out.filter(col("chosen") === 1L)
      .select("k", "b", "r").distinct().as[(Long, Long, Long)].collect()
    assert(chosen.toSeq == Seq((8L, 4L, 2L)),
      s"costed argmin must be (8, 4, 2), got ${chosen.toSeq}")
    // every (k, b, r)'s error sums equal the literal truncating replay,
    // and the score wires the cost term in exactly
    val sums = out.select("k", "b", "r", "fp_sum_ppm", "fn_sum_ppm",
        "hash_cost_ppm", "score_ppm").distinct()
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(sums.length == gridSize)
    sums.foreach { case (k, b, r, fp, fn, hc, score) =>
      assert(k == b * r, s"grid row not a split: ($k, $b, $r)")
      assert((fp, fn) == replay(b.toInt, r.toInt, 500000L),
        s"sums mismatch at ($k, $b, $r)")
      assert(hc == k * 250000L && score == fp + fn + hc)
    }
  }

  test("kPlan guards: empty/duplicate/out-of-range k, bad threshold, negative cost") {
    intercept[IllegalArgumentException](
      LshPlanner.kPlan(spark, Seq.empty, 500000L, 0L))
    intercept[IllegalArgumentException](
      LshPlanner.kPlan(spark, Seq(8, 8), 500000L, 0L))
    intercept[IllegalArgumentException](
      LshPlanner.kPlan(spark, Seq(33), 500000L, 0L))
    intercept[IllegalArgumentException](
      LshPlanner.kPlan(spark, Seq(8), 0L, 0L))
    intercept[IllegalArgumentException](
      LshPlanner.kPlan(spark, Seq(8), 500000L, -1L))
  }

  test("degenerate guards: empty splits, bad threshold, non-positive b/r") {
    intercept[IllegalArgumentException] {
      LshPlanner.sCurve(spark, Seq.empty, 500000L)
    }
    intercept[IllegalArgumentException] {
      LshPlanner.sCurve(spark, Seq((2, 4)), 1000000L)
    }
    intercept[IllegalArgumentException] {
      LshPlanner.sCurve(spark, Seq((0, 4)), 500000L)
    }
  }
}
