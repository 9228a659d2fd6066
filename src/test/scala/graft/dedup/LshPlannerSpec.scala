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
