package graft.operators

import graft.SparkSpec

/** MAD summary contract. Independent reference: plain-Scala sort /
  * lower-median / Hampel counting. */
class RobustStatsSpec extends SparkSpec {

  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long)]) =
    RobustStats.madSummary(rows.toDF("g", "id", "v"), "g", "id", "v")
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap

  private def reference(vals: Seq[(Long, Long)]): (Long, Long, Long, Long, Long, Long) = {
    def lowerMedian(xs: Seq[Long]): Long = {
      val s = xs.sorted
      s(((s.size + 1) / 2) - 1)
    }
    val med = lowerMedian(vals.map(_._2))
    val devs = vals.map { case (id, v) => (id, math.abs(v - med)) }
    val mad = lowerMedian(devs.map(_._2))
    val nOut = devs.count(_._2 > 3 * mad).toLong
    val top = devs.minBy { case (id, d) => (-d, id) }
    (vals.size.toLong, med, mad, nOut, top._1, top._2)
  }

  test("hand fixture: odd group with one wild value") {
    // values 10,11,12,13,1000 -> med 12, devs 2,1,0,1,988 -> mad 1,
    // outliers: dev > 3 -> only 1000 (id 5)
    val rows = Seq(("a", 1L, 10L), ("a", 2L, 11L), ("a", 3L, 12L),
      ("a", 4L, 13L), ("a", 5L, 1000L))
    assert(run(rows)("a") == ((5L, 12L, 1L, 1L, 5L, 988L)))
  }

  test("even group uses the LOWER median, not an interpolated middle") {
    // values 1,2,3,100 -> lower median = rank 2 -> 2
    val rows = Seq(("b", 1L, 1L), ("b", 2L, 2L), ("b", 3L, 3L), ("b", 4L, 100L))
    val (_, med, _, _, _, _) = run(rows)("b")
    assert(med == 2L)
  }

  test("randomized agreement with the plain-Scala reference, multi-group") {
    val rnd = new scala.util.Random(17)
    val rows = for {
      g <- Seq("x", "y", "z"); i <- 1 to 40
    } yield (g, i.toLong, (rnd.nextInt(2001) - 1000).toLong *
      (if (rnd.nextInt(10) == 0) 50 else 1))
    val got = run(rows)
    rows.groupBy(_._1).foreach { case (g, vs) =>
      assert(got(g) == reference(vs.map(t => (t._2, t._3))), s"group $g")
    }
  }

  test("all-identical values: mad 0, every deviation an outlier only if > 0") {
    val rows = Seq(("c", 1L, 7L), ("c", 2L, 7L), ("c", 3L, 7L))
    assert(run(rows)("c") == ((3L, 7L, 0L, 0L, 1L, 0L)))
  }
}
