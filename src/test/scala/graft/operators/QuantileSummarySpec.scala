package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Rank-sample quantile summary contract. Independent references: exact
  * order statistics computed in plain Scala, and the rank-window
  * theorem checked against exact counts. */
class QuantileSummarySpec extends SparkSpec {

  import spark.implicits._

  private def deciles(vals: Seq[Long], m: Int, parts: Int) =
    QuantileSummary.quantiles(
      QuantileSummary.summaries(
        vals.toDF("v").repartition(parts), "v", m), q = 10)
      .collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap

  test("hand fixture: n=10 m=2 on one partition keeps positions 5 and 10") {
    val rows = QuantileSummary.summaries(
        (1L to 10L).toDF("v").coalesce(1), "v", m = 2)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows == Set((0, 5L, 5L), (0, 10L, 5L), (1, 0L, 5L)))
  }

  test("spacing 1 (m >= n, single partition) reproduces exact order statistics") {
    val vals = (1L to 100L)
    val out = deciles(vals, m = 128, parts = 1)
    for (i <- 1 to 9) {
      val (value, target, n, e) = out(i * 10)
      assert(n == 100L && e == 1L && target == i * 10L)
      assert(value == i * 10L, s"phi=${i * 10}: got $value") // ceil(phi*N)-th
    }
  }

  test("rank-window theorem holds at every partitioning; summary is weight-conserving") {
    val rnd = new scala.util.Random(13)
    val vals = Seq.fill(5000)(rnd.nextInt(100000).toLong)
    val sorted = vals.sorted
    for (parts <- Seq(1, 7, 32)) {
      val sumDf = QuantileSummary.summaries(
        vals.toDF("v").repartition(parts), "v", m = 64)
      val entries = sumDf.filter(col("kind") === 0)
        .agg(sum(col("w"))).collect().head.getLong(0)
      assert(entries == 5000L, s"parts=$parts: weights must conserve N")
      val out = QuantileSummary.quantiles(sumDf, q = 10).collect()
      out.foreach { r =>
        val (value, target, e) = (r.getLong(1), r.getLong(2), r.getLong(4))
        val lo = sorted.count(_ < value).toLong
        val hi = sorted.count(_ <= value).toLong
        assert(hi >= target, s"parts=$parts phi=${r.getInt(0)}: hi=$hi < $target")
        assert(lo < target + 2 * e,
          s"parts=$parts phi=${r.getInt(0)}: lo=$lo >= $target+2*$e")
      }
    }
  }

  test("merge = plain union: bounds still hold over concatenated summaries") {
    val a = (1L to 3000L)
    val b = (2000L to 7000L)
    val sa = QuantileSummary.summaries(a.toDF("v").repartition(3), "v", 64)
    val sb = QuantileSummary.summaries(b.toDF("v").repartition(5), "v", 64)
    val merged = sa.unionAll(sb)
    val all = (a ++ b).sorted
    QuantileSummary.quantiles(merged, q = 10).collect().foreach { r =>
      val (value, target, n, e) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(n == all.size.toLong)
      val lo = all.count(_ < value).toLong
      val hi = all.count(_ <= value).toLong
      assert(hi >= target && lo < target + 2 * e,
        s"phi=${r.getInt(0)}: [$lo,$hi] vs target $target e=$e")
    }
  }
}
