package graft.operators

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class IterativeQuantileSpec extends SparkSpec {
  import spark.implicits._

  private def bruteKth(values: Seq[Double], k: Long): Double =
    values.sorted.apply((k - 1).toInt)

  test("order statistics equal full-sort truth on o_totalprice") {
    val orders = Tables.orders(spark, sf)
    val vals = orders.select(col("o_totalprice").cast("double"))
      .as[Double].collect().toSeq
    val n = vals.size.toLong
    val ks = Seq(1L, n / 2, (9 * n) / 10, n)
    val got = IterativeQuantile.orderStatistics(orders, "o_totalprice", ks)
      .as[(Long, Double)].collect().toMap
    ks.foreach { k =>
      assert(got(k) === bruteKth(vals, k), s"rank $k")
    }
  }

  test("heavy duplicates: the k-th smallest value is exact when one bin " +
      "holds most of the data") {
    val dup = (Seq.fill(900)(5.0) ++ (1 to 100).map(_.toDouble)).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
    val df = dup.toDF("id", "v")
    val ks = Seq(1L, 100L, 500L, 950L, 1000L)
    val got = IterativeQuantile.orderStatistics(df, "v", ks)
      .as[(Long, Double)].collect().toMap
    val truth = dup.map(_._2)
    ks.foreach(k => assert(got(k) === bruteKth(truth, k), s"rank $k"))
  }

  test("constant column (zero-width histogram) still selects correctly") {
    val df = spark.range(100).select(lit(7.5).as("v"))
    val got = IterativeQuantile.orderStatistics(df, "v", Seq(1L, 50L, 100L))
      .as[(Long, Double)].collect().toMap
    assert(got.values.toSet === Set(7.5))
  }

  test("out-of-range rank is rejected") {
    val df = spark.range(10).select(col("id").cast("double").as("v"))
    intercept[IllegalArgumentException] {
      IterativeQuantile.orderStatistics(df, "v", Seq(11L))
    }
  }
}
