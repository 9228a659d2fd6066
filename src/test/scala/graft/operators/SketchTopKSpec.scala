package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SketchTopK: certified path, fallback path, small edges, and the
  * tie-boundary regression (kth exact count == T must NOT certify —
  * a non-candidate with global count exactly T and a lexicographically
  * smaller item would be the true top-k under (n desc, item asc)). */
class SketchTopKSpec extends SparkSpec {
  import spark.implicits._

  private def exactTopK(items: Seq[String], k: Int): Seq[(String, Long)] =
    items.groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .sortBy { case (t, c) => (-c, t) }.take(k)

  private def run(items: Seq[String], slices: Int, k: Int, m: Int): Seq[(String, Long)] = {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(items.map(Tuple1(_)), slices))
      .toDF("item")
    SketchTopK.topK(df, "item", k, perPartitionM = m)
      .orderBy(col("n").desc, col("item"))
      .as[(String, Long)].collect().toSeq
  }

  test("certified path: untruncated sketch (t == 0) returns exact top-k") {
    val items = Seq.fill(50)("x") ++ Seq.fill(20)("y") ++ Seq.fill(5)("z")
    assert(run(items, 3, 2, 4096) === exactTopK(items, 2))
  }

  test("fallback path: tiny m forces the full aggregation, result still exact") {
    val items = (0 until 300).map(i => s"t${i % 17}") ++ Seq.fill(40)("hot")
    val got = run(items, 8, 5, 5)
    assert(got === exactTopK(items, 5))
  }

  test("tie boundary: kth == T must fall back, not certify a wrong winner") {
    // slices of 3: p1 = [b,b,a] (top-1 b, bound 1), p2 = [c,c,a] (top-1 c,
    // bound 1) → T = 2, candidates {b, c}, best candidate (b, 2) ties T —
    // but the true top-1 is the NON-candidate (a, 2) under (n desc, item asc).
    val items = Seq("b", "b", "a", "c", "c", "a")
    assert(run(items, 2, 1, 1) === Seq(("a", 2L)))
  }

  test("fewer than k distinct items, no truncation: certified complete") {
    val items = Seq("a", "a", "b", "c")
    assert(run(items, 2, 10, 4096) === exactTopK(items, 10))
  }

  test("empty input returns empty frame") {
    assert(run(Seq.empty, 2, 3, 16).isEmpty)
  }

  test("zero-partition input (no bound rows at all) returns empty frame") {
    // parallelize(_, n) keeps n empty partitions, each still emitting a
    // bound row; an emptyRDD has ZERO partitions, so the bound aggregate
    // sums over no rows — the null-sum guard must treat that as t == 0
    val df = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("item",
          org.apache.spark.sql.types.StringType))))
    assert(df.rdd.getNumPartitions === 0)
    assert(SketchTopK.topK(df, "item", 3, perPartitionM = 16).count() === 0)
  }

  test("nulls are dropped before counting") {
    val df = Seq(Some("a"), None, Some("a"), Some("b"), None)
      .toDF("item")
    val got = SketchTopK.topK(df, "item", 2, perPartitionM = 16)
      .orderBy(col("n").desc, col("item")).as[(String, Long)].collect().toSeq
    assert(got === Seq(("a", 2L), ("b", 1L)))
  }

  test("argument validation") {
    val df = Seq("a").toDF("item")
    intercept[IllegalArgumentException](SketchTopK.topK(df, "item", 0))
    intercept[IllegalArgumentException](SketchTopK.topK(df, "item", 10, perPartitionM = 5))
  }
}
