package graft.sources

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("ZInterleave golden values and bit layout") {
    import graft.functions.ZInterleave
    // 2 dims, bits 0..: out bit (b*2 + d) = bit b of dim d
    assert(ZInterleave.interleave(Array(1, 0), 4) == 1L) // x bit0 → out bit0
    assert(ZInterleave.interleave(Array(0, 1), 4) == 2L) // y bit0 → out bit1
    assert(ZInterleave.interleave(Array(3, 0), 4) == 5L) // x bits0,1 → out 0,2
    assert(ZInterleave.interleave(Array(0, 3), 4) == 10L)
    assert(ZInterleave.interleave(Array(15, 15), 4) == 255L)
  }

  test("QuantileBucket: boundary semantics and codegen parity") {
    import graft.functions.QuantileBucket
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.types.DoubleType
    val e = QuantileBucket(BoundReference(0, DoubleType, nullable = true), Seq(1.0, 2.0, 3.0))
    val proj = GenerateUnsafeProjection.generate(Seq(e))
    for ((v, want) <- Seq(0.5 -> 0, 1.0 -> 0, 1.5 -> 1, 2.0 -> 1, 2.5 -> 2, 3.0 -> 2, 9.0 -> 3)) {
      assert(e.compute(v) == want, s"compute($v)")
      assert(proj(InternalRow(v)).getInt(0) == want, s"codegen($v)")
    }
    assert(proj(InternalRow(null)).getInt(0) == 0) // nulls → first bucket
  }

  test("partitioned variant: pruned box scan equals the full filter on random boxes") {
    val rnd = new scala.util.Random(42)
    val maxX = 9999L; val maxY = 999L
    val rows = (1 to 5000).map { i =>
      (i.toLong, rnd.nextLong(maxX + 1), rnd.nextLong(maxY + 1))
    }
    val df = rows.toDF("id", "x", "y")
    val path = graft.core.Scratch.tempDir("zorder-spec") + "/layout"
    ZOrder.writePartitioned(df, "x", "y", maxX, maxY, path)
    for (trial <- 1 to 5) {
      val a = rnd.nextLong(maxX); val b = rnd.nextLong(maxX)
      val c = rnd.nextLong(maxY); val e = rnd.nextLong(maxY)
      val (xLo, xHi) = (math.min(a, b), math.max(a, b))
      val (yLo, yHi) = (math.min(c, e), math.max(c, e))
      val pruned = ZOrder.boxScan(spark, path, "x", "y", maxX, maxY,
          xLo, xHi, yLo, yHi)
        .select("id").as[Long].collect().toSet
      val full = rows.filter(r => r._2 >= xLo && r._2 <= xHi &&
        r._3 >= yLo && r._3 <= yHi).map(_._1).toSet
      assert(pruned == full, s"trial $trial box [$xLo,$xHi]x[$yLo,$yHi]")
    }
    // a small box covers few cells: 1/4 × 1/4 of the domain spans at most
    // a 5×5 cell block (4 16-blocks + boundary on each axis)
    def q(v: Long, m: Long) = v * 256 / (m + 1)
    val cells = ZOrder.coveringCells(
      q(1000, maxX), q(3400, maxX), q(100, maxY), q(340, maxY))
    assert(cells.size <= 25 && cells.nonEmpty, s"${cells.size} cells")
    assert(cells.distinct.size == cells.size)
  }

  test("z-order layout prunes point predicates on BOTH dims; single sort on one") {
    // UNCORRELATED dimensions (orderkey ⟂ partkey — unlike suppkey, which
    // TPC-H derives from partkey, so a partkey sort clusters it for free).
    // Metric = min/max-stats pruning: the fraction of partitions whose
    // [min,max] interval on a dim contains a probe point — exactly what
    // parquet row-group skipping evaluates. (A total-bounding-volume metric
    // is useless here: any 16-way tiling of the 2-D space conserves area.)
    val li = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_orderkey"))
    val parts = 16
    def hitFraction(df: org.apache.spark.sql.DataFrame, dim: String): Double = {
      val boxes = df.withColumn("pid", spark_partition_id())
        .groupBy("pid").agg(min(dim).as("lo"), max(dim).as("hi"))
        .select(col("lo").cast("double"), col("hi").cast("double"))
        .collect().map(r => (r.getDouble(0), r.getDouble(1)))
      val glo = boxes.map(_._1).min
      val ghi = boxes.map(_._2).max
      val probes = (1 to 40).map(i => glo + (ghi - glo) * i / 41.0)
      probes.map(p => boxes.count { case (lo, hi) => lo <= p && p <= hi }
        .toDouble / boxes.length).sum / probes.size
    }
    val byOrder = li.repartitionByRange(parts, col("l_orderkey"))
      .sortWithinPartitions(col("l_orderkey"))
    val zOrdered = ZOrder.cluster(li, Seq("l_orderkey", "l_partkey"),
      bits = 8, numPartitions = parts)
    // single sort: perfect on its own dim, NO pruning on the other
    assert(hitFraction(byOrder, "l_orderkey") < 0.2)
    assert(hitFraction(byOrder, "l_partkey") > 0.9)
    // z-order: substantial pruning on BOTH dims simultaneously
    val zOrderFrac = hitFraction(zOrdered, "l_orderkey")
    val zPartFrac = hitFraction(zOrdered, "l_partkey")
    assert(zOrderFrac < 0.65, s"orderkey hit fraction $zOrderFrac")
    assert(zPartFrac < 0.65, s"partkey hit fraction $zPartFrac")
  }

  test("empty input clusters and writes an empty table instead of throwing") {
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").filter(lit(false))
    assert(ZOrder.cluster(li, Seq("l_orderkey", "l_partkey")).count() == 0)
    val path = java.nio.file.Files.createTempDirectory("zorder-empty").toString + "/t"
    ZOrder.write(li, Seq("l_orderkey", "l_partkey"), path)
    assert(spark.read.parquet(path).count() == 0)
  }

  test("all-null clustering column degrades alone; other dims still cluster") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey")
      .withColumn("dead", lit(null).cast("double"))
    // the all-null column yields no quantile boundaries; the z-value must
    // still vary with the healthy columns (the old behavior collapsed the
    // whole z-value to 0, silently destroying the layout)
    val z = li.select(ZOrder.zvalue(li, Seq("l_orderkey", "dead"), bits = 4).as("z"))
    assert(z.distinct().count() > 1)
    // fully-degraded input (every column all-null) still degrades to a
    // constant instead of throwing
    val allDead = li.withColumn("dead2", lit(null).cast("double"))
    val z2 = allDead.select(
      ZOrder.zvalue(allDead, Seq("dead", "dead2"), bits = 4).as("z"))
    assert(z2.distinct().count() == 1)
  }

  test("z-ordered write round-trips the data unchanged") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey", "l_suppkey")
    val path = java.nio.file.Files.createTempDirectory("zorder").toString + "/t"
    ZOrder.write(li, Seq("l_partkey", "l_suppkey"), path)
    val back = spark.read.parquet(path)
    assert(back.count() == li.count())
    assert(back.agg(sum("l_orderkey")).head().getLong(0) ==
      li.agg(sum("l_orderkey")).head().getLong(0))
  }
}
