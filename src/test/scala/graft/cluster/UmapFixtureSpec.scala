package graft.cluster

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Re-discharges the q124 fixture proof against the COMMITTED parquet
  * (tools/GenUmapClusterFixture asserts the same properties at generation
  * time; this spec makes a LocalUmap or clusterVectors regression fail the
  * build instead of only the driver's round — PcaFixtureSpec's pattern for
  * the faithful op-58 algorithm). */
class UmapFixtureSpec extends SparkSpec {

  private def cosDist(a: Array[Float], b: Array[Float]): Double =
    LocalCluster.cosineDistance(a, b)

  private lazy val groups: Map[Long, Array[Array[Float]]] = {
    val root = graft.core.Fixtures.resolve("umap_clusters", "GRAFT_UMAP_FIXTURES")
    spark.read.parquet(s"$root/points.parquet")
      .select(col("group_id").cast("long"), col("point_id").cast("string"),
        col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getSeq[Float](2).toArray))
      .groupBy(_._1)
      // labelPerKey sorts by the item string before clustering — replicate
      .map { case (g, rows) => g -> rows.sortBy(_._2).map(_._3) }
  }

  test("fixture: raw ε-cut margins and 15-NN blob containment hold") {
    assert(groups.size === 3)
    groups.foreach { case (g, raw) =>
      val n = raw.length
      // blob = raw ε=0.3 component (the oracle's ground truth)
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      for (i <- 0 until n; j <- (i + 1) until n)
        if (cosDist(raw(i), raw(j)) <= 0.3) {
          val (ri, rj) = (find(i), find(j))
          if (ri != rj) parent(math.max(ri, rj)) = math.min(ri, rj)
        }
      val tag = Array.tabulate(n)(find)
      var inBlobMax = 0.0
      var crossMin = Double.MaxValue
      for (i <- 0 until n; j <- (i + 1) until n) {
        val d = cosDist(raw(i), raw(j))
        if (tag(i) == tag(j)) inBlobMax = math.max(inBlobMax, d)
        else crossMin = math.min(crossMin, d)
      }
      assert(inBlobMax < 0.02, s"group $g: in-blob max $inBlobMax")
      assert(crossMin > 0.85, s"group $g: cross-blob min $crossMin")
      for (i <- 0 until n) {
        val nn = (0 until n).filter(_ != i).sortBy(j => cosDist(raw(i), raw(j))).take(15)
        assert(nn.forall(j => tag(j) == tag(i)),
          s"group $g point $i: a 15-NN neighbor crosses blobs")
      }
    }
  }

  test("engine UMAP→ε-cut equals the raw-distance ε-cut, per group") {
    groups.foreach { case (g, raw) =>
      val n = raw.length
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      for (i <- 0 until n; j <- (i + 1) until n)
        if (cosDist(raw(i), raw(j)) <= 0.3) {
          val (ri, rj) = (find(i), find(j))
          if (ri != rj) parent(math.max(ri, rj)) = math.min(ri, rj)
        }
      val bigRoots = (0 until n).groupBy(find).filter(_._2.size >= 5).keys.toSeq.sorted
      val lblOf = bigRoots.zipWithIndex.toMap
      val expect = (0 until n).map(i => lblOf.getOrElse(find(i), -1)).toArray
      val red = LocalUmap.reduce(raw, 4).map(_.map(_.toFloat))
      val got = LocalCluster.clusterVectors(red, eps = 0.2, minClusterSize = 5)
      assert(java.util.Arrays.equals(got, expect),
        s"group $g: got ${got.mkString(",")} expect ${expect.mkString(",")}")
    }
  }
}
