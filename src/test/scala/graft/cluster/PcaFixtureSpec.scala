package graft.cluster

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Re-discharges the q123 fixture proof against the COMMITTED parquet
  * (tools/GenPcaClusterFixture asserts the same properties at generation
  * time; this spec makes a LocalPca or Hdbscan regression fail the build
  * instead of only the driver's round — the q104 fixture-pinning pattern
  * applied to the composed reduce→cluster path). */
class PcaFixtureSpec extends SparkSpec {

  private def cosDist(a: Array[Float], b: Array[Float]): Double =
    LocalCluster.cosineDistance(a, b)

  private lazy val groups: Map[Long, Array[Array[Float]]] = {
    val root = graft.core.Fixtures.resolve("pca_clusters", "GRAFT_PCA_FIXTURES")
    spark.read.parquet(s"$root/points.parquet")
      .select(col("group_id").cast("long"), col("point_id").cast("string"),
        col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getSeq[Float](2).toArray))
      .groupBy(_._1)
      // labelPerKey sorts by the item string before clustering — replicate
      .map { case (g, rows) => g -> rows.sortBy(_._2).map(_._3) }
  }

  test("fixture: exact-zero group means and 8-dim support") {
    assert(groups.size === 4)
    groups.foreach { case (g, raw) =>
      (0 until 16).foreach { j =>
        val sum = raw.foldLeft(0.0)((acc, v) => acc + v(j))
        assert(sum == 0.0, s"group $g dim $j mean not exactly zero")
      }
      raw.foreach(v => (8 until 16).foreach(j => assert(v(j) == 0f)))
    }
  }

  test("fixture: top-8 PCA is an isometry on the data (Δdist < 1e-5)") {
    groups.foreach { case (g, raw) =>
      val red = LocalPca.reduce(raw, 8).map(_.map(_.toFloat))
      val n = raw.length
      for (i <- 0 until n; j <- (i + 1) until n) {
        val delta = math.abs(cosDist(raw(i), raw(j)) - cosDist(red(i), red(j)))
        assert(delta < 1e-5, s"group $g pair ($i,$j): |Δdist| = $delta")
      }
    }
  }

  test("engine PCA→HDBSCAN equals the raw-distance ε-cut, per group") {
    groups.foreach { case (g, raw) =>
      val n = raw.length
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      for (i <- 0 until n; j <- (i + 1) until n)
        if (cosDist(raw(i), raw(j)) <= 0.01) {
          val (ri, rj) = (find(i), find(j))
          if (ri != rj) parent(math.max(ri, rj)) = math.min(ri, rj)
        }
      val bigRoots = (0 until n).groupBy(find).filter(_._2.size >= 5).keys.toSeq.sorted
      val lblOf = bigRoots.zipWithIndex.toMap
      val expect = (0 until n).map(i => lblOf.getOrElse(find(i), -1)).toArray
      val red = LocalPca.reduce(raw, 8).map(_.map(_.toFloat))
      val got = Hdbscan.labels(red, minClusterSize = 5, minSamples = 5,
        clusterSelectionEpsilon = 0.01)
      assert(java.util.Arrays.equals(got, expect),
        s"group $g: got ${got.mkString(",")} expect ${expect.mkString(",")}")
    }
  }
}
