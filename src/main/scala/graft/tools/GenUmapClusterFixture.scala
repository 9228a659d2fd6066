package graft.tools

import org.apache.spark.sql.SparkSession
import graft.cluster.{LocalCluster, LocalUmap}

/** One-shot generator for the committed UMAP-clustering fixture
  * (`fixtures/umap_clusters/points.parquet`): per-group 16-dim point sets
  * constructed so that the COMPOSED reduce→cluster path with the TRUE
  * op-58 algorithm — per-group UMAP to 4 dims (LocalUmap at the
  * reference's n_neighbors=15/min_dist=0.1/cosine parameters) followed by
  * the ε-cut on reduced-space cosine distances — returns exactly the
  * ε=0.3 single-linkage cut of the RAW 16-dimensional cosine distances,
  * which a recursive-CTE DuckDB oracle replays with no UMAP at all
  * (q124). This is q123's label-level-oracle trick extended from the PCA
  * substitute to the faithful algorithm (`assets/old_history.py:157-176`).
  *
  * Unlike PCA, an SGD layout admits no isometry argument — the discharge
  * is structural, and every property is ASSERTED on the generated data
  * before writing (the committed parquet + the deterministic engine pin
  * it thereafter):
  *
  *  1. **The raw ε-cut is the blob partition, with margin.** In-blob
  *     cosine distances stay below 0.02 and cross-blob distances above
  *     0.85 (blob directions are orthogonal axes), 15×+ clear of the
  *     oracle's ε = 0.3 on both sides.
  *  2. **The k-NN graph is blob-contained.** Every blob has ≥ 20 > 15
  *     members, and every point's 15 nearest raw-cosine neighbors are
  *     asserted in-blob — so UMAP's fuzzy graph has NO cross-blob edges:
  *     attraction only ever acts within a blob, repulsion (negative
  *     sampling) only ever pushes blobs apart, and the layout cannot merge
  *     blobs regardless of how the SGD converges.
  *  3. **No outliers.** A singleton's k-NN list must reach into some blob
  *     (k-NN is total), which would attract it into that blob's layout
  *     neighborhood and diverge from the raw ε-cut's noise verdict — so
  *     every fixture point belongs to a ≥ 20-point blob, and noise
  *     semantics stay covered by q104/q105/q123 (whose reductions don't
  *     move points).
  *  4. **The actual engine path agrees.** LocalUmap.reduce → toFloat →
  *     clusterVectors(ε=0.2, minClusterSize=5) is run on every group and
  *     asserted label-for-label equal to an independent raw-distance
  *     union-find using the oracle's numbering (clusters ≥ 5 numbered by
  *     smallest sorted-order member), twice (determinism smoke — the
  *     full contract is LocalUmapSpec's).
  *
  * Geometry per group g (16 dims): 3 blobs on orthogonal axes e0/e1/e2
  * with magnitudes 2, 3/2, 5/4 and sizes 20 + (g+b) % 3; every
  * coordinate gets deterministic jitter ±0.02 from a per-group-seeded
  * `java.util.Random`, keeping blobs tight cones around their axes.
  *
  * Run once; output committed. Reproducible — fixed seeds.
  */
object GenUmapClusterFixture {

  private val Dim = 16
  private val EpsRaw = 0.3 // the oracle's raw-space cut
  private val EpsEmbed = 0.2 // the engine's reduced-space cut
  private val K = 15 // reference n_neighbors

  private def cosDist(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    1.0 - dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("fixtures/umap_clusters")

    // ---- construct --------------------------------------------------
    val blobMags = Array(2.0f, 1.5f, 1.25f)
    val rows = (0L until 3L).flatMap { g =>
      val rng = new java.util.Random(0xbeef0000L + g)
      var pid = 0L
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int, Array[Float])]
      for (b <- 0 until 3) {
        val size = 20 + ((g + b) % 3).toInt
        for (_ <- 0 until size) {
          val v = new Array[Float](Dim)
          v(b) = blobMags(b)
          for (j <- 0 until Dim)
            v(j) = (v(j) + 0.04 * (rng.nextDouble() - 0.5)).toFloat
          buf += ((g, pid, b, v)); pid += 1
        }
      }
      buf.toSeq
    }

    // ---- discharge assertions --------------------------------------
    rows.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (g, grp0) =>
      // labelPerKey sorts by the item STRING before clustering — replicate
      val grp = grp0.sortBy(_._2.toString)
      val raw = grp.map(_._4).toArray
      val tags = grp.map(_._3).toArray
      val n = raw.length

      // (1) raw-cut margins around ε = 0.3
      var inBlobMax = 0.0
      var crossMin = Double.MaxValue
      for (i <- 0 until n; j <- (i + 1) until n) {
        val d = cosDist(raw(i), raw(j))
        if (tags(i) == tags(j)) inBlobMax = math.max(inBlobMax, d)
        else crossMin = math.min(crossMin, d)
      }
      require(inBlobMax < 0.02, s"group $g: in-blob distance $inBlobMax too large")
      require(crossMin > 0.85, s"group $g: cross-blob distance $crossMin too small")

      // (2) k-NN containment: no cross-blob edge can enter the fuzzy graph
      for (i <- 0 until n) {
        val nn = (0 until n).filter(_ != i).sortBy(j => cosDist(raw(i), raw(j))).take(K)
        require(nn.forall(j => tags(j) == tags(i)),
          s"group $g point $i: a ${K}-NN neighbor crosses blobs")
      }

      // (3)+(4) engine path ≡ raw ε-cut with the oracle's numbering, twice
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      for (i <- 0 until n; j <- (i + 1) until n)
        if (cosDist(raw(i), raw(j)) <= EpsRaw) {
          val (ri, rj) = (find(i), find(j))
          if (ri != rj) parent(math.max(ri, rj)) = math.min(ri, rj)
        }
      val comps = (0 until n).groupBy(find)
      val bigRoots = comps.filter(_._2.size >= 5).keys.toSeq.sorted
      val lblOf = bigRoots.zipWithIndex.toMap
      val expect = (0 until n).map(i => lblOf.getOrElse(find(i), -1)).toArray
      require(expect.forall(_ >= 0), s"group $g: unexpected raw-cut noise")
      val layouts = (1 to 2).map { _ =>
        LocalUmap.reduce(raw, 4).map(_.map(_.toFloat))
      }
      require(layouts(0).zip(layouts(1)).forall { case (a, b) => a.sameElements(b) },
        s"group $g: UMAP layout is not deterministic")
      val got = LocalCluster.clusterVectors(layouts(0), EpsEmbed, minClusterSize = 5)
      require(java.util.Arrays.equals(got, expect),
        s"group $g: engine UMAP→ε-cut labels differ from the raw ε-cut\n" +
          s"  got:    ${got.mkString(",")}\n  expect: ${expect.mkString(",")}")
      println(s"[gen-umap-fixture] group $g: n=$n " +
        f"inBlobMax=$inBlobMax%.2e crossMin=$crossMin%.3f " +
        s"clusters=${expect.max + 1} OK")
    }

    // ---- write ------------------------------------------------------
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    rows.map { case (g, pid, _, v) => (g, pid, v.toSeq) }
      .toDF("group_id", "point_id", "embedding")
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/points.parquet")
    println(s"[gen-umap-fixture] wrote ${rows.length} points to $outDir/points.parquet")
    spark.stop()
  }
}
