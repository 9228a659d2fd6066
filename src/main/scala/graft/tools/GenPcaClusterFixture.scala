package graft.tools

import org.apache.spark.sql.SparkSession
import graft.cluster.{Hdbscan, LocalPca}

/** One-shot generator for the committed PCA-clustering fixture
  * (`fixtures/pca_clusters/points.parquet`): per-group 16-dim point sets
  * CONSTRUCTED so that the COMPOSED reduce→cluster path — per-group PCA to
  * 8 dims (LocalPca, the op-58 UMAP substitute) followed by true HDBSCAN
  * (minClusterSize=5, minSamples=5, cluster_selection_epsilon=0.01) —
  * provably returns the flat ε=0.01 single-linkage cut of the RAW
  * 16-dimensional cosine distances, which a recursive-CTE DuckDB oracle
  * can replay with no PCA at all (q123). This upgrades the q104/q105
  * fixture trick from the clustering kernel alone to the reference's full
  * reduce-then-cluster composition (`assets/old_history.py:155-176`).
  *
  * Why PCA provably changes nothing here (each property is ASSERTED on the
  * generated data before writing, and the committed parquet pins it):
  *
  *  1. **Centering is exact.** Every group is antipodally mirrored (point
  *     v ⇒ point −v) and every coordinate is a multiple of 2⁻¹⁰ with
  *     magnitude ≤ 2, so all partial sums in LocalPca's mean pass are
  *     exactly representable and the per-dimension group mean is EXACTLY
  *     0.0 — PCA's centering step is the identity and reduced-space cosine
  *     compares the same vectors raw-space cosine does.
  *  2. **The projection is an isometry on the data.** Points span EXACTLY
  *     the first 8 coordinates (9..16 identically zero), so the covariance
  *     has rank 8, the top-8 components recovered by power iteration form
  *     an orthonormal basis of the data's own subspace, and projecting
  *     onto them preserves every dot product and norm — reduced-space
  *     cosine distance equals raw-space cosine distance up to numerical
  *     error ≲ 1e-7, asserted < 1e-5, against decision margins ≥ 1e-2.
  *  3. **The ε-cut is degenerate for HDBSCAN** (the q104/q105 argument,
  *     restated in the reduced=raw metric): blobs are tight (in-blob
  *     distance ≲ 6e-6 ≪ ε = 0.01) with ≥ 6 points, so every member's
  *     5th-nearest-other core distance is in-blob and leaf stabilities
  *     dwarf any parent's; all inter-blob / outlier distances ≥ 0.8 exceed
  *     ε by 80×, so the ε-cut components are exactly the blobs, Excess-of-
  *     Mass selects the blobs, the epsilon search never climbs, and the
  *     mirrored/axis-separated outliers attach only at root level — noise
  *     under both algorithms.
  *
  * As the final discharge, the generator runs the ACTUAL engine path
  * (LocalPca.reduce → toFloat → Hdbscan.labels at the q123 parameters) on
  * every group and asserts label-for-label equality with an independent
  * raw-distance ε-cut union-find using the oracle's numbering convention.
  *
  * Geometry per group (axes e0..e7; sizes vary with the group id):
  *   blob A± = ±(2·e0 + (1/16 + i/1024)·e4), size 6 + (g%3)
  *   blob B± = ±(3/2·e1 + (1/16 + i/1024)·e5), size 6 + ((g+1)%3)
  *   blob C± = ±(5/4·e2 + (1/16 + i/1024)·e6), size 6 + ((g+2)%3)
  *   outlier O1± = ±(7/4·e3 + 1/8·e7), outlier O2± = ±(5/4·e7 + 1/8·e3)
  * — 6 blobs + 4 outliers per group; all magnitudes dyadic.
  *
  * Run once; output committed. Deterministic — no RNG.
  */
object GenPcaClusterFixture {

  private val Dim = 16
  private val SubDim = 8
  private val Eps = 0.01

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
    val outDir = args.headOption.getOrElse("fixtures/pca_clusters")

    // ---- construct --------------------------------------------------
    // rows: (group, pointId, blobTag, coords); blobTag -1 = outlier
    val rows = (0L until 4L).flatMap { g =>
      var pid = 0L
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int, Array[Float])]
      def emitMirrored(tag: Int, coords: Array[Float]): Unit = {
        // the mirrored twin is its own blob (antipodal ⇒ cosine distance 2)
        buf += ((g, pid, tag, coords)); pid += 1
        buf += ((g, pid, if (tag < 0) -1 else tag + 3, coords.map(-_))); pid += 1
      }
      val blobAxes = Array((0, 4, 2.0f), (1, 5, 1.5f), (2, 6, 1.25f))
      for (b <- 0 until 3) {
        val (cAxis, pAxis, mag) = blobAxes(b)
        val size = 6 + ((g + b) % 3).toInt
        for (i <- 0 until size) {
          val v = new Array[Float](Dim)
          v(cAxis) = mag
          v(pAxis) = (64 + i).toFloat / 1024f // 1/16 + i/1024, exact dyadic
          emitMirrored(b, v)
        }
      }
      val o1 = new Array[Float](Dim); o1(3) = 1.75f; o1(7) = 0.125f
      val o2 = new Array[Float](Dim); o2(7) = 1.25f; o2(3) = 0.125f
      emitMirrored(-1, o1)
      emitMirrored(-1, o2)
      buf.toSeq
    }

    // ---- discharge assertions --------------------------------------
    rows.groupBy(_._1).foreach { case (g, grp0) =>
      // labelPerKey sorts by the item STRING before clustering — replicate
      val grp = grp0.sortBy(_._2.toString)
      val raw = grp.map(_._4).toArray
      val tags = grp.map(_._3).toArray
      val n = raw.length

      // (1) dyadic support + exact-zero mean
      raw.foreach { v =>
        require(v.length == Dim)
        (SubDim until Dim).foreach(j => require(v(j) == 0f,
          s"group $g: coordinate $j outside the 8-dim support is nonzero"))
        v.foreach(x => require((x * 1024f) == math.round(x * 1024f).toFloat,
          s"group $g: coordinate $x is not a multiple of 1/1024"))
      }
      (0 until Dim).foreach { j =>
        val sum = raw.foldLeft(0.0)((acc, v) => acc + v(j))
        require(sum == 0.0, s"group $g dim $j: mean is not exactly zero ($sum)")
      }

      // (2) isometry of the engine's reduction (including its toFloat cast)
      val reduced = LocalPca.reduce(raw, SubDim).map(_.map(_.toFloat))
      var maxDelta = 0.0
      for (i <- 0 until n; j <- (i + 1) until n) {
        val d0 = cosDist(raw(i), raw(j))
        val d1 = cosDist(reduced(i), reduced(j))
        maxDelta = math.max(maxDelta, math.abs(d0 - d1))
      }
      require(maxDelta < 1e-5,
        s"group $g: PCA is not an isometry on this data (max |Δdist| = $maxDelta)")

      // (3) ε-cut degeneracy margins in the raw metric
      val byTag = tags.zipWithIndex.groupBy(_._1)
      val blobs = byTag.filter(_._1 >= 0).values.map(_.map(_._2)).toSeq
      require(blobs.size >= 2, s"group $g: needs ≥ 2 blobs")
      blobs.foreach(b => require(b.length >= 6, s"group $g: blob size ${b.length} < 6"))
      var inBlobMax = 0.0
      var crossMin = Double.MaxValue
      for (i <- 0 until n; j <- (i + 1) until n) {
        val d = cosDist(raw(i), raw(j))
        if (tags(i) == tags(j) && tags(i) >= 0) inBlobMax = math.max(inBlobMax, d)
        else crossMin = math.min(crossMin, d)
      }
      require(inBlobMax < 1e-4, s"group $g: in-blob distance $inBlobMax too large")
      require(crossMin > 0.5, s"group $g: cross distance $crossMin too small vs ε")

      // (4) the actual engine path equals the raw-distance ε-cut, with the
      // oracle's numbering (clusters of size ≥ 5 labeled by smallest ord)
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      for (i <- 0 until n; j <- (i + 1) until n)
        if (cosDist(raw(i), raw(j)) <= Eps) {
          val (ri, rj) = (find(i), find(j))
          if (ri != rj) parent(math.max(ri, rj)) = math.min(ri, rj)
        }
      val comps = (0 until n).groupBy(find)
      val bigRoots = comps.filter(_._2.size >= 5).keys.toSeq.sorted
      val lblOf = bigRoots.zipWithIndex.toMap
      val expect = (0 until n).map(i => lblOf.getOrElse(find(i), -1)).toArray
      val got = Hdbscan.labels(reduced, minClusterSize = 5, minSamples = 5,
        clusterSelectionEpsilon = Eps)
      require(java.util.Arrays.equals(got, expect),
        s"group $g: engine PCA→HDBSCAN labels differ from the raw ε-cut\n" +
          s"  got:    ${got.mkString(",")}\n  expect: ${expect.mkString(",")}")
      println(s"[gen-pca-fixture] group $g: n=$n blobs=${blobs.size} " +
        f"isometryΔ=$maxDelta%.2e inBlobMax=$inBlobMax%.2e crossMin=$crossMin%.3f OK")
    }

    // ---- write ------------------------------------------------------
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    rows.map { case (g, pid, _, v) => (g, pid, v.toSeq) }
      .toDF("group_id", "point_id", "embedding")
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/points.parquet")
    println(s"[gen-pca-fixture] wrote ${rows.length} points to $outDir/points.parquet")
    spark.stop()
  }
}
