package graft.tools

import org.apache.spark.sql.SparkSession

/** One-shot generator for the committed clustering fixture
  * (`fixtures/clusters/points.parquet`): per-group unit-circle point sets
  * CONSTRUCTED so that true HDBSCAN (minClusterSize=5, minSamples=1, any
  * cluster_selection_epsilon below the blob-merge distances) provably
  * equals the flat ε-cut at ε=0.01 — which a recursive-CTE DuckDB oracle
  * can replay (q104). The construction discharges every way the two
  * algorithms can differ:
  *
  *  - blobs are TIGHT (adjacent angle 0.002 rad → cosine distance ≈ 2e-6)
  *    and ≥ 6 points, so leaf stabilities (~size/2e-6) dwarf every parent's
  *    (λ-range ~10 × size) and Excess-of-Mass always selects the blobs,
  *    never a merged ancestor;
  *  - blob-merge distances (0.118 / 0.166 / 0.225 — distinct, no dendrogram
  *    ties) all exceed ε, so the ε-cut components are exactly the blobs and
  *    the epsilon search never climbs (births > ε);
  *  - every group has ≥ 2 blobs, so selectable clusters exist (a single
  *    blob would be HDBSCAN all-noise but an ε-cut cluster);
  *  - outliers sit ≥ 1.1 rad past the last blob (distance ≥ 0.626), FARTHER
  *    than the largest blob merge, so they fall out of the ROOT cluster —
  *    which is never selectable — and are noise under both algorithms;
  *    outliers closer to each other than to the blobs (0.30) only form
  *    sub-minClusterSize groups (≤ 3), noise under both. Had an outlier
  *    attached BELOW a selected cluster's birth it would be an HDBSCAN
  *    member but ε-cut noise (the published fell-out-point membership
  *    semantics, HdbscanSpec fixture 1) — the geometry forbids that.
  *
  * The same fixture is ALSO ε-cut-degenerate at `minSamples = 5` (q105,
  * which hash-checks the k-NN core-distance kernel that minSamples=1
  * bypasses): blobs have ≥ 6 points, so every member's 5th nearest OTHER
  * point is in-blob (≤ 0.010 rad → core ≤ 5.0e-5 ≪ ε = 0.01) and in-blob
  * mutual-reachability edges stay below ε, while every inter-blob and
  * outlier distance (≥ 0.1177) dominates all blob cores — the dendrogram
  * at and above blob level is identical to the minSamples=1 one, leaf
  * stabilities (~size/5e-5) still dwarf parents' (~size×4), and outlier
  * cores only grow. Both parameterizations provably equal the same raw-
  * distance ε-cut the DuckDB oracle replays.
  *
  * Run once; output committed. Deterministic — no RNG, pure angle
  * arithmetic.
  */
object GenClusterFixture {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("fixtures/clusters")
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val blobBases = Array(0.0, 0.5, 1.1, 1.8)
    val outlierBases = Array(3.0, 3.8, 4.6)
    val rows = (0L until 4L).flatMap { g =>
      val nBlobs = 2 + (g % 3).toInt   // 2..4 per group
      val nOutliers = 1 + (g % 3).toInt // 1..3 per group
      var pid = 0L
      def point(theta: Double): (Long, Long, Seq[Float]) = {
        val p = (g, pid, Seq(math.cos(theta).toFloat, math.sin(theta).toFloat))
        pid += 1
        p
      }
      val blobs = (0 until nBlobs).flatMap { b =>
        val size = 6 + ((g + b) % 3).toInt // 6..8 ≥ minClusterSize
        (0 until size).map(i => point(blobBases(b) + i * 0.002))
      }
      val outliers = (0 until nOutliers).map(o => point(outlierBases(o)))
      blobs ++ outliers
    }
    import spark.implicits._
    rows.toDF("group_id", "point_id", "embedding")
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/points.parquet")
    println(s"[gen-cluster-fixture] wrote ${rows.length} points to $outDir/points.parquet")
    spark.stop()
  }
}
