package graft.cluster

import org.scalatest.funsuite.AnyFunSuite

/** LocalUmap (SURVEY §2.9 op 58 — the reference's per-user
  * `cuml.UMAP(n_neighbors=15, min_dist=0.1, metric="cosine")` reduction,
  * assets/old_history.py:157-161). UMAP layouts have no closed-form
  * oracle, so the spec pins the properties the downstream clusterer
  * actually relies on: determinism, shape, locality preservation, and
  * cluster-structure preservation through the full reduce→cluster path. */
class LocalUmapSpec extends AnyFunSuite {

  /** `nBlobs` directions in `d` dims, `per` points each, ±`noise` jitter —
    * blob directions are axis-aligned so cosine separation is maximal. */
  private def blobs(nBlobs: Int, per: Int, d: Int, noise: Double, seed: Long)
      : (Array[Array[Float]], Array[Int]) = {
    val rng = new java.util.Random(seed)
    val pts = Array.newBuilder[Array[Float]]
    val lbl = Array.newBuilder[Int]
    for (b <- 0 until nBlobs; _ <- 0 until per) {
      val v = new Array[Float](d)
      v(b) = 1f
      for (j <- 0 until d) v(j) = (v(j) + noise * (rng.nextDouble() - 0.5)).toFloat
      pts += v
      lbl += b
    }
    (pts.result(), lbl.result())
  }

  test("deterministic: identical layouts across repeated runs") {
    val (pts, _) = blobs(3, 20, 16, 0.1, seed = 7)
    val a = LocalUmap.reduce(pts, 4)
    val b = LocalUmap.reduce(pts.map(_.clone()), 4)
    assert(a.length == b.length)
    a.indices.foreach(i => assert(a(i).sameElements(b(i)), s"row $i differs"))
  }

  test("shape and edge cases") {
    assert(LocalUmap.reduce(Array.empty, 4).isEmpty)
    val single = LocalUmap.reduce(Array(Array(1f, 2f)), 4)
    assert(single.length == 1 && single(0).length == 4)
    // n-1 < nNeighbors: k clamps, still returns a full layout
    val (tiny, _) = blobs(2, 4, 8, 0.05, seed = 1)
    val out = LocalUmap.reduce(tiny, 3)
    assert(out.length == 8 && out.forall(_.length == 3))
    assert(out.forall(_.forall(v => !v.isNaN && !v.isInfinite)))
  }

  test("pads layout dims beyond the input rank (reference n_components=100 > d)") {
    val (pts, _) = blobs(2, 12, 8, 0.05, seed = 3)
    val out = LocalUmap.reduce(pts, 12)
    assert(out.forall(_.length == 12))
    assert(out.forall(_.forall(v => !v.isNaN && !v.isInfinite)))
  }

  test("locality: embedded nearest neighbor stays in the original blob") {
    val (pts, lbl) = blobs(4, 25, 32, 0.15, seed = 11)
    val y = LocalUmap.reduce(pts, 8)
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    val preserved = y.indices.count { i =>
      val nn = y.indices.filter(_ != i).minBy(j => d2(y(i), y(j)))
      lbl(nn) == lbl(i)
    }
    // the attract/repel layout must keep ~all nearest neighbors in-blob
    // (random projection would score ~1/nBlobs = 25%)
    assert(preserved >= (y.length * 0.95).toInt,
      s"only $preserved/${y.length} embedded NNs stay in-blob")
  }

  test("separation: inter-blob gaps dominate intra-blob spread in the layout") {
    val (pts, lbl) = blobs(3, 20, 16, 0.1, seed = 13)
    val y = LocalUmap.reduce(pts, 4)
    def dist(a: Array[Double], b: Array[Double]): Double =
      math.sqrt(a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum)
    val centroid = (0 until 3).map { b =>
      val rows = y.indices.filter(lbl(_) == b).map(y)
      Array.tabulate(4)(c => rows.map(_(c)).sum / rows.size)
    }
    val intra = y.indices.map(i => dist(y(i), centroid(lbl(i)))).max
    val inter = (for (a <- 0 until 3; b <- a + 1 until 3)
      yield dist(centroid(a), centroid(b))).min
    assert(inter > intra,
      f"blob centroids $inter%.3f apart vs max intra spread $intra%.3f")
  }

  test("reduce→cluster preserves the blob partition (the reference's full shape)") {
    val (pts, lbl) = blobs(3, 20, 16, 0.1, seed = 17)
    val y = LocalUmap.reduce(pts, 4).map(_.map(_.toFloat))
    // the reference clusters the REDUCED vectors under the cosine metric
    // (pairwise_distances(reduced, metric="cosine"), old_history.py:168)
    val got = LocalCluster.clusterVectors(y, eps = 0.2, minClusterSize = 5)
    assert(got.forall(_ >= 0), s"unexpected noise points: ${got.toSeq}")
    // same partition up to label renaming
    val mapping = collection.mutable.HashMap.empty[Int, Int]
    lbl.indices.foreach { i =>
      mapping.get(got(i)) match {
        case Some(expect) => assert(expect == lbl(i),
          s"row $i: cluster ${got(i)} spans blobs $expect and ${lbl(i)}")
        case None => mapping.update(got(i), lbl(i))
      }
    }
    assert(mapping.size == 3, s"expected 3 clusters, got ${mapping.size}")
  }
}
