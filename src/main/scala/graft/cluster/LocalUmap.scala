package graft.cluster

/** Per-group UMAP dimensionality reduction (SURVEY §2.9 op 58): the
  * reference reduces each user's interest embeddings with
  * `cuml.UMAP(n_neighbors=15, n_components=100, min_dist=0.1,
  * metric="cosine")` before clustering (assets/old_history.py:157-161).
  * Groups are per-user and small (row-limited upstream), so the blueprint
  * decision is the same as LocalPca's: run the REAL algorithm locally
  * inside `flatMapGroups` — semantics per user, parallelism across users.
  *
  * This is the algorithm from the public UMAP paper (McInnes, Healy &
  * Melville, arXiv:1802.03426) as implemented by the reference's library:
  *   1. exact k-NN under the cosine metric;
  *   2. fuzzy simplicial set: per-point ρᵢ (distance to nearest neighbor)
  *      and σᵢ solved by binary search so Σⱼ exp(−max(0, dᵢⱼ−ρᵢ)/σᵢ) =
  *      log₂(k); directed weights symmetrized with the probabilistic
  *      t-conorm W ∪ Wᵀ = W + Wᵀ − W∘Wᵀ;
  *   3. layout by per-edge-sampled SGD on the cross-entropy surrogate:
  *      attractive gradient −2ab·d²⁽ᵇ⁻¹⁾/(1+a·d²ᵇ) along sampled edges,
  *      repulsive 2b/((0.001+d²)(1+a·d²ᵇ)) against uniform negative
  *      samples (rate 5), per-dimension clipped to ±4, learning rate
  *      decaying linearly from 1; (a, b) is the curve fit of
  *      (1+a·d²ᵇ)⁻¹ ≈ the min_dist=0.1/spread=1.0 offset-exponential.
  *
  * Deviations, both deterministic-by-design (the whole suite's contract —
  * identical output across partitionings and JVMs):
  *   - init is scaled PCA (the library's `init="pca"` option;
  *     deterministic) instead of the spectral default;
  *   - the RNG driving edge/negative sampling is a fixed-seed
  *     `java.util.Random` and the SGD is sequential per group, so layouts
  *     are reproducible (the library needs `random_state` for the same).
  */
object LocalUmap {

  // curve fit of 1/(1+a·x^(2b)) to exp(-(x-min_dist)/spread) for
  // min_dist=0.1, spread=1.0 — the library's find_ab_params output for the
  // reference's parameters, fixed here so no SciPy-style fitter is needed
  private val A = 1.5769434603113077
  private val B = 0.8950608781634792

  private val NegativeSampleRate = 5
  private val InitialAlpha = 1.0
  private val ClipVal = 4.0

  /** Embed `vecs` (n × d, cosine metric) into `nComponents` dimensions.
    * `nEpochs < 0` selects the library default (500 for n ≤ 10000, else
    * 200). Returns n × nComponents double rows. */
  def reduce(vecs: Array[Array[Float]], nComponents: Int,
      nNeighbors: Int = 15, nEpochs: Int = -1,
      seed: Long = 0x5ca1ab1eL): Array[Array[Double]] = {
    val n = vecs.length
    if (n == 0) return Array.empty
    if (n == 1) return Array(new Array[Double](nComponents))
    val k = math.min(nNeighbors, n - 1)
    val epochs = if (nEpochs >= 0) nEpochs else if (n <= 10000) 500 else 200

    // 1. exact k-NN (cosine); groups are row-limited upstream, so the n²
    // local pass is the honest cost of exact neighbors (the library's NN
    // descent is an approximation of exactly this)
    val dist = Array.ofDim[Double](n, n)
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val d = LocalCluster.cosineDistance(vecs(i), vecs(j))
        dist(i)(j) = d; dist(j)(i) = d
        j += 1
      }
      i += 1
    }
    val knn = Array.tabulate(n) { r =>
      (0 until n).filter(_ != r).sortBy(c => (dist(r)(c), c)).take(k).toArray
    }

    // 2. smooth-kNN calibration: ρ = nearest nonzero distance;
    // σ solved to hit log₂(k) total membership (64-step bisection)
    val target = math.log(k) / math.log(2.0)
    val rho = new Array[Double](n)
    val sigma = new Array[Double](n)
    i = 0
    while (i < n) {
      val ds = knn(i).map(dist(i))
      val nonzero = ds.filter(_ > 0.0)
      rho(i) = if (nonzero.nonEmpty) nonzero.min else 0.0
      var lo = 0.0
      var hi = Double.PositiveInfinity
      var mid = 1.0
      var it = 0
      while (it < 64) {
        var psum = 0.0
        var q = 0
        while (q < ds.length) {
          val dd = ds(q) - rho(i)
          psum += (if (dd > 0) math.exp(-dd / mid) else 1.0)
          q += 1
        }
        if (math.abs(psum - target) < 1e-5) it = 64
        else {
          if (psum > target) { hi = mid; mid = (lo + hi) / 2.0 }
          else {
            lo = mid
            mid = if (hi.isPosInfinity) mid * 2 else (lo + hi) / 2.0
          }
          it += 1
        }
      }
      // the library's MIN_K_DIST_SCALE floor keeps σ from collapsing on
      // near-duplicate neighborhoods
      val meanD = ds.sum / ds.length
      if (rho(i) > 0.0) sigma(i) = math.max(mid, 1e-3 * meanD)
      else sigma(i) = math.max(mid, 1e-3 * (dist(i).sum / (n - 1)))
      i += 1
    }

    // directed memberships → probabilistic t-conorm symmetrization
    val w = collection.mutable.HashMap.empty[Long, Double]
    i = 0
    while (i < n) {
      knn(i).foreach { j =>
        val dd = dist(i)(j) - rho(i)
        val v = if (dd <= 0) 1.0 else math.exp(-dd / sigma(i))
        w.update(i.toLong * n + j, v)
      }
      i += 1
    }
    val sym = collection.mutable.HashMap.empty[Long, Double]
    w.foreach { case (key, v) =>
      val (a0, b0) = ((key / n).toInt, (key % n).toInt)
      val vt = w.getOrElse(b0.toLong * n + a0, 0.0)
      if (a0 < b0) sym.update(key, v + vt - v * vt)
      else if (!w.contains(b0.toLong * n + a0)) sym.update(b0.toLong * n + a0, v)
    }

    // 3. edge arrays with per-edge sampling cadence (stronger edges are
    // sampled proportionally more often); weights below max/epochs never
    // fire and are dropped, as in the library
    val maxW = if (sym.isEmpty) 1.0 else sym.valuesIterator.max
    val kept = sym.iterator.filter(_._2 >= maxW / epochs).toArray
      .sortBy(_._1) // deterministic edge order
    val m = kept.length
    val head = new Array[Int](m)
    val tail = new Array[Int](m)
    val epochsPerSample = new Array[Double](m)
    var e = 0
    while (e < m) {
      head(e) = (kept(e)._1 / n).toInt
      tail(e) = (kept(e)._1 % n).toInt
      epochsPerSample(e) = maxW / kept(e)._2
      e += 1
    }

    // scaled deterministic PCA init (the library's init="pca": project,
    // then scale the layout so max |coord| = 10)
    val dim = nComponents
    val pcaK = math.min(dim, vecs(0).length)
    val pca = LocalPca.reduce(vecs, pcaK)
    val y = Array.tabulate(n, dim)((r, c) => if (c < pcaK) pca(r)(c) else 0.0)
    var maxAbs = 0.0
    y.foreach(_.foreach(v => maxAbs = math.max(maxAbs, math.abs(v))))
    if (maxAbs > 0) {
      val s = 10.0 / maxAbs
      i = 0
      while (i < n) {
        var c = 0
        while (c < dim) { y(i)(c) *= s; c += 1 }
        i += 1
      }
    }

    // SGD layout
    val rng = new java.util.Random(seed)
    val nextSample = epochsPerSample.clone()
    val epochsPerNeg = epochsPerSample.map(_ / NegativeSampleRate)
    val nextNeg = epochsPerNeg.clone()
    var epoch = 1
    while (epoch <= epochs) {
      val alpha = InitialAlpha * (1.0 - (epoch - 1).toDouble / epochs)
      e = 0
      while (e < m) {
        if (nextSample(e) <= epoch) {
          val p = y(head(e)); val q = y(tail(e))
          var d2 = 0.0
          var c = 0
          while (c < dim) { val t = p(c) - q(c); d2 += t * t; c += 1 }
          val gc =
            if (d2 > 0.0) -2.0 * A * B * math.pow(d2, B - 1.0) / (A * math.pow(d2, B) + 1.0)
            else 0.0
          c = 0
          while (c < dim) {
            val g = clip(gc * (p(c) - q(c)))
            p(c) += g * alpha
            q(c) -= g * alpha // move_other: fit_transform adjusts both ends
            c += 1
          }
          nextSample(e) += epochsPerSample(e)

          val nNeg = ((epoch - nextNeg(e)) / epochsPerNeg(e)).toInt
          var s = 0
          while (s < nNeg) {
            val o = rng.nextInt(n)
            if (o != head(e)) {
              val r = y(o)
              var nd2 = 0.0
              c = 0
              while (c < dim) { val t = p(c) - r(c); nd2 += t * t; c += 1 }
              val ngc =
                if (nd2 > 0.0) 2.0 * B / ((0.001 + nd2) * (A * math.pow(nd2, B) + 1.0))
                else 0.0
              c = 0
              while (c < dim) {
                val g = if (ngc > 0.0) clip(ngc * (p(c) - r(c))) else ClipVal
                p(c) += g * alpha
                c += 1
              }
            }
            s += 1
          }
          nextNeg(e) += nNeg * epochsPerNeg(e)
        }
        e += 1
      }
      epoch += 1
    }
    y
  }

  private def clip(v: Double): Double =
    if (v > ClipVal) ClipVal else if (v < -ClipVal) -ClipVal else v
}
