package graft.cluster

/** Per-group dimensionality reduction (SURVEY §2.9 op 58): the reference
  * UMAP-reduces each user's interest embeddings before clustering
  * (assets/old_history.py:157-161, n_components=100, metric=cosine).
  * There is no Spark-native UMAP; the blueprint decision is per-user local
  * reduction inside `flatMapGroups` — semantics preserved per user,
  * parallelism across users — with PCA as the documented substitute
  * (deterministic, dependency-free).
  *
  * Implementation: covariance PCA via power iteration with deflation.
  * Deterministic start vectors (basis-aligned, index-seeded), fixed
  * iteration budget, stable sign convention (largest-|coord| positive) —
  * no RNG, identical output across partitionings and JVMs.
  */
object LocalPca {

  /** Project `vecs` (n × d) onto the top `k` principal components.
    * Returns n × min(k, d) double rows. */
  def reduce(vecs: Array[Array[Float]], k: Int, iterations: Int = 50): Array[Array[Double]] = {
    val n = vecs.length
    if (n == 0) return Array.empty
    val d = vecs(0).length
    val kk = math.min(k, d)

    // center
    val mean = new Array[Double](d)
    vecs.foreach { v => var j = 0; while (j < d) { mean(j) += v(j); j += 1 } }
    var j = 0
    while (j < d) { mean(j) /= n; j += 1 }
    val x = Array.tabulate(n, d)((i, jj) => vecs(i)(jj) - mean(jj))

    // covariance (d × d) — d is the embedding dim (small); n can be large
    val cov = Array.ofDim[Double](d, d)
    var i = 0
    while (i < n) {
      val row = x(i)
      var a = 0
      while (a < d) {
        val ra = row(a)
        if (ra != 0.0) {
          var b = a
          while (b < d) { cov(a)(b) += ra * row(b); b += 1 }
        }
        a += 1
      }
      i += 1
    }
    var a = 0
    while (a < d) {
      var b = a
      while (b < d) { cov(a)(b) /= n; cov(b)(a) = cov(a)(b); b += 1 }
      a += 1
    }

    // power iteration + deflation for top-k eigenvectors
    val comps = Array.ofDim[Double](kk, d)
    val work = cov.map(_.clone())
    var c = 0
    while (c < kk) {
      val v = new Array[Double](d)
      v(c % d) = 1.0 // deterministic start
      var it = 0
      while (it < iterations) {
        val nv = new Array[Double](d)
        var p = 0
        while (p < d) {
          val wp = work(p)
          var q = 0
          var acc = 0.0
          while (q < d) { acc += wp(q) * v(q); q += 1 }
          nv(p) = acc
          p += 1
        }
        val norm = math.sqrt(nv.map(t => t * t).sum)
        if (norm < 1e-12) { it = iterations } // null space — keep previous v
        else { var p2 = 0; while (p2 < d) { v(p2) = nv(p2) / norm; p2 += 1 }; it += 1 }
      }
      // stable sign: largest-|coordinate| is positive
      val mx = v.indices.maxBy(p => math.abs(v(p)))
      if (v(mx) < 0) { var p = 0; while (p < d) { v(p) = -v(p); p += 1 } }
      comps(c) = v
      // deflate: work -= λ v vᵀ
      var lambda = 0.0
      var p = 0
      while (p < d) {
        var q = 0
        var acc = 0.0
        while (q < d) { acc += cov(p)(q) * v(q); q += 1 }
        lambda += v(p) * acc
        p += 1
      }
      p = 0
      while (p < d) {
        var q = 0
        while (q < d) { work(p)(q) -= lambda * v(p) * v(q); q += 1 }
        p += 1
      }
      c += 1
    }

    // project
    Array.tabulate(n, kk)((r, cc) => {
      var acc = 0.0
      var p = 0
      while (p < d) { acc += x(r)(p) * comps(cc)(p); p += 1 }
      acc
    })
  }
}
