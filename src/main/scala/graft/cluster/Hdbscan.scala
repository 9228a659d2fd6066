package graft.cluster

import scala.collection.mutable

/** HDBSCAN* — hierarchical density clustering with Excess-of-Mass cluster
  * selection and `cluster_selection_epsilon` (Campello/Moulavi/Sander 2013;
  * Malzer/Baum 2020) — the algorithm the reference runs per user
  * (`assets/old_history.py:169-176`: `HDBSCAN(min_cluster_size=5,
  * metric="precomputed", cluster_selection_epsilon=0.02)` over pairwise
  * cosine distances of UMAP-reduced embeddings).
  *
  * This is the TRUE hierarchy/stability algorithm, not the flat ε-cut that
  * [[LocalCluster.clusterVectors]] provides (that one remains as the
  * DBSCAN*-style `cluster_selection_epsilon`-only operator and the q54
  * oracle surface). The two genuinely disagree — see HdbscanSpec for
  * hand-derived fixtures pinning each divergence.
  *
  * Pipeline, exactly as published:
  *  1. core distance: distance to the `minSamples`-th nearest OTHER
  *     point — the convention of the hdbscan library's precomputed-metric
  *     path, which the reference runs (`np.partition(D, min_points)[:,
  *     min_points]` over a row that contains self at distance 0). Note
  *     `minSamples = 1` still degenerates mutual reachability to the raw
  *     distance: core(a) = min over others of d(a,·) ≤ d(a,b) for every b,
  *     so max(core(a), core(b), d(a,b)) = d(a,b);
  *  2. mutual reachability: mr(a,b) = max(core(a), core(b), d(a,b));
  *  3. MST of the implicit complete mr-graph (Prim, O(n²) — the kernel is
  *     per-group local; Spark parallelizes across groups);
  *  4. single-linkage dendrogram = MST edges merged in ascending order;
  *  5. condensed tree at `minClusterSize`: a split into two sides ≥ m
  *     births two child clusters; a smaller side "falls out" as points at
  *     that split's λ = 1/distance while the big side continues as the
  *     same cluster; both sides < m kills the cluster;
  *  6. stability(C) = Σ_children (λ_child − λ_birth(C)) × size_child over
  *     ALL condensed children (points and clusters);
  *  7. EOM selection bottom-up (root excluded = allow_single_cluster
  *     false): a node whose children's summed stability exceeds its own
  *     yields to them (and carries their sum upward); otherwise it is
  *     selected and its descendants are not;
  *  8. epsilon search (when `clusterSelectionEpsilon` > 0): a selected
  *     cluster born at distance < ε climbs to the first non-root ancestor
  *     born at ≥ ε (strictly, parent_eps > ε per the published code);
  *  9. labels: each point takes the first selected cluster on its
  *     condensed parent chain; reaching the root unselected = noise (−1).
  *     Peripheral points that fell out of a selected cluster at ANY
  *     density are members of that cluster (published default labelling,
  *     match_reference_implementation = False).
  *
  * Determinism: no RNG anywhere; ties in the MST and the edge sort are
  * broken by point ordinal; cluster labels are numbered 0..k−1 by each
  * cluster's smallest member ordinal (HDBSCAN label ids are arbitrary —
  * only the partition is semantic — so the engine pins a reproducible
  * numbering, same contract as LocalCluster).
  */
object Hdbscan {

  /** Labels for `vecs` under cosine distance. `minSamples <= 0` defaults to
    * `minClusterSize` (the published default). */
  def labels(vecs: Array[Array[Float]], minClusterSize: Int,
      minSamples: Int = 0, clusterSelectionEpsilon: Double = 0.0): Array[Int] =
    labelsFromDistance(vecs.length,
      (i, j) => LocalCluster.cosineDistance(vecs(i), vecs(j)),
      minClusterSize, minSamples, clusterSelectionEpsilon)

  /** Core algorithm over an arbitrary distance function (symmetric,
    * non-negative; it is evaluated O(n²) times and never materialized). */
  def labelsFromDistance(n: Int, dist: (Int, Int) => Double, minClusterSize: Int,
      minSamples: Int = 0, clusterSelectionEpsilon: Double = 0.0): Array[Int] = {
    require(minClusterSize >= 2, s"minClusterSize must be >= 2, got $minClusterSize")
    require(clusterSelectionEpsilon >= 0.0, "clusterSelectionEpsilon must be >= 0")
    val m = minClusterSize
    val k = if (minSamples <= 0) minClusterSize else minSamples
    if (n == 0) return Array.empty
    if (n < 2) return Array.fill(n)(-1)

    // -- 1. core distances: k-th nearest OTHER point (self is the 0th
    // neighbor — the reference library's precomputed-path indexing);
    // capped at the farthest other when the group is smaller than the
    // neighborhood.
    // k == 1 skips the pass: core(a) = min over others of d(a,·) never
    // exceeds d(a,b), so mr ≡ d whether cores are computed or left 0.
    val core = new Array[Double](n)
    if (k > 1) {
      val buf = new Array[Double](n - 1)
      var i = 0
      while (i < n) {
        var j = 0; var w = 0
        while (j < n) { if (j != i) { buf(w) = dist(i, j); w += 1 }; j += 1 }
        java.util.Arrays.sort(buf)
        core(i) = buf(math.min(k - 1, n - 2))
        i += 1
      }
    }
    @inline def mr(a: Int, b: Int): Double =
      math.max(math.max(core(a), core(b)), dist(a, b))

    // -- 2/3. Prim MST over the implicit complete mutual-reachability graph.
    val inTree = new Array[Boolean](n)
    val minW = Array.fill(n)(Double.PositiveInfinity)
    val minTo = Array.fill(n)(-1)
    val edgeW = new Array[Double](n - 1)
    val edgeU = new Array[Int](n - 1)
    val edgeV = new Array[Int](n - 1)
    var cur = 0
    inTree(0) = true
    var step = 0
    while (step < n - 1) {
      var j = 0
      while (j < n) {
        if (!inTree(j)) {
          val w = mr(cur, j)
          if (w < minW(j)) { minW(j) = w; minTo(j) = cur }
        }
        j += 1
      }
      var next = -1; var best = Double.PositiveInfinity
      j = 0
      while (j < n) {
        if (!inTree(j) && minW(j) < best) { best = minW(j); next = j }
        j += 1
      }
      edgeW(step) = minW(next); edgeU(step) = minTo(next); edgeV(step) = next
      inTree(next) = true; cur = next
      step += 1
    }

    // -- 4. single-linkage dendrogram: merge MST edges ascending (stable
    // sort keeps the deterministic Prim insertion order on ties). Dendro
    // nodes: 0..n-1 points, n..2n-2 internal merges.
    val order = (0 until (n - 1)).sortBy(edgeW)
    val dendroLeft = new Array[Int](n - 1)
    val dendroRight = new Array[Int](n - 1)
    val dendroDist = new Array[Double](n - 1)
    val dendroSize = new Array[Int](n - 1)
    val ufParent = Array.tabulate(2 * n - 1)(identity) // over dendro node ids
    def find(x: Int): Int = {
      var r = x
      while (ufParent(r) != r) r = ufParent(r)
      var c = x
      while (ufParent(c) != r) { val nx = ufParent(c); ufParent(c) = r; c = nx }
      r
    }
    var nextNode = n
    order.foreach { e =>
      val ru = find(edgeU(e)); val rv = find(edgeV(e))
      val idx = nextNode - n
      dendroLeft(idx) = ru; dendroRight(idx) = rv; dendroDist(idx) = edgeW(e)
      dendroSize(idx) = sizeOfNode(ru, n, dendroSize) + sizeOfNode(rv, n, dendroSize)
      ufParent(ru) = nextNode; ufParent(rv) = nextNode
      nextNode += 1
    }
    val root = 2 * n - 2

    // -- 5/6. condense + stability in one walk.
    // Cluster 0 = root. Per cluster: parent, birth λ, accumulated stability.
    val cParent = mutable.ArrayBuffer[Int](-1)
    val cBirth = mutable.ArrayBuffer[Double](0.0)
    val cStab = mutable.ArrayBuffer[Double](0.0)
    val cChildren = mutable.ArrayBuffer[List[Int]](Nil)
    val pointCluster = Array.fill(n)(0) // condensed parent cluster of each point
    def leavesUnder(node: Int)(f: Int => Unit): Unit = {
      val stack = mutable.Stack[Int](node)
      while (stack.nonEmpty) {
        val x = stack.pop()
        if (x < n) f(x)
        else { stack.push(dendroLeft(x - n)); stack.push(dendroRight(x - n)) }
      }
    }
    val work = mutable.Stack[(Int, Int)]((root, 0)) // (dendro node, cluster)
    while (work.nonEmpty) {
      val (start, c) = work.pop()
      var node = start
      var done = false
      while (!done) {
        val idx = node - n
        val l = dendroLeft(idx); val r = dendroRight(idx)
        val dd = dendroDist(idx)
        val lam = if (dd > 0) 1.0 / dd else Double.PositiveInfinity
        val ls = sizeOfNode(l, n, dendroSize)
        val rs = sizeOfNode(r, n, dendroSize)
        if (ls >= m && rs >= m) {
          // two new clusters born at this split
          Seq(l, r).foreach { side =>
            val nc = cParent.length
            cParent += c; cBirth += lam; cStab += 0.0; cChildren += Nil
            cChildren(c) = nc :: cChildren(c)
            work.push((side, nc))
          }
          cStab(c) += (lam - cBirth(c)) * (ls + rs)
          done = true
        } else if (ls < m && rs < m) {
          // cluster death: every remaining point falls out here
          leavesUnder(node) { p =>
            pointCluster(p) = c; cStab(c) += lam - cBirth(c)
          }
          done = true
        } else {
          // small side sheds its points; big side continues as cluster c
          val (big, small) = if (ls >= m) (l, r) else (r, l)
          leavesUnder(small) { p =>
            pointCluster(p) = c; cStab(c) += lam - cBirth(c)
          }
          node = big // big has >= m >= 2 points, so it is an internal node
        }
      }
    }
    val nClusters = cParent.length

    // -- 7. EOM selection, leaves upward, root never selectable.
    val isCluster = Array.fill(nClusters)(true)
    isCluster(0) = false
    val stab = cStab.toArray
    def strictDescendants(c: Int): Iterator[Int] = {
      val out = mutable.ArrayBuffer[Int]()
      val stack = mutable.Stack[Int]()
      cChildren(c).foreach(stack.push)
      while (stack.nonEmpty) {
        val x = stack.pop(); out += x; cChildren(x).foreach(stack.push)
      }
      out.iterator
    }
    var c = nClusters - 1
    while (c >= 1) {
      val subStab = cChildren(c).iterator.map(stab).sum
      if (cChildren(c).nonEmpty && subStab > stab(c)) {
        isCluster(c) = false
        stab(c) = subStab
      } else {
        strictDescendants(c).foreach(isCluster(_) = false)
      }
      c -= 1
    }

    // -- 8. epsilon search (Malzer/Baum): merge too-fine selections upward.
    if (clusterSelectionEpsilon > 0.0) {
      val eom = (1 until nClusters).filter(isCluster)
      val chosen = mutable.Set[Int]()
      val processed = mutable.Set[Int]()
      def climb(x: Int): Int = {
        val p = cParent(x)
        if (p == 0) x // next is root: stop below it (allow_single_cluster=false)
        else if (1.0 / cBirth(p) > clusterSelectionEpsilon) p
        else climb(p)
      }
      eom.foreach { leaf =>
        val eps = 1.0 / cBirth(leaf) // birth distance of the cluster
        if (eps < clusterSelectionEpsilon) {
          if (!processed(leaf)) {
            val target = climb(leaf)
            chosen += target
            processed += target
            strictDescendants(target).foreach(processed += _)
          }
        } else chosen += leaf
      }
      java.util.Arrays.fill(isCluster, false)
      chosen.foreach(isCluster(_) = true)
    }

    // -- 9. labels: first selected ancestor of each point's condensed chain.
    val raw = new Array[Int](n)
    var p = 0
    while (p < n) {
      var x = pointCluster(p)
      while (x > 0 && !isCluster(x)) x = cParent(x)
      raw(p) = if (x > 0 && isCluster(x)) x else -1
      p += 1
    }
    // deterministic numbering by smallest member ordinal
    val byMin = raw.zipWithIndex.collect { case (cl, i) if cl >= 0 => (cl, i) }
      .groupBy(_._1).map { case (cl, ms) => cl -> ms.map(_._2).min }
      .toSeq.sortBy(_._2).map(_._1).zipWithIndex.toMap
    raw.map(cl => if (cl < 0) -1 else byMin(cl))
  }

  @inline private def sizeOfNode(node: Int, n: Int, dendroSize: Array[Int]): Int =
    if (node < n) 1 else dendroSize(node - n)
}
