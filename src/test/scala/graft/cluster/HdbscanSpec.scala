package graft.cluster

import org.scalatest.funsuite.AnyFunSuite

/** Golden fixtures for the TRUE HDBSCAN kernel, each hand-derived from the
  * published algorithm (Campello/Moulavi/Sander 2013 condensed-tree +
  * Excess-of-Mass; Malzer/Baum 2020 cluster_selection_epsilon; sklearn/
  * hdbscan-library labelling with match_reference_implementation=False and
  * allow_single_cluster=False). 1-D line fixtures make every dendrogram
  * level, stability sum and EOM comparison checkable by hand — the
  * derivations are written out at each fixture.
  *
  * The spec also pins the cases where HDBSCAN-stability and the flat
  * ε-single-linkage cut ([[LocalCluster.clusterVectors]], q54's oracle
  * surface) genuinely DISAGREE — the reason both operators exist.
  */
class HdbscanSpec extends AnyFunSuite {

  /** 1-D points under |x−y| — a metric whose single-linkage structure is
    * just the sorted gap sequence. */
  private def line(xs: Double*): (Int, (Int, Int) => Double) =
    (xs.length, (i: Int, j: Int) => math.abs(xs(i) - xs(j)))

  // ---------------------------------------------------------------------
  // Fixture 1: two tight blobs + one far outlier.
  //
  // A = {0, .01, .02, .03, .04, .05}, B = {1.00 .. 1.05}, o = 3.0.
  // Single linkage: A and B each merge at gaps of 0.01; A∪B at 0.95;
  // o joins last at 1.95. Condensed tree (m=5), top-down:
  //   root(13) splits at 1.95 into sizes (12, 1) → o falls out of the ROOT
  //   cluster; root continues; next split 0.95 is (6, 6) → clusters C1=A,
  //   C2=B are born. EOM: C1, C2 are leaves → selected; root is never
  //   selectable (allow_single_cluster=False). Labels: A→0, B→1, o→noise.
  //
  // ε-single-linkage at eps=1.96 disagrees: every point (o included) is one
  // connected component of 13 ≥ 5 → a single cluster, NO noise.
  // ---------------------------------------------------------------------
  test("two blobs + outlier: outlier is noise; eps-linkage disagrees") {
    val xs = Seq(0.0, 0.01, 0.02, 0.03, 0.04, 0.05,
      1.00, 1.01, 1.02, 1.03, 1.04, 1.05, 3.0)
    val (n, d) = line(xs: _*)
    val got = Hdbscan.labelsFromDistance(n, d, minClusterSize = 5, minSamples = 1)
    assert(got.toSeq === (Seq.fill(6)(0) ++ Seq.fill(6)(1) :+ -1))

    // flat ε-cut over the same metric: one giant component, no noise
    val eps = Array.tabulate(n)(i => Array.tabulate(n)(j => d(i, j)))
    val flat = epsLinkage(eps, 1.96, minClusterSize = 5)
    assert(flat.toSeq === Seq.fill(13)(0))
  }

  // ---------------------------------------------------------------------
  // Fixture 2: EOM prefers the PARENT when children are short-lived.
  //
  // P1 = loose blobs C = {0, .20, .41, .63, .86} (gaps .20 .21 .22 .23) and
  // D = C + 1.11 (same gaps), C–D gap 0.25. P2 = P1 + 4.0. Root gap 2.03.
  //
  // Condensed tree: root → (P1, P2) born λ=1/2.03; P1 → (C, D) born λ=4.
  // C top-down: split .23 sheds 1 point (λ=1/.23), split .22 is (3,1) both
  // < 5 → C dies, 4 points at λ=1/.22. So
  //   stab(C) = (1/.23 − 4) + 4·(1/.22 − 4) = 0.3478 + 2.1818 = 2.5296
  //   stab(P1) = (4 − 1/2.03)·10 = 35.074  >  stab(C)+stab(D) = 5.059
  // → P1 absorbs its children (EOM), same for P2: TWO clusters of 10.
  //
  // ε-single-linkage at eps=0.24 disagrees: C's internal gaps ≤ .23 but the
  // C–D gap .25 > .24 → FOUR clusters of 5.
  // ---------------------------------------------------------------------
  test("loose sub-blobs: EOM selects the parent; eps-linkage splits it") {
    val c = Seq(0.0, 0.20, 0.41, 0.63, 0.86)
    val xs = c ++ c.map(_ + 1.11) ++ c.map(_ + 4.0) ++ c.map(_ + 5.11)
    val (n, d) = line(xs: _*)
    val got = Hdbscan.labelsFromDistance(n, d, minClusterSize = 5, minSamples = 1)
    assert(got.toSeq === (Seq.fill(10)(0) ++ Seq.fill(10)(1)))

    val eps = Array.tabulate(n)(i => Array.tabulate(n)(j => d(i, j)))
    val flat = epsLinkage(eps, 0.24, minClusterSize = 5)
    assert(flat.toSeq === (Seq.fill(5)(0) ++ Seq.fill(5)(1) ++ Seq.fill(5)(2) ++ Seq.fill(5)(3)))
  }

  // ---------------------------------------------------------------------
  // Fixture 3: EOM prefers the CHILDREN when they are long-lived.
  //
  // Same topology, TIGHT blobs: C = {0, .01, .02, .03, .04}, D = C + .29
  // (C–D gap .25), P2 = P1 + 4.0 (root gap 3.67).
  //   stab(C) = 5·(1/.01 − 4) = 480 per blob
  //   stab(P1) = (4 − 1/3.67)·10 = 37.3  <  480 + 480
  // → children win: FOUR clusters, matching the ε-cut at 0.1 this time.
  // ---------------------------------------------------------------------
  test("tight sub-blobs: EOM selects the children") {
    val c = Seq(0.0, 0.01, 0.02, 0.03, 0.04)
    val xs = c ++ c.map(_ + 0.29) ++ c.map(_ + 4.0) ++ c.map(_ + 4.29)
    val (n, d) = line(xs: _*)
    val got = Hdbscan.labelsFromDistance(n, d, minClusterSize = 5, minSamples = 1)
    assert(got.toSeq === (Seq.fill(5)(0) ++ Seq.fill(5)(1) ++ Seq.fill(5)(2) ++ Seq.fill(5)(3)))
  }

  // ---------------------------------------------------------------------
  // Fixture 4: cluster_selection_epsilon merges too-fine selections up.
  //
  // Fixture-3 data. EOM alone selects C, D, E, F (born at distance .25).
  // With ε=0.5: birth .25 < .5 → climb to the first non-root ancestor born
  // at ≥ .5: P1 (born 3.67) → {P1, P2}. With ε=0.1: .25 ≥ .1 → unchanged.
  // ---------------------------------------------------------------------
  test("cluster_selection_epsilon climbs to epsilon-wide ancestors") {
    val c = Seq(0.0, 0.01, 0.02, 0.03, 0.04)
    val xs = c ++ c.map(_ + 0.29) ++ c.map(_ + 4.0) ++ c.map(_ + 4.29)
    val (n, d) = line(xs: _*)
    val merged = Hdbscan.labelsFromDistance(n, d, minClusterSize = 5,
      minSamples = 1, clusterSelectionEpsilon = 0.5)
    assert(merged.toSeq === (Seq.fill(10)(0) ++ Seq.fill(10)(1)))
    val kept = Hdbscan.labelsFromDistance(n, d, minClusterSize = 5,
      minSamples = 1, clusterSelectionEpsilon = 0.1)
    assert(kept.toSeq === (Seq.fill(5)(0) ++ Seq.fill(5)(1) ++ Seq.fill(5)(2) ++ Seq.fill(5)(3)))
  }

  // ---------------------------------------------------------------------
  // Fixture 5: minSamples (core = distance to the minSamples-th nearest
  // OTHER point, the hdbscan library's precomputed-path convention) flips
  // the outcome by deflating in-blob density.
  //
  // Blobs with gaps 0.05: C = {0, .05, .10, .15, .20}, D = C + .45 (gap
  // .25), P2 = P1 + 4.0 (root gap 3.35).
  //
  // minSamples=1 → core(a) = nearest-other ≤ d(a,b) ∀b → mreach = raw:
  //   every C point dies at λ=1/.05=20; stab(C) = 5·(20−4) = 80 per blob;
  //   stab(P1) = (4 − 1/3.35)·10 = 37.0 < 160 → children win: 4 clusters.
  //
  // minSamples=5 with 5-point blobs → the 5th nearest OTHER point lies in
  // the SIBLING blob, so every core spans the C–D gap. Sorted
  // other-distances per point: c0 {.05,.10,.15,.20,.45}→core .45;
  // c1 {.05,.05,.10,.15,.40}→.40; c2 {.05,.05,.10,.10,.35}→.35;
  // c3 {.05,.05,.10,.15,.30}→.30; c4 {.05,.10,.15,.20,.25}→.25
  // (D mirrored: d0 .25, d1 .30, d2 .35, d3 .40, d4 .45).
  //   Every P1 mutual-reachability edge is core-dominated: the cheapest is
  //   mr(c4,d0)=max(.25,.25,.25)=.25, and each remaining point accretes
  //   SINGLY at its own core (.26..., up to .45) — no (≥5,≥5) split ever
  //   happens inside P1, so C and D are never born: P1 is a condensed LEAF,
  //   EOM selects P1 and P2 directly → 2 clusters.
  //
  // (Under a "self-included" convention — core = (minSamples-1)-th nearest
  // other — the cores would stay INSIDE the blobs (.10–.20), C and D would
  // be born at the .25 split, and the EOM stability comparison would decide
  // instead. This fixture pins the nearest-OTHER indexing.)
  // ---------------------------------------------------------------------
  test("minSamples deflates density and flips the EOM selection") {
    val c = Seq(0.0, 0.05, 0.10, 0.15, 0.20)
    val xs = c ++ c.map(_ + 0.45) ++ c.map(_ + 4.0) ++ c.map(_ + 4.45)
    val (n, d) = line(xs: _*)
    val fine = Hdbscan.labelsFromDistance(n, d, minClusterSize = 5, minSamples = 1)
    assert(fine.toSeq === (Seq.fill(5)(0) ++ Seq.fill(5)(1) ++ Seq.fill(5)(2) ++ Seq.fill(5)(3)))
    val coarse = Hdbscan.labelsFromDistance(n, d, minClusterSize = 5, minSamples = 5)
    assert(coarse.toSeq === (Seq.fill(10)(0) ++ Seq.fill(10)(1)))
  }

  // ---------------------------------------------------------------------
  // Fixture 5b: the core-distance indexing convention, pinned by labels.
  //
  // Fixture-3 data (TIGHT 5-point blobs, gaps .01; D = C + .29 so the C–D
  // gap is .25) with minSamples=5. The 5th nearest OTHER point of every
  // blob member lies in the sibling blob (cores .25–.29 — e.g. c4:
  // {.01,.02,.03,.04,.25}→.25, c0: {.01,.02,.03,.04,.29}→.29), so all of
  // P1 accretes singly at core-dominated heights and C/D are never born:
  // TWO clusters of 10. Under the self-included convention (core =
  // (minSamples−1)-th nearest other) the cores stay inside the blobs
  // (≤ .04), mreach ≈ raw, C/D are born at the .25 split with huge
  // stabilities (5·(1/.04 − 4) ≈ 105 each vs parent 37) and the result
  // would be FOUR clusters — a label-level divergence between the two
  // conventions, asserted here on the reference library's side.
  // ---------------------------------------------------------------------
  test("core distance reaches the minSamples-th nearest OTHER point") {
    val c = Seq(0.0, 0.01, 0.02, 0.03, 0.04)
    val xs = c ++ c.map(_ + 0.29) ++ c.map(_ + 4.0) ++ c.map(_ + 4.29)
    val (n, d) = line(xs: _*)
    val got = Hdbscan.labelsFromDistance(n, d, minClusterSize = 5, minSamples = 5)
    assert(got.toSeq === (Seq.fill(10)(0) ++ Seq.fill(10)(1)))
  }

  // ---------------------------------------------------------------------
  // Fixture 6: a single blob is ALL NOISE under allow_single_cluster=False
  // (the published default and a famous HDBSCAN gotcha): the root cluster
  // never splits into two ≥m sides, the root is not selectable, so every
  // point falls out unlabelled.
  // ---------------------------------------------------------------------
  test("single blob with no sub-structure is all noise (no selectable cluster)") {
    val (n, d) = line(0.0, 0.01, 0.02, 0.03, 0.04, 0.05, 0.06, 0.07)
    val got = Hdbscan.labelsFromDistance(n, d, minClusterSize = 5, minSamples = 1)
    assert(got.toSeq === Seq.fill(8)(-1))
  }

  // ---------------------------------------------------------------------
  // End-to-end over cosine vectors (the labels() entry): fixture 1 mapped
  // onto the unit circle (cosine distance 1−cos(Δθ) is monotone in the
  // angle gap, so the dendrogram is the same shape).
  // ---------------------------------------------------------------------
  test("cosine-vector path matches the line-metric derivation; eps-linkage disagrees") {
    def onCircle(theta: Double): Array[Float] =
      Array(math.cos(theta).toFloat, math.sin(theta).toFloat)
    val angles = Seq(0.0, 0.01, 0.02, 0.03, 0.04, 0.05,
      1.00, 1.01, 1.02, 1.03, 1.04, 1.05, 3.0)
    val vecs = angles.map(onCircle).toArray
    val got = Hdbscan.labels(vecs, minClusterSize = 5, minSamples = 1)
    assert(got.toSeq === (Seq.fill(6)(0) ++ Seq.fill(6)(1) :+ -1))
    // the flat ε-cut accepts the outlier through B (1−cos(1.95) ≈ 1.37)
    val flat = LocalCluster.clusterVectors(vecs, eps = 1.9, minClusterSize = 5)
    assert(flat.toSeq === Seq.fill(13)(0))
  }

  test("hdbscanPerKey clusters each key group independently (fixture-1 shape per user)") {
    val spark = graft.SparkSpec.session
    import spark.implicits._
    def onCircle(theta: Double): Seq[Float] =
      Seq(math.cos(theta).toFloat, math.sin(theta).toFloat)
    val angles = Seq(0.0, 0.01, 0.02, 0.03, 0.04, 0.05,
      1.00, 1.01, 1.02, 1.03, 1.04, 1.05, 3.0)
    val rows = for {
      user <- Seq(7L, 8L)
      (theta, i) <- angles.zipWithIndex
    } yield (user, f"i$i%02d", onCircle(theta))
    val df = rows.toDF("user_id", "interest", "embedding")
    val got = LocalCluster.hdbscanPerKey(df, "user_id", "interest", "embedding",
        minClusterSize = 5, minSamples = 1, clusterSelectionEpsilon = 0.0)
      .select("user_id", "interest", "cluster_label")
      .as[(Long, String, Int)].collect().sortBy(r => (r._1, r._2))
    val expected = for {
      user <- Seq(7L, 8L)
      (lbl, i) <- ((Seq.fill(6)(0) ++ Seq.fill(6)(1)) :+ -1).zipWithIndex
    } yield (user, f"i$i%02d", lbl)
    assert(got.toSeq === expected)
  }

  test("degenerate inputs") {
    assert(Hdbscan.labels(Array.empty, 5).toSeq === Seq())
    assert(Hdbscan.labels(Array(Array(1f, 0f)), 5).toSeq === Seq(-1))
    val dup = Array.fill(6)(Array(1f, 0f))
    // all-identical points: no ≥m/≥m split ever happens → all noise
    assert(Hdbscan.labels(dup, 5).toSeq === Seq.fill(6)(-1))
    intercept[IllegalArgumentException](Hdbscan.labels(dup, 1))
    intercept[IllegalArgumentException](
      Hdbscan.labels(dup, 5, clusterSelectionEpsilon = -1.0))
  }

  /** Flat ε-single-linkage over an explicit matrix (the q54 semantics),
    * used here only to demonstrate divergence. */
  private def epsLinkage(d: Array[Array[Double]], eps: Double, minClusterSize: Int): Array[Int] = {
    val n = d.length
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    for (i <- 0 until n; j <- i + 1 until n if d(i)(j) <= eps) {
      val (ri, rj) = (find(i), find(j))
      if (ri != rj) { if (ri < rj) parent(rj) = ri else parent(ri) = rj }
    }
    val roots = Array.tabulate(n)(find)
    val sizes = roots.groupBy(identity).map { case (r, m) => r -> m.length }
    val keep = roots.distinct.filter(sizes(_) >= minClusterSize).sorted.zipWithIndex.toMap
    roots.map(r => keep.getOrElse(r, -1))
  }
}
