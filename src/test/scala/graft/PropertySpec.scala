package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests (SURVEY §5.4): totality and algebraic invariants of the
  * pure kernels that back the distributed operators. Uses ScalaCheck
  * generators with a fixed-seed sampler (the scalatestplus bridge isn't in
  * the offline dependency cache). */
class PropertySpec extends AnyFunSuite {

  /** Deterministic 100-case sampler. */
  private def forAll[A](gen: Gen[A])(f: A => Unit): Unit = {
    var seed = Seed(42L)
    var i = 0
    var tried = 0
    while (i < 100 && tried < 1000) {
      gen.apply(Gen.Parameters.default, seed) match {
        case Some(v) => f(v); i += 1
        case None =>
      }
      seed = seed.next
      tried += 1
    }
    assert(i > 50, s"generator too sparse: only $i samples")
  }

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb)) { case (a, b) => f(a, b) }

  private def forAll[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C])(f: (A, B, C) => Unit): Unit =
    forAll(Gen.zip(ga, gb, gc)) { case (a, b, c) => f(a, b, c) }

  import graft.functions.ExtractJsonObjects.scan

  test("extract_json_objects is total and every snippet is balance-consistent") {
    forAll(Gen.asciiPrintableStr) { s =>
      val out = scan(s) // must never throw
      out.foreach { snip =>
        assert(snip.startsWith("{") || snip.startsWith("["))
        assert(snip.endsWith("}") || snip.endsWith("]"))
      }
    }
  }

  test("extract_json_objects finds everything json.parse would find standalone") {
    val objGen = for {
      k <- Gen.alphaStr.suchThat(_.nonEmpty).map(_.take(8))
      v <- Gen.choose(-1000, 1000)
    } yield s"""{"$k": $v}"""
    forAll(Gen.listOfN(3, objGen), Gen.alphaStr, Gen.alphaStr) { (objs, pre, sep) =>
      val text = pre + objs.mkString(sep.filterNot(c => c == '{' || c == '[' || c == '"'))
      assert(scan(text).size == objs.size)
    }
  }

  test("PolarsOffset: parse(x) + parse(-x) cancel") {
    val unitGen = Gen.oneOf("d", "h", "m", "s", "mo", "w", "y", "ms")
    val offGen = for {
      n <- Gen.choose(1, 500)
      u <- unitGen
    } yield s"$n$u"
    forAll(offGen) { off =>
      val pos = graft.functions.PolarsOffset.parse(off)
      val neg = graft.functions.PolarsOffset.parse(s"-$off")
      assert(pos.months == -neg.months && pos.micros == -neg.micros)
    }
  }

  test("union-find clustering: labels partition the input; noise iff small") {
    import graft.cluster.LocalCluster
    val vecGen = Gen.listOfN(3, Gen.choose(-1.0f, 1.0f)).map(_.toArray)
    forAll(Gen.choose(0, 25).flatMap(n => Gen.listOfN(n, vecGen)), Gen.choose(1, 4)) {
      (vecs, minSize) =>
        val arr = vecs.toArray
        val labels = LocalCluster.clusterVectors(arr, eps = 0.3, minClusterSize = minSize)
        assert(labels.length == arr.length)
        // every non-noise cluster has >= minSize members
        labels.filter(_ >= 0).groupBy(identity).foreach { case (_, m) =>
          assert(m.length >= minSize)
        }
        // labels are contiguous from 0
        val distinct = labels.filter(_ >= 0).distinct.sorted.toSeq
        assert(distinct == distinct.indices.toSeq)
    }
  }

  test("winnow fingerprint: subset-of-hashes and shift stability") {
    import graft.functions.WinnowFingerprint
    forAll(Gen.alphaNumStr.suchThat(_.length >= 30)) { s =>
      val fp = WinnowFingerprint.fingerprint(s, 8, 16)
      assert(fp.nonEmpty)
      assert(fp == fp.sorted) // canonical order
      // appending text never removes early-window minima entirely
      val fp2 = WinnowFingerprint.fingerprint(s + "xyz", 8, 16).toSet
      assert(fp.toSet.intersect(fp2).nonEmpty)
    }
  }

  test("MinHash: signature of a superset document shares minima monotonically") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, StringType}
    import graft.functions.MinHashSignature
    def sig(tokens: Seq[String]): Seq[Long] = {
      val e = MinHashSignature(Literal.create(tokens, ArrayType(StringType)), 8, 3)
      e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray().toSeq
    }
    val tokGen = Gen.listOfN(12, Gen.oneOf("a", "b", "c", "d", "e", "f", "g"))
    forAll(tokGen, Gen.listOfN(3, Gen.oneOf("x", "y", "z"))) { (base, extra) =>
      val s1 = sig(base)
      val s2 = sig(base ++ extra)
      // adding shingles can only lower (or keep) each salted minimum
      s1.zip(s2).foreach { case (a, b) => assert(b <= a) }
    }
  }

  test("ZInterleave: bijective per dimension and deinterleavable") {
    import graft.functions.ZInterleave
    def deinterleave(z: Long, dims: Int, bits: Int): Array[Int] = {
      val out = new Array[Int](dims)
      for (b <- 0 until bits; d <- 0 until dims)
        if (((z >>> (b * dims + d)) & 1L) == 1L) out(d) |= 1 << b
      out
    }
    val dimGen = Gen.choose(2, 4)
    forAll(dimGen.flatMap(n => Gen.zip(Gen.const(n),
      Gen.listOfN(n, Gen.choose(0, 255))))) { case (n, vals) =>
      val z = ZInterleave.interleave(vals.toArray, 8)
      assert(deinterleave(z, n, 8).toSeq == vals)
    }
    // single-dim monotonicity: increasing one coordinate (others fixed at 0)
    // increases the z-value
    forAll(Gen.choose(0, 254)) { x =>
      assert(ZInterleave.interleave(Array(x, 0), 8) <
        ZInterleave.interleave(Array(x + 1, 0), 8))
    }
  }

  test("hdbscan: total; every cluster ≥ minClusterSize; labels contiguous by smallest member") {
    import graft.cluster.Hdbscan
    val genPts = Gen.chooseNum(2, 40).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.chooseNum(-1.0, 1.0), Gen.chooseNum(-1.0, 1.0))))
    forAll(genPts, Gen.chooseNum(2, 5), Gen.chooseNum(0, 4)) { (pts, m, msRaw) =>
      val n = pts.length
      def d(i: Int, j: Int) =
        math.hypot(pts(i)._1 - pts(j)._1, pts(i)._2 - pts(j)._2)
      val labels = Hdbscan.labelsFromDistance(n, d, m, minSamples = msRaw,
        clusterSelectionEpsilon = if (msRaw % 2 == 0) 0.0 else 0.3) // must never throw
      assert(labels.length == n)
      val byLbl = labels.zipWithIndex.filter(_._1 >= 0).groupBy(_._1)
      byLbl.foreach { case (_, members) => assert(members.length >= m) }
      assert(byLbl.keySet == (0 until byLbl.size).toSet) // 0..k−1, no holes
      val smallestMembers = byLbl.toSeq.sortBy(_._1).map(_._2.map(_._2).min)
      assert(smallestMembers == smallestMembers.sorted)
    }
  }

  test("hdbscan: the partition is permutation-invariant on tie-free inputs") {
    import graft.cluster.Hdbscan
    // minSamples=1 keeps mutual reachability = raw distance; random doubles
    // make all pairwise distances distinct almost surely, so the MST (and
    // everything derived from it) is unique — the clustering must not
    // depend on input order. (With minSamples > 1, core distances create
    // REAL mreach ties whose resolution is ordinal, as in the published
    // implementations — ordering is only contractual, not invariant.)
    val genPts = Gen.chooseNum(5, 30).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.chooseNum(-1.0, 1.0), Gen.chooseNum(-1.0, 1.0))))
    forAll(genPts, Gen.long) { (pts, permSeed) =>
      val n = pts.length
      def dist(a: (Double, Double), b: (Double, Double)) =
        math.hypot(a._1 - b._1, a._2 - b._2)
      def labelByOrig(order: IndexedSeq[Int]): Map[Int, Int] = {
        val arr = order.map(pts)
        val ls = Hdbscan.labelsFromDistance(n,
          (i, j) => dist(arr(i), arr(j)), 3, minSamples = 1)
        order.zip(ls).toMap
      }
      val base = labelByOrig((0 until n).toVector)
      val perm = new scala.util.Random(permSeed).shuffle((0 until n).toVector)
      val shuffled = labelByOrig(perm)
      def clustersOf(m: Map[Int, Int]) =
        m.groupBy(_._2).collect { case (l, g) if l >= 0 => g.keySet }.toSet
      assert(clustersOf(base) == clustersOf(shuffled))
      assert(base.filter(_._2 == -1).keySet == shuffled.filter(_._2 == -1).keySet)
    }
  }

  test("winnowing guarantee: docs sharing a substring of length ≥ w+k−1 share a fingerprint") {
    import graft.functions.WinnowFingerprint
    val k = 8; val w = 16
    // the classic winnowing theorem: any common substring of length at
    // least w + k − 1 forces at least one common selected hash
    val charGen = Gen.oneOf(('a' to 'z') ++ ('0' to '9'))
    def strGen(n: Int) = Gen.listOfN(n, charGen).map(_.mkString)
    forAll(strGen(w + k - 1 + 10), strGen(20), strGen(20)) { (common, pre, suf) =>
      val d1 = pre + common
      val d2 = common + suf
      val f1 = WinnowFingerprint.fingerprint(d1, k, w).toSet
      val f2 = WinnowFingerprint.fingerprint(d2, k, w).toSet
      assert(f1.intersect(f2).nonEmpty,
        s"no shared fingerprint for shared ${common.length}-char substring")
    }
  }
}
