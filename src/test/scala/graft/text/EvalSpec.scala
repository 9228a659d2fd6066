package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Rank-AUC contract. Independent reference: the literal pairwise
  * definition — count (positive, negative) pairs where the positive
  * outranks the negative, ties at half credit — enumerated over every
  * pair, which the distributed histogram implementation must match
  * exactly (u2 = 2·U is integral by construction). */
class EvalSpec extends SparkSpec {

  private def bruteU2(rows: Seq[(Long, Int)]): (Long, Long, Long) = {
    val pos = rows.filter(_._2 != 0).map(_._1)
    val neg = rows.filter(_._2 == 0).map(_._1)
    val u2 = (for (p <- pos; n <- neg) yield {
      if (p > n) 2L else if (p == n) 1L else 0L
    }).sum
    (pos.size.toLong, neg.size.toLong, u2)
  }

  private def run(rows: Seq[(String, Long, Int)]) = {
    val df = spark.createDataFrame(rows).toDF("g", "score", "is_pos")
    Eval.rankAucByGroup(df, "g", "score", "is_pos")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
  }

  test("hand-computed golden: perfect, inverted, and tied rankings") {
    val out = run(Seq(
      // perfect separation: every positive above every negative → AUC 1
      ("perfect", 10L, 1), ("perfect", 9L, 1), ("perfect", 2L, 0), ("perfect", 1L, 0),
      // inverted: AUC 0
      ("inverted", 1L, 1), ("inverted", 10L, 0),
      // all scores identical: AUC exactly 1/2 (pure tie credit)
      ("ties", 5L, 1), ("ties", 5L, 1), ("ties", 5L, 0)))
    assert(out("perfect") == ((2L, 2L, 8L, 1000000L)))
    assert(out("inverted") == ((1L, 1L, 0L, 0L)))
    assert(out("ties") == ((2L, 1L, 2L, 500000L))) // u2 = 2 pos·neg half-pairs
  }

  test("degenerate single-class groups: defined u2, NULL auc") {
    val out = run(Seq(("allpos", 3L, 1), ("allpos", 7L, 1), ("allneg", 4L, 0)))
    assert(out("allpos") == ((2L, 0L, 0L, -1L)))
    assert(out("allneg") == ((0L, 1L, 0L, -1L)))
  }

  test("randomized agreement with the pairwise definition") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 10) {
      val rows = (1 to 60).map { _ =>
        (rnd.nextInt(9).toLong, if (rnd.nextBoolean()) 1 else 0)
      }
      val (np, nn, u2) = bruteU2(rows)
      val out = run(rows.map { case (s, p) => ("g", s, p) })
      val expectedAuc =
        if (np > 0 && nn > 0) (u2 * 1000000L) / (2L * np * nn) else -1L
      assert(out("g") == ((np, nn, u2, expectedAuc)), s"trial $trial")
    }
  }

  test("group independence: per-group results unchanged by other groups") {
    val a = Seq(("a", 3L, 1), ("a", 1L, 0), ("a", 2L, 0))
    val b = Seq(("b", 9L, 0), ("b", 9L, 1), ("b", 1L, 1))
    val solo = run(a) ++ run(b)
    val joint = run(a ++ b)
    assert(joint == solo)
  }

  /** Brute-force AP reference: sort by (score DESC, id ASC), walk the
    * ranking, Σ (tp·10^9) div rank over positives — the literal
    * definition the distributed histogram+tie-window shape must match. */
  private def bruteAp(rows: Seq[(Long, Long, Int)]): (Long, Long, Long, Long) = {
    val sorted = rows.sortBy { case (id, s, _) => (-s, id) }
    var tp = 0L; var apE9 = 0L
    sorted.zipWithIndex.foreach { case ((_, _, p), i) =>
      if (p != 0) { tp += 1; apE9 += tp * 1000000000L / (i + 1) }
    }
    val nPos = rows.count(_._3 != 0).toLong
    val nNeg = rows.size - nPos
    (nPos, nNeg, apE9, if (nPos > 0) apE9 / (nPos * 1000L) else -1L)
  }

  private def runAp(rows: Seq[(String, Long, Long, Int)]) = {
    val df = spark.createDataFrame(rows).toDF("g", "id", "score", "is_pos")
    Eval.averagePrecisionByGroup(df, "g", "id", "score", "is_pos")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
  }

  test("AP hand goldens: perfect, inverted, tie-broken by id") {
    val out = runAp(Seq(
      // perfect: positives at ranks 1,2 → AP = 1
      ("perfect", 1L, 10L, 1), ("perfect", 2L, 9L, 1),
      ("perfect", 3L, 2L, 0), ("perfect", 4L, 1L, 0),
      // single positive at rank 2 → AP = 1/2
      ("half", 1L, 9L, 0), ("half", 2L, 5L, 1),
      // tie block: pos id=2 after neg id=1 at same score → rank 2, AP 1/2
      ("tie", 1L, 5L, 0), ("tie", 2L, 5L, 1)))
    assert(out("perfect") == ((2L, 2L, 2000000000L, 1000000L)))
    assert(out("half") == ((1L, 1L, 500000000L, 500000L)))
    assert(out("tie") == ((1L, 1L, 500000000L, 500000L)))
  }

  test("AP degenerate: no positives → NULL ap_ppm") {
    val out = runAp(Seq(("neg", 1L, 3L, 0), ("neg", 2L, 7L, 0)))
    assert(out("neg") == ((0L, 2L, 0L, -1L)))
  }

  test("AP randomized agreement with the sorted-walk definition") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 10) {
      val rows = (1 to 80).map { i =>
        (i.toLong, rnd.nextInt(7).toLong, if (rnd.nextInt(3) == 0) 1 else 0)
      }
      val expect = bruteAp(rows)
      val out = runAp(rows.map { case (id, s, p) => ("g", id, s, p) })
      assert(out("g") == expect, s"trial $trial")
    }
  }

  import spark.implicits._

  private def calib(rows: Seq[(Long, Int)]) =
    Eval.calibration(rows.toDF("conf", "pos"), "conf", "pos")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap

  test("calibration hand fixture: two buckets, exact integer gaps") {
    // bucket 2: confs 250000+290000 (sum 540000), 1 positive (acc_sum
    // 1000000) -> gap 460000, conf_ppm 270000, acc_ppm 500000
    // bucket 9: conf 950000, 1 positive -> gap 50000
    val rows = Seq((250000L, 0), (290000L, 1), (950000L, 1))
    val out = calib(rows)
    assert(out(2L) == ((2L, 270000L, 500000L, 460000L, 170000L)))
    assert(out(9L) == ((1L, 950000L, 1000000L, 50000L, 170000L)))
    // ece = (460000 + 50000) div 3 = 170000
  }

  test("calibration: a perfectly calibrated scorer has gap 0 in every bucket") {
    // bucket 5 gets conf 500000 with exactly half positives
    val rows = Seq((500000L, 1), (500000L, 0), (500000L, 1), (500000L, 0))
    val out = calib(rows)
    assert(out(5L) == ((4L, 500000L, 500000L, 0L, 0L)))
  }

  test("calibration matches the textbook double-precision ECE definition") {
    val rnd = new scala.util.Random(3)
    val rows = Seq.fill(400)((rnd.nextInt(1000001).toLong,
      if (rnd.nextDouble() < 0.4) 1 else 0))
    val out = calib(rows)
    // brute force: ECE = sum_b (n_b/N) * |acc_b - conf_b| in doubles
    val byBucket = rows.groupBy { case (c, _) => math.min(9L, c * 10 / 1000000) }
    val n = rows.size.toDouble
    val eceRef = byBucket.values.map { xs =>
      val conf = xs.map(_._1).sum.toDouble / xs.size
      val acc = xs.count(_._2 == 1).toDouble * 1000000 / xs.size
      (xs.size / n) * math.abs(acc - conf)
    }.sum
    val ece = out.values.head._5
    assert(math.abs(ece - eceRef) <= 1.0, s"ece=$ece ref=$eceRef")
    assert(out.values.map(_._5).toSet.size == 1) // constant across rows
  }

  test("calibration: conf 1000000 lands in the top bucket, not bucket 10") {
    val out = calib(Seq((1000000L, 1)))
    assert(out.keySet == Set(9L))
  }

  // ---- ngramPrecision (the BLEU core) ----

  private def runNgram(pairs: Seq[(String, Long, String, String)], maxN: Int) = {
    val df = spark.createDataFrame(pairs).toDF("g", "id", "cand", "ref")
    Eval.ngramPrecision(df, "g", "id", "cand", "ref", maxN)
      .collect().map { r =>
        (r.getString(0), r.getInt(1)) ->
          (r.getLong(2), r.getLong(3),
            if (r.isNullAt(4)) -1L else r.getLong(4))
      }.toMap
  }

  /** The literal Papineni definition, enumerated: per pair, clip each
    * candidate n-gram count at the reference's count for that gram. */
  private def bruteNgram(pairs: Seq[(String, Long, String, String)],
      maxN: Int): Map[(String, Int), (Long, Long)] = {
    def grams(s: String, n: Int): Map[String, Long] =
      s.split(" ", -1).toSeq.sliding(n).filter(_.size == n)
        .map(_.mkString(" ")).toSeq.groupBy(identity)
        .map { case (g, o) => g -> o.size.toLong }
    (for {
      n <- 1 to maxN
      g <- pairs.map(_._1).distinct
    } yield {
      val rows = pairs.filter(_._1 == g)
      val m = rows.map { case (_, _, c, r) =>
        val cg = grams(c, n); val rg = grams(r, n)
        cg.map { case (k, v) => math.min(v, rg.getOrElse(k, 0L)) }.sum
      }.sum
      val t = rows.map { case (_, _, c, _) => grams(c, n).values.sum }.sum
      (g, n) -> (m, t)
    }).toMap
  }

  test("ngram goldens: the Papineni clipping example and an exact match") {
    val out = runNgram(Seq(
      // the classic degenerate candidate: p1 clips at ref('the') = 2 → 2/7
      ("clip", 1L, "the the the the the the the", "the cat is on the mat"),
      // identical strings: every precision exactly 1
      ("same", 1L, "a b c d e", "a b c d e")), maxN = 2)
    assert(out(("clip", 1)) == ((2L, 7L, 285714L)))
    assert(out(("clip", 2)) == ((0L, 6L, 0L)))
    assert(out(("same", 1)) == ((5L, 5L, 1000000L)))
    assert(out(("same", 2)) == ((4L, 4L, 1000000L)))
  }

  test("ngram: clipping is PER PAIR, not corpus-pooled") {
    // 'x' appears once in each pair's reference; a corpus-pooled clip
    // would allow the doubled candidate of pair 1 to borrow pair 2's
    // budget (match 4); the per-pair clip must yield 3
    val out = runNgram(Seq(
      ("g", 1L, "x x", "x y"),
      ("g", 2L, "x x", "x z")), maxN = 1)
    assert(out(("g", 1)) == ((2L, 4L, 500000L)))
  }

  test("ngram: candidate shorter than n contributes nothing, never fails") {
    val out = runNgram(Seq(("g", 1L, "a", "a b c")), maxN = 3)
    assert(out(("g", 1)) == ((1L, 1L, 1000000L)))
    // a (group, n) with ZERO candidate grams emits no row at all — the
    // same omission the SQL oracle produces, so cross-engine parity holds
    assert(!out.contains(("g", 2)) && !out.contains(("g", 3)))
  }

  test("chrF goldens: identity, whitespace stripping, and the β=2 formula") {
    import spark.implicits._
    val out = Eval.chrF(
      Seq(("same", 1L, "ab cd", "abcd"), // space-stripped ⇒ identical
        ("half", 2L, "ab", "abcd"))      // cand ⊂ ref at every order
        .toDF("g", "id", "cand", "ref"),
      "g", "id", "cand", "ref", maxN = 2)
      .select("g", "n", "match_n", "c_total_n", "r_total_n", "prec_ppm",
        "rec_ppm", "f2_ppm")
      .as[(String, Int, Long, Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().map(r => (r._1, r._2) -> r).toMap
    // identical after whitespace stripping: P = R = F2 = 1e6 at n = 1, 2
    for (n <- 1 to 2) {
      val (_, _, m, c, r, p, rc, f) = out(("same", n))
      assert(m == c && c == r && p.contains(1000000L) &&
        rc.contains(1000000L) && f.contains(1000000L), s"same n=$n: $m $c $r")
    }
    // "ab" vs "abcd": n=1 → P=1, R=1/2; F2 = 5·P·R/(4P+R) with recall
    // weighted 4×: (5·1e6·5e5) div (4·1e6+5e5) = 2.5e12 div 4.5e6 = 555555
    val (_, _, m1, c1, r1, p1, rc1, f1) = out(("half", 1))
    assert((m1, c1, r1) == ((2L, 2L, 4L)))
    assert(p1.contains(1000000L) && rc1.contains(500000L) &&
      f1.contains(555555L))
    // n=2 → cand gram "ab" matches 1 of ref's 3 bigrams
    val (_, _, m2, c2, r2, p2, rc2, f2) = out(("half", 2))
    assert((m2, c2, r2) == ((1L, 1L, 3L)))
    assert(p2.contains(1000000L) && rc2.contains(333333L))
  }

  test("chrF: empty candidate keeps the reference row (recall side) with zero precision") {
    import spark.implicits._
    val out = Eval.chrF(Seq(("g", 1L, "", "abc")).toDF("g", "id", "c", "r"),
        "g", "id", "c", "r", maxN = 2)
      .select("n", "match_n", "c_total_n", "r_total_n", "prec_ppm", "rec_ppm",
        "f2_ppm", "chrf2_ppm")
      .as[(Int, Long, Long, Long, Option[Long], Option[Long], Option[Long], Long)]
      .collect().map(r => r._1 -> r).toMap
    // no candidate grams: the full-outer keeps the ref side, prec NULL
    assert(out(1) == ((1, 0L, 0L, 3L, None, Some(0L), None, 0L)))
    assert(out(2) == ((2, 0L, 0L, 2L, None, Some(0L), None, 0L)))
  }

  test("ngram randomized agreement with the enumerated definition") {
    val rnd = new scala.util.Random(11)
    val vocab = Vector("a", "b", "c", "d")
    def sentence() =
      Seq.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val pairs = (1 to 40).map { i =>
      (s"g${i % 3}", i.toLong, sentence(), sentence())
    }
    val got = runNgram(pairs, maxN = 3)
    val want = bruteNgram(pairs, maxN = 3)
    for (((g, n), (m, t)) <- want) {
      val (gm, gt, _) = got((g, n))
      assert((gm, gt) == ((m, t)), s"mismatch at ($g, $n)")
    }
  }
}
