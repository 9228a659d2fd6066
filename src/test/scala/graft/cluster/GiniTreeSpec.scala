package graft.cluster

import graft.SparkSpec

/** Depth-2 Gini tree contract. Independent reference: exact-rational
  * (BigInt cross-multiplied) split search over all candidates in plain
  * Scala, with the same (feature, bin) tie-break. */
class GiniTreeSpec extends SparkSpec {

  import spark.implicits._

  private type Row4 = (Long, Int, String, Long) // doc_id, y, f, bin

  /** Exact-rational argmin over candidates — compares on the same
    * truncated 1e-15 grid the engine uses. */
  private def refBest(rows: Seq[Row4]): (String, Long) = {
    val byF = rows.groupBy(_._3)
    val cands = for {
      (f, xs) <- byF.toSeq
      bins = xs.map(_._4).distinct.sorted
      b <- bins
      l = xs.filter(_._4 <= b); r = xs.filter(_._4 > b)
      if l.nonEmpty && r.nonEmpty
    } yield {
      val (nl, pl) = (BigInt(l.size), BigInt(l.count(_._2 == 1)))
      val (nr, pr) = (BigInt(r.size), BigInt(r.count(_._2 == 1)))
      val a = pl * (nl - pl) * nr + pr * (nr - pr) * nl
      val sk = a * BigInt("1000000000000000") / (nl * nr)
      (sk, f, b)
    }
    val best = cands.minBy { case (sk, f, b) => (sk, f, b) }
    (best._2, best._3)
  }

  private def refAssignLeft(rows: Seq[Row4], f: String, b: Long): Set[Long] =
    rows.filter(r => r._3 == f && r._4 <= b).map(_._1).toSet

  test("hand fixture: the perfectly separating feature wins") {
    // f 'good' separates y exactly at bin 3; f 'noise' is constant
    val rows: Seq[Row4] = (0L until 20L).flatMap { i =>
      val y = if (i < 8) 1 else 0
      Seq((i, y, "good", if (y == 1) 2L else 7L), (i, y, "noise", 5L))
    }
    val tree = GiniTree.fitDepth2(spark, rows.toDF("doc_id", "y", "f", "bin"))
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(tree(0).getString(2) == "good")
    assert(tree(0).getLong(3) >= 2L && tree(0).getLong(3) < 7L)
    assert(tree(0).getLong(5) == 20L && tree(0).getLong(6) == 8L)
    // children are PURE and constant-featured -> degenerate leaves with
    // empty sub-leaves, not crashes
    assert(tree(1).getString(1) == "leaf" && tree(1).getLong(5) == 8L
      && tree(1).getLong(6) == 8L && tree(1).getInt(7) == 1)
    assert(tree(2).getString(1) == "leaf" && tree(2).getLong(5) == 12L
      && tree(2).getLong(6) == 0L && tree(2).getInt(7) == 0)
    assert(Seq(3, 4, 5, 6).forall(i => tree(i).getLong(5) == 0L))
  }

  test("root split matches the exact-rational reference on random data") {
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new scala.util.Random(seed)
      val rows: Seq[Row4] = (0L until 300L).flatMap { i =>
        val y = if (rnd.nextDouble() < 0.35) 1 else 0
        Seq("fa", "fb", "fc").map(f =>
          (i, y, f, rnd.nextInt(GiniTree.NumBins).toLong))
      }
      val (ef, eb) = refBest(rows)
      val tree = GiniTree.fitDepth2(spark,
        rows.toDF("doc_id", "y", "f", "bin").repartition(7))
        .collect().map(r => r.getInt(0) -> r).toMap
      assert(tree(0).getString(2) == ef && tree(0).getLong(3) == eb,
        s"seed=$seed got (${tree(0).getString(2)},${tree(0).getLong(3)}) want ($ef,$eb)")
      // child splits match the reference recursion too
      val leftIds = refAssignLeft(rows, ef, eb)
      val (lf, lb) = refBest(rows.filter(r => leftIds.contains(r._1)))
      val (rf, rb) = refBest(rows.filterNot(r => leftIds.contains(r._1)))
      assert(tree(1).getString(2) == lf && tree(1).getLong(3) == lb, s"seed=$seed left")
      assert(tree(2).getString(2) == rf && tree(2).getLong(3) == rb, s"seed=$seed right")
      // leaf counts conserve the corpus
      assert(Seq(3, 4, 5, 6).map(tree(_).getLong(5)).sum == 300L)
    }
  }
}
