package graft.text

import graft.SparkSpec

/** Collocation lift against an independent in-memory recount (the
  * CurationSpec discipline): exact integer agreement on counts and the
  * HUGEINT-widened lift, plus the ranking property that a planted
  * always-adjacent pair out-lifts a frequent-but-independent one. */
class CollocationsSpec extends SparkSpec {
  import spark.implicits._

  private def referenceLift(texts: Seq[String], minCount: Long)
      : Map[(String, String), (Long, Long, Long, Long)] = {
    val docs = texts.map(_.split(" ").toSeq)
    val uni = docs.flatten.groupBy(identity).map { case (t, o) => t -> o.size.toLong }
    val pairs = docs.flatMap(w => w.zip(w.drop(1)))
      .groupBy(identity).map { case (p, o) => p -> o.size.toLong }
      .filter(_._2 >= minCount)
    val nTok = docs.map(_.size.toLong).sum
    val nBig = docs.map(w => math.max(w.size - 1, 0).toLong).sum
    pairs.map { case ((x, y), nxy) =>
      val lift = (BigInt(nxy) * nTok * nTok * 1000000) /
        (BigInt(nBig) * uni(x) * uni(y))
      (x, y) -> (nxy, uni(x), uni(y), lift.toLong)
    }
  }

  test("counts and lift agree exactly with the in-memory recount") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("ash", "oak", "fir", "elm", "yew", "bay")
    val texts = Seq.fill(40)(
      Seq.fill(5 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Collocations.topLift(df, "doc_id", "text", minCount = 2L, k = 1000)
      .as[(String, String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5, r._6)).toMap
    val want = referenceLift(texts, 2L)
    assert(got == want)
  }

  test("a planted always-adjacent pair out-lifts an independent " +
      "equally-frequent pair; minCount and k bind") {
    // "rare gem" always adjacent (10×); "the" and "end" each appear 10×
    // but never adjacent to each other except twice
    val texts =
      Seq.fill(10)("rare gem the ash end") ++ Seq.fill(2)("the end oak")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val rows = Collocations.topLift(df, "doc_id", "text", minCount = 2L, k = 3)
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(rows.length == 3)
    assert((rows.head._1, rows.head._2) == ("rare", "gem"))
    val lifts = rows.map(_._6)
    assert(lifts.sameElements(lifts.sorted(Ordering[Long].reverse)))
    // pairs below minCount never surface
    val all = Collocations.topLift(df, "doc_id", "text", minCount = 3L, k = 100)
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(all.forall(_._3 >= 3L))
    assert(!all.exists(r => (r._1, r._2) == ("the", "end")))
  }
}
