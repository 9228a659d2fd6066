package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Misra–Gries contract. Independent references: a hand-simulated MG
  * trace on a fixed single-partition stream, and exact counts on a
  * skewed random corpus for the structure's theorems. */
class FrequentItemsSpec extends SparkSpec {

  import spark.implicits._

  test("hand trace: k=2 over a a b c a c c on one partition") {
    // a:1, a:2, b:1; c arrives with {a:2,b:1} full -> decrement round
    // (a->1, b dropped, dec=1, c NOT inserted); a->2; c:1; c:2.
    val toks = Seq("a", "a", "b", "c", "a", "c", "c").toDF("tok").coalesce(1)
    val out = FrequentItems.misraGries(toks, "tok", k = 2).collect()
    val est = out.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == Map("a" -> 2L, "c" -> 2L))
    assert(out.forall(_.getLong(2) == 1L)) // d_total
  }

  test("per-partition summaries carry one decrement marker each") {
    val toks = Seq("a", "a", "b", "c", "a").toDF("tok").coalesce(1)
    val rows = FrequentItems.misraGriesSummaries(toks, "tok", k = 2)
      .collect()
    assert(rows.count(_.isNullAt(0)) == 1)
    assert(rows.filter(_.isNullAt(0)).head.getLong(1) == 1L)
  }

  /** A Zipf-ish corpus: token i appears ~N/i times. */
  private def zipfToks(n: Int, seed: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n) { // inverse-CDF-ish draw over ranks 1..40
      val u = rnd.nextDouble()
      val rank = math.min(40, math.max(1, math.ceil(math.exp(u * math.log(40))).toInt))
      s"t$rank"
    }
  }

  test("theorems hold at every partitioning: underestimate, est+D bound, D cap, coverage") {
    val toks = zipfToks(20000, seed = 7)
    val exact = toks.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val n = toks.size.toLong
    for (parts <- Seq(1, 4, 13)) {
      val df = toks.toDF("tok").repartition(parts)
      val out = FrequentItems.misraGries(df, "tok", k = 8).collect()
      val d = out.head.getLong(2)
      assert(d <= n / 9, s"parts=$parts: D=$d exceeds N/(k+1)")
      val est = out.map(r => r.getString(0) -> r.getLong(1)).toMap
      est.foreach { case (t, e) =>
        assert(e <= exact(t), s"parts=$parts: overestimate on $t")
        assert(exact(t) <= e + d, s"parts=$parts: bound broken on $t")
      }
      // guaranteed-heavy coverage: true > D => present
      exact.foreach { case (t, c) =>
        if (c > d) assert(est.contains(t), s"parts=$parts: heavy $t missing (cnt=$c, D=$d)")
      }
      // the head of a Zipf corpus IS guaranteed-heavy at k=8 - the
      // coverage theorem is exercised non-vacuously
      assert(exact.values.count(_ > d) >= 2, s"parts=$parts: fixture degenerate (D=$d)")
    }
  }

  test("vocabulary smaller than k is exact with D = 0") {
    val toks = Seq.tabulate(500)(i => s"w${i % 5}").toDF("tok").repartition(3)
    val out = FrequentItems.misraGries(toks, "tok", k = 16).collect()
    assert(out.forall(_.getLong(2) == 0L))
    assert(out.map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("w0" -> 100L, "w1" -> 100L, "w2" -> 100L, "w3" -> 100L, "w4" -> 100L))
  }

  test("empty input yields an empty summary") {
    val toks = Seq.empty[String].toDF("tok")
    assert(FrequentItems.misraGries(toks, "tok", k = 4).collect().isEmpty)
    // and an all-empty-partition frame too
    val sparse = Seq("x").toDF("tok").repartition(8).filter(col("tok") =!= "x")
    assert(FrequentItems.misraGries(sparse, "tok", k = 4).collect().isEmpty)
  }
}
