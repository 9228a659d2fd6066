package graft.operators

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf)

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select(col("doc_id")).as[Long].collect().toSet

  test("stable sample: reproducible, nesting, repartition-invariant") {
    val s10 = ids(Sampling.stableSample(docs, "doc_id", 6554)) // ~10%
    val s25 = ids(Sampling.stableSample(docs, "doc_id", 16384)) // ~25%
    assert(s10.subsetOf(s25)) // subsets nest under one salt
    // membership is content-addressed — layout can't change it
    assert(ids(Sampling.stableSample(docs.repartition(7), "doc_id", 6554)) == s10)
    // two runs identical
    assert(ids(Sampling.stableSample(docs, "doc_id", 6554)) == s10)
    // rate lands near the target (binomial tolerance at n=500)
    val n = docs.count().toDouble
    assert(math.abs(s25.size / n - 0.25) < 0.08, s"${s25.size / n}")
    // different salt → different (roughly independent) draw
    val other = ids(Sampling.stableSample(docs, "doc_id", 6554, salt = "other"))
    assert(other != s10)
  }

  test("priority sample: τ dominates every non-sampled priority; deterministic") {
    val items = (1L to 500L).map(i => (i, 10L + (i * 7) % 400)).toDF("id", "w")
    val s1 = Sampling.prioritySample(items, "id", "w", k = 50)
      .select("rnk", "ps_id", "w", "pri_grid", "tau_grid", "est_w")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(s1.length == 50)
    val tau = s1.head._5
    assert(s1.forall(_._5 == tau), "τ must be one global threshold")
    // every sampled priority ≥ τ (τ is the 51st); estimator = max(w, τ)
    assert(s1.forall(r => r._4 >= tau))
    assert(s1.forall(r => r._6 == math.max(r._3, tau)))
    // two runs and a repartition produce the identical sample
    val s2 = Sampling.prioritySample(items.repartition(7), "id", "w", k = 50)
      .select("rnk", "ps_id", "w", "pri_grid", "tau_grid", "est_w")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(s1.toSeq == s2.toSeq)
  }

  test("priority sample exhaustive boundary: n ≤ k ⇒ τ = 0 and every subset-sum exact") {
    val items = (1L to 30L).map(i => (i, 100L * i)).toDF("id", "w")
    val s = Sampling.prioritySample(items, "id", "w", k = 50)
      .select("ps_id", "w", "tau_grid", "est_w")
      .as[(Long, Long, Long, Long)].collect()
    assert(s.length == 30)
    assert(s.forall(_._3 == 0L), "no 51st priority ⇒ τ = 0")
    assert(s.forall(r => r._4 == r._2), "τ = 0 ⇒ ŵ = w (estimates exact)")
    // subset-sum over an arbitrary predicate is exact
    val evens = s.filter(_._1 % 2 == 0).map(_._4).sum
    assert(evens == (1L to 30L).filter(_ % 2 == 0).map(100L * _).sum)
  }

  test("priority sample: negative and fractional weights fail loudly") {
    val neg = Seq((1L, 5L), (2L, -3L)).toDF("id", "w")
    val e1 = intercept[Exception] {
      Sampling.prioritySample(neg, "id", "w", k = 2).collect()
    }
    assert(e1.getMessage.contains("negative or NULL weight") ||
      Option(e1.getCause).exists(_.getMessage.contains("negative or NULL weight")))
    val frac = Seq((1L, 5.0), (2L, 2.5)).toDF("id", "w")
    val e2 = intercept[Exception] {
      Sampling.prioritySample(frac, "id", "w", k = 2).collect()
    }
    assert(e2.getMessage.contains("non-integral weight") ||
      Option(e2.getCause).exists(_.getMessage.contains("non-integral weight")))
    // a NULL weight must raise too — silently excluding the row (NULL
    // priority sorts last) would bias every subset-sum estimate
    val nul = Seq((1L, Some(5L)), (2L, None)).toDF("id", "w")
    val e3 = intercept[Exception] {
      Sampling.prioritySample(nul, "id", "w", k = 2).collect()
    }
    assert(e3.getMessage.contains("NULL weight") ||
      Option(e3.getCause).exists(_.getMessage.contains("NULL weight")))
  }

  test("stratified rates: strata get their own thresholds") {
    val strat = docs.withColumn("stratum",
      when(col("doc_id") % 2 === 0, lit("even")).otherwise(lit("odd")))
    val out = Sampling.stratifiedStableSample(
      strat, "doc_id", "stratum", Map("even" -> 65536), defaultKeep65536 = 0)
    // evens kept whole, odds dropped entirely
    val got = ids(out)
    assert(got.forall(_ % 2 == 0))
    assert(got.size.toLong == docs.filter(col("doc_id") % 2 === 0).count())
  }
}
