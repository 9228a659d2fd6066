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
