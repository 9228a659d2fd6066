package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exactly-once contract of the ledgered band index: double-delivered
  * batches leave the committed rows MULTISET-equal to a fresh banding of
  * the union corpus (`Dedup.minhashBandBuckets` is the independent
  * reference — band rows are a pure per-document function), torn appends
  * are invisible and healed, probes see committed state only. */
class LedgeredBandIndexSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(n: Int, seed: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("ash", "oak", "fir", "elm", "yew", "bay", "box", "may")
    (1L to n.toLong).map(i =>
      i -> Seq.fill(8 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
  }

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("lbidx").toString

  private def multiset(df: org.apache.spark.sql.DataFrame): Map[(Long, Int, Long), Long] =
    df.groupBy(col("id"), col("band"), col("bucket"))
      .agg(count(lit(1)).as("n"))
      .as[(Long, Int, Long, Long)].collect()
      .map(r => (r._1, r._2, r._3) -> r._4).toMap

  test("double-delivered batches ≡ fresh banding of the union (multiset)") {
    val all = fixture(30, 21)
    val idx = LedgeredBandIndex.create(spark, tmp())
    all.grouped(10).zipWithIndex.foreach { case (b, i) =>
      val bdf = b.toDF("doc_id", "text")
      assert(idx.mergeOnce(bdf, "doc_id", "text", i.toLong))
      assert(!idx.mergeOnce(bdf, "doc_id", "text", i.toLong))
    }
    val want = multiset(
      Dedup.minhashBandBuckets(all.toDF("doc_id", "text"), "doc_id", "text"))
    assert(multiset(idx.committedRows()) == want)
    assert(want.values.forall(_ == 1L), "reference harbors no dup rows")
  }

  test("torn appends are invisible to probes and healed by the retry; " +
      "probe against committed state matches probeIndex") {
    val all = fixture(20, 5)
    val (standing, batch) = all.partition(_._1 % 5 != 0)
    val dir = tmp()
    val idx = LedgeredBandIndex.create(spark, dir)
    // torn attempt of batch 0: a ghost row in every (band, bucket) the
    // ghost could collide into is overkill — one row with a REAL bucket
    // of a standing doc makes the ghost probe-visible iff heal fails
    val real = Dedup.minhashBandBuckets(
      standing.take(1).toDF("doc_id", "text"), "doc_id", "text")
      .select(lit(999L).as("id"), col("band"), col("bucket"))
      .limit(1)
    real.withColumn("batch", lit("b0"))
      .write.mode("append").partitionBy("batch").parquet(s"$dir/buckets")
    assert(idx.committedRows().count() == 0L,
      "torn rows must not be committed")
    assert(idx.mergeOnce(standing.toDF("doc_id", "text"), "doc_id", "text", 0L))
    val got = multiset(idx.committedRows())
    assert(!got.keySet.exists(_._1 == 999L), "heal must remove the ghost")
    assert(got == multiset(Dedup.minhashBandBuckets(
      standing.toDF("doc_id", "text"), "doc_id", "text")))
    // probe parity with the non-ledgered path
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long)].collect().toSet
    assert(pairs(idx.probe(batch.toDF("doc_id", "text"), "doc_id", "text")) ==
      pairs(Dedup.probeIndex(batch.toDF("doc_id", "text"), "doc_id", "text",
        Dedup.minhashBandBuckets(standing.toDF("doc_id", "text"),
          "doc_id", "text"))))
  }

  test("fresh create, empty-index probe, empty batch, negative id") {
    val all = fixture(10, 9)
    val dir = tmp()
    val idx0 = LedgeredBandIndex.create(spark, dir)
    assert(idx0.probe(all.toDF("doc_id", "text"), "doc_id", "text")
      .count() == 0L, "probing an empty index returns no pairs")
    assert(idx0.mergeOnce(all.toDF("doc_id", "text"), "doc_id", "text", 0L))
    val idx1 = LedgeredBandIndex.create(spark, dir)
    assert(idx1.committedIds().isEmpty, "create() must be FRESH")
    assert(idx1.mergeOnce(all.take(5).toDF("doc_id", "text"),
      "doc_id", "text", 0L))
    assert(idx1.mergeOnce(all.toDF("doc_id", "text").limit(0),
      "doc_id", "text", 1L))
    assert(!idx1.mergeOnce(all.toDF("doc_id", "text").limit(0),
      "doc_id", "text", 1L))
    intercept[IllegalArgumentException] {
      idx1.mergeOnce(all.toDF("doc_id", "text"), "doc_id", "text", -2L)
    }
  }
}
