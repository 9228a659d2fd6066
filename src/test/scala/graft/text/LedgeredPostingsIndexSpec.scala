package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exactly-once contract of the ledgered postings index: at-least-once
  * delivery (every batch delivered twice) + `mergeOnce` must leave the
  * index state identical to a batch build — PostingsIndex.build over the
  * same corpus is the independent reference for every serve. Plus the
  * two failure-path halves: a TORN batch (appends without a ledger row)
  * is invisible to serves and healed by the retry, and compaction
  * preserves serves while keeping committed ids committed. */
class LedgeredPostingsIndexSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(n: Int, seed: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("ash", "oak", "fir", "elm", "yew", "bay", "box", "may")
    (1L to n.toLong).map(i =>
      i -> Seq.fill(6 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
  }

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("lpidx").toString

  private def bmRows(df: org.apache.spark.sql.DataFrame) =
    df.select("qid", "rank", "doc_id", "score_i")
      .as[(Long, Int, Long, Long)].collect().toSet

  private def phRows(df: org.apache.spark.sql.DataFrame) =
    df.select("qid", "doc_id", "n_occ")
      .as[(Long, Long, Long)].collect().toSet

  test("every batch delivered TWICE still equals the batch build " +
      "(at-least-once delivery + idempotent merge = exactly-once state)") {
    val all = fixture(24, 41)
    val idx = LedgeredPostingsIndex.create(spark, tmp(), nBuckets = 8)
    all.grouped(6).zipWithIndex.foreach { case (b, i) =>
      val bdf = b.toDF("doc_id", "text")
      assert(idx.mergeOnce(bdf, "doc_id", "text", i.toLong))
      assert(!idx.mergeOnce(bdf, "doc_id", "text", i.toLong),
        s"redelivery of batch $i must be a no-op")
    }
    val reference = PostingsIndex.build(all.toDF("doc_id", "text"),
      tmp(), "doc_id", "text", nBuckets = 8)
    val probes = all.take(3).map { case (i, t) => (i, t.split(" ").head) }
      .toDF("qid", "tok")
    assert(bmRows(idx.bm25TopK(probes, 5)) ==
      bmRows(reference.bm25TopK(probes, 5)))
    val phrases = all.take(2).map { case (i, t) =>
      (i, t.split(" ").take(2).mkString(" ")) }.toDF("qid", "phrase")
    assert(phRows(idx.phraseMatches(phrases)) ==
      phRows(reference.phraseMatches(phrases)))
  }

  test("jaccard and RM3 serves from the ledgered index equal the plain " +
      "index's (full serve parity after batched ingest)") {
    val all = fixture(24, 73)
    val idx = LedgeredPostingsIndex.create(spark, tmp(), nBuckets = 8)
    all.grouped(8).zipWithIndex.foreach { case (b, i) =>
      idx.mergeOnce(b.toDF("doc_id", "text"), "doc_id", "text", i.toLong): Unit
    }
    val corpus = all.toDF("doc_id", "text")
    val reference = PostingsIndex.build(corpus, tmp(), "doc_id", "text",
      nBuckets = 8)
    val probes = corpus.filter(col("doc_id") <= 3)
      .select(col("doc_id").as("qid"),
        explode(slice(split(col("text"), " "), 1, 4)).as("tok"))
      .distinct()
    def jrows(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "rank", "doc_id", "sim_ppm")
        .as[(Long, Int, Long, Long)].collect().toSet
    assert(jrows(idx.jaccardTopK(probes, 5)) ==
      jrows(reference.jaccardTopK(probes, 5)))
    def terms(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, String)].collect().toSet
    assert(terms(idx.rm3ExpandedTerms(probes, corpus, "doc_id", "text",
        k = 8, fbDocs = 4, fbTerms = 3)) ==
      terms(reference.rm3ExpandedTerms(probes, corpus, "doc_id", "text",
        k = 8, fbDocs = 4, fbTerms = 3)))
  }

  test("a torn batch (appends, no ledger row) is invisible to serves " +
      "and healed by the retry") {
    val all = fixture(20, 7)
    val dir = tmp()
    val idx = LedgeredPostingsIndex.create(spark, dir, nBuckets = 8)
    assert(idx.mergeOnce(all.take(10).toDF("doc_id", "text"),
      "doc_id", "text", 0L))
    // simulate a merge of batch 1 that died after some appends: postings
    // + lengths rows for a ghost document on a REAL token, no ledger row
    val probeTok = all.head._2.split(" ").head
    Seq((probeTok, 999L, 50L))
      .toDF("tok", "doc_id", "tf")
      .withColumn("bkt", pmod(xxhash64(col("tok")), lit(8L)))
      .withColumn("batch", lit("b1"))
      .write.mode("append").partitionBy("bkt", "batch")
      .parquet(s"$dir/postings")
    Seq((999L, 10L)).toDF("doc_id", "dl")
      .withColumn("batch", lit("b1"))
      .write.mode("append").partitionBy("batch").parquet(s"$dir/lengths")
    val probes = Seq((1L, probeTok)).toDF("qid", "tok")
    assert(!bmRows(idx.bm25TopK(probes, 10)).exists(_._3 == 999L),
      "torn rows must be invisible before the retry")
    // the retry of batch 1 heals the torn partitions, then appends
    assert(idx.mergeOnce(all.drop(10).toDF("doc_id", "text"),
      "doc_id", "text", 1L))
    val reference = PostingsIndex.build(all.toDF("doc_id", "text"),
      tmp(), "doc_id", "text", nBuckets = 8)
    assert(bmRows(idx.bm25TopK(probes, 10)) ==
      bmRows(reference.bm25TopK(probes, 10)))
  }

  test("compact folds partials, preserves serves, and keeps committed " +
      "ids committed (late redelivery still a no-op)") {
    val all = fixture(24, 13)
    val dir = tmp()
    val idx = LedgeredPostingsIndex.create(spark, dir, nBuckets = 4)
    all.grouped(4).zipWithIndex.foreach { case (b, i) =>
      idx.mergeOnce(b.toDF("doc_id", "text"), "doc_id", "text", i.toLong): Unit
    }
    def parquetFiles(table: String): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$dir/$table"))
        .count(_.getName.endsWith(".parquet"))
    }
    val probes = all.take(3).map { case (i, t) => (i, t.split(" ").head) }
      .toDF("qid", "tok")
    val before = bmRows(idx.bm25TopK(probes, 5))
    val filesBefore = parquetFiles("postings")
    // a TORN compaction (k1 dirs, no cledger rows) must be invisible to
    // serves and healed by the real compact()
    Seq(("ghosttok", 999L, 50L))
      .toDF("tok", "doc_id", "tf")
      .withColumn("bkt", pmod(xxhash64(col("tok")), lit(4L)))
      .withColumn("batch", lit("k1"))
      .write.mode("append").partitionBy("bkt", "batch")
      .parquet(s"$dir/postings")
    assert(bmRows(idx.bm25TopK(probes, 5)) == before,
      "torn compaction rows must be invisible")
    idx.compact()
    assert(spark.read.parquet(s"$dir/postings")
      .filter(col("tok") === "ghosttok").isEmpty,
      "heal must remove the torn generation's rows")
    assert(parquetFiles("postings") < filesBefore)
    assert(bmRows(idx.bm25TopK(probes, 5)) == before)
    // statsp partials collapsed to one row
    assert(spark.read.parquet(s"$dir/statsp").count() == 1L)
    assert(!idx.mergeOnce(all.take(4).toDF("doc_id", "text"),
      "doc_id", "text", 0L), "pre-compaction batch id must stay committed")
  }

  test("an EMPTY batch commits its id (redelivery no-op) without " +
      "disturbing serves") {
    val all = fixture(12, 5)
    val idx = LedgeredPostingsIndex.create(spark, tmp(), nBuckets = 4)
    assert(idx.mergeOnce(all.toDF("doc_id", "text"), "doc_id", "text", 0L))
    val probes = all.take(2).map { case (i, t) => (i, t.split(" ").head) }
      .toDF("qid", "tok")
    val before = bmRows(idx.bm25TopK(probes, 5))
    val empty = all.toDF("doc_id", "text").limit(0)
    assert(idx.mergeOnce(empty, "doc_id", "text", 1L))
    assert(!idx.mergeOnce(empty, "doc_id", "text", 1L))
    assert(bmRows(idx.bm25TopK(probes, 5)) == before)
  }

  test("create() is FRESH (old ledger cannot no-op new batches); " +
      "mismatched bucket count rejected; negative batch id rejected") {
    val all = fixture(8, 3)
    val dir = tmp()
    val idx0 = LedgeredPostingsIndex.create(spark, dir, nBuckets = 4)
    assert(idx0.mergeOnce(all.toDF("doc_id", "text"), "doc_id", "text", 0L))
    val idx1 = LedgeredPostingsIndex.create(spark, dir, nBuckets = 4)
    assert(idx1.committedIds().isEmpty)
    assert(idx1.mergeOnce(all.toDF("doc_id", "text"), "doc_id", "text", 0L),
      "batch 0 must merge into the re-created index")
    intercept[IllegalArgumentException] {
      new LedgeredPostingsIndex(spark, dir, 32)
        .bm25TopK(Seq((1L, "ash")).toDF("qid", "tok"), 5).collect()
    }
    intercept[IllegalArgumentException] {
      idx1.mergeOnce(all.toDF("doc_id", "text"), "doc_id", "text", -1L)
    }
    assert(LedgeredPostingsIndex.open(spark, dir)
      .bm25TopK(Seq((1L, "ash")).toDF("qid", "tok"), 5).count() >= 0)
  }

  test("positionless index: positions never ingested, phrase serving " +
      "refuses loudly, bm25 parity and compaction unaffected") {
    val all = fixture(18, 59)
    val dir = tmp()
    val idx = LedgeredPostingsIndex.create(spark, dir, nBuckets = 8,
      withPositions = false)
    all.grouped(6).zipWithIndex.foreach { case (b, i) =>
      assert(idx.mergeOnce(b.toDF("doc_id", "text"), "doc_id", "text",
        i.toLong))
    }
    assert(!new java.io.File(s"$dir/positions").exists(),
      "positionless index must not ingest the positions table")
    val ex = intercept[IllegalArgumentException] {
      idx.phraseMatches(Seq((1L, "ash oak")).toDF("qid", "phrase"))
    }
    assert(ex.getMessage.contains("withPositions = false"))
    val reference = PostingsIndex.build(all.toDF("doc_id", "text"),
      tmp(), "doc_id", "text", nBuckets = 8)
    val probes = all.take(3).map { case (i, t) => (i, t.split(" ").head) }
      .toDF("qid", "tok")
    assert(bmRows(idx.bm25TopK(probes, 5)) ==
      bmRows(reference.bm25TopK(probes, 5)))
    idx.compact()
    assert(!new java.io.File(s"$dir/positions").exists())
    assert(bmRows(idx.bm25TopK(probes, 5)) ==
      bmRows(reference.bm25TopK(probes, 5)),
      "compaction of a positionless index must preserve serves")
  }

  test("impacts: serve equals bm25TopK; a committed merge STALES it " +
      "(loud refusal), rebuild restores; compaction preserves validity") {
    val all = fixture(24, 67)
    val (head, tail) = all.splitAt(18)
    val idx = LedgeredPostingsIndex.create(spark, tmp(), nBuckets = 8,
      withPositions = false)
    assert(idx.mergeOnce(head.toDF("doc_id", "text"), "doc_id", "text", 0L))
    val probes = all.take(3).map { case (i, t) => (i, t.split(" ").head) }
      .toDF("qid", "tok")
    // absent impacts → refuse (never a silent empty serve)
    val exAbsent = intercept[IllegalArgumentException] {
      idx.bm25TopKImpact(probes, 5)
    }
    assert(exAbsent.getMessage.contains("buildImpacts"))
    idx.buildImpacts()
    assert(bmRows(idx.bm25TopKImpact(probes, 5)) ==
      bmRows(idx.bm25TopK(probes, 5)),
      "impact serve must equal the raw-tf serve row for row")
    // a newly committed merge changes the ledger state → impacts stale
    assert(idx.mergeOnce(tail.toDF("doc_id", "text"), "doc_id", "text", 1L))
    val exStale = intercept[IllegalArgumentException] {
      idx.bm25TopKImpact(probes, 5)
    }
    assert(exStale.getMessage.contains("STALE"))
    // the raw-tf serve keeps working mid-cycle (the contract's point)
    assert(bmRows(idx.bm25TopK(probes, 5)).nonEmpty)
    // rebuild after the cycle restores exactness against the full corpus
    idx.buildImpacts()
    val full = PostingsIndex.build(all.toDF("doc_id", "text"),
      tmp(), "doc_id", "text", nBuckets = 8)
    assert(bmRows(idx.bm25TopKImpact(probes, 5)) ==
      bmRows(full.bm25TopK(probes, 5)))
    // compaction does NOT invalidate impacts: committed ids are the
    // content identity and folding preserves them
    idx.compact()
    assert(bmRows(idx.bm25TopKImpact(probes, 5)) ==
      bmRows(full.bm25TopK(probes, 5)),
      "impacts must stay valid across compact()")
  }
}
