package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Persisted postings-index contract: a serve from the index must equal
  * the corpus recompute EXACTLY (Bm25.topK / PhraseSearch.phraseMatches
  * are the independent references — they never touch the index code
  * path beyond the shared scoring expressions), and the serve's scans
  * must be partition-PRUNED to the probed token buckets. */
class PostingsIndexSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(n: Int, seed: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("ash", "oak", "fir", "elm", "yew", "bay", "box", "may")
    (1L to n.toLong).map(i =>
      i -> Seq.fill(6 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
  }

  test("bm25 from the persisted index equals the corpus recompute") {
    for (trial <- 1 to 2) {
      val corpus = fixture(20, 50 + trial).toDF("doc_id", "text")
      val dir = java.nio.file.Files.createTempDirectory("pidx").toString
      val idx = PostingsIndex.build(corpus, dir, "doc_id", "text", nBuckets = 8)
      val probes = corpus.filter(col("doc_id") <= 3)
        .select(col("doc_id").as("qid"),
          explode(slice(split(col("text"), " "), 1, 4)).as("tok"))
        .distinct()
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select("qid", "rank", "doc_id", "score_i")
          .as[(Long, Int, Long, Long)].collect().toSet
      assert(rows(idx.bm25TopK(probes, 5)) ==
        rows(Bm25.topK(corpus, "doc_id", "text", probes, 5)), s"trial $trial")
    }
  }

  test("phrase serve from the persisted index equals the corpus scan, " +
      "including overlapping and repeated-token phrases") {
    val corpus = (fixture(15, 99) :+ (100L -> "a a a b a a")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("pidx").toString
    val idx = PostingsIndex.build(corpus, dir, "doc_id", "text", nBuckets = 8)
    val queries = Seq((1L, "ash oak"), (2L, "a a"), (3L, "zz qq"))
      .toDF("qid", "phrase")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "doc_id", "n_occ")
        .as[(Long, Long, Long)].collect().toSet
    val got = rows(idx.phraseMatches(queries))
    assert(got == rows(PhraseSearch.phraseMatches(
      corpus, "doc_id", "text", queries)))
    assert(got.contains((2L, 100L, 3L))) // "a a" overlaps: (0,1),(1,2),(4,5)
  }

  test("positionless build: bm25/jaccard/rm3 identical, positions absent (incl. after merge and a re-build over a positional path)") {
    val corpus = fixture(24, 77).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("pidx").toString
    // first a POSITIONAL build at the same path, then the positionless
    // rebuild — the stale positions table must be deleted, not inherited
    PostingsIndex.build(corpus, dir, "doc_id", "text", nBuckets = 8)
    val standing = corpus.filter(col("doc_id") % 5 =!= 0)
    val batch = corpus.filter(col("doc_id") % 5 === 0)
    val idx = PostingsIndex.build(standing, dir, "doc_id", "text",
      nBuckets = 8, withPositions = false)
    idx.merge(batch, "doc_id", "text")
    val probes = corpus.filter(col("doc_id") <= 3)
      .select(col("doc_id").as("qid"),
        explode(slice(split(col("text"), " "), 1, 4)).as("tok"))
      .distinct()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "rank", "doc_id").as[(Long, Int, Long)].collect().toSet
    assert(rows(idx.bm25TopK(probes, 5)) ==
      rows(Bm25.topK(corpus, "doc_id", "text", probes, 5)))
    assert(!new java.io.File(s"$dir/positions").exists,
      "positionless build/merge must not create or keep a positions table")
    // a phrase serve must fail loudly, never silently mis-serve
    intercept[Exception] {
      idx.phraseMatches(Seq((1L, "ash oak")).toDF("qid", "phrase"))
        .collect()
    }
    idx.compact() // must not fail on the absent table
    assert(rows(idx.bm25TopK(probes, 5)) ==
      rows(Bm25.topK(corpus, "doc_id", "text", probes, 5)))
  }

  test("impact serve equals the corpus recompute; merge invalidates impacts") {
    for (trial <- 1 to 2) {
      val corpus = fixture(22, 130 + trial).toDF("doc_id", "text")
      val dir = java.nio.file.Files.createTempDirectory("pidx").toString
      val idx = PostingsIndex.build(corpus, dir, "doc_id", "text",
        nBuckets = 8, withPositions = false)
      idx.buildImpacts()
      val probes = corpus.filter(col("doc_id") <= 3)
        .select(col("doc_id").as("qid"),
          explode(slice(split(col("text"), " "), 1, 4)).as("tok"))
        .distinct()
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select("qid", "rank", "doc_id", "score_i")
          .as[(Long, Int, Long, Long)].collect().toSet
      assert(rows(idx.bm25TopKImpact(probes, 5)) ==
        rows(Bm25.topK(corpus, "doc_id", "text", probes, 5)),
        s"trial $trial")
      // merge bakes new global stats ⇒ the impacts table must DIE, and
      // the serve must refuse rather than mis-score from stale impacts
      idx.merge(Seq((900L, "ash oak fir")).toDF("doc_id", "text"),
        "doc_id", "text")
      assert(!new java.io.File(s"$dir/impacts").exists,
        "merge must delete the impacts table (stale global stats)")
      intercept[IllegalArgumentException](idx.bm25TopKImpact(probes, 5))
      // rebuild-after-cycle restores the exact serve over the merged corpus
      idx.buildImpacts()
      val merged = corpus.unionByName(
        Seq((900L, "ash oak fir")).toDF("doc_id", "text"))
      assert(rows(idx.bm25TopKImpact(probes, 5)) ==
        rows(Bm25.topK(merged, "doc_id", "text", probes, 5)),
        s"trial $trial post-merge")
    }
  }

  test("merge is rebuild-equivalent: every table row-identical, serves equal") {
    val all = fixture(24, 11)
    val (standing, batch) = all.partition(_._1 % 5 != 0)
    val mergedDir = java.nio.file.Files.createTempDirectory("pidx").toString
    val idx = PostingsIndex.build(standing.toDF("doc_id", "text"),
      mergedDir, "doc_id", "text", nBuckets = 8)
    idx.merge(batch.toDF("doc_id", "text"), "doc_id", "text")
    val rebuiltDir = java.nio.file.Files.createTempDirectory("pidx").toString
    val rebuilt = PostingsIndex.build(all.toDF("doc_id", "text"),
      rebuiltDir, "doc_id", "text", nBuckets = 8)
    def set(df: org.apache.spark.sql.DataFrame, cols: String*) =
      df.select(cols.map(col): _*).collect().map(_.toSeq).toSet
    assert(set(idx.postings, "tok", "doc_id", "tf", "bkt") ==
      set(rebuilt.postings, "tok", "doc_id", "tf", "bkt"))
    assert(set(idx.positions, "tok", "doc_id", "pos", "bkt") ==
      set(rebuilt.positions, "tok", "doc_id", "pos", "bkt"))
    assert(set(idx.docFreq, "tok", "df", "bkt") ==
      set(rebuilt.docFreq, "tok", "df", "bkt"))
    assert(set(idx.lengths, "doc_id", "dl") == set(rebuilt.lengths, "doc_id", "dl"))
    assert(set(idx.stats, "t", "nd") == set(rebuilt.stats, "t", "nd"))
    val probes = all.take(3).map { case (i, t) =>
      (i, t.split(" ").head) }.toDF("qid", "tok")
    assert(set(idx.bm25TopK(probes, 5), "qid", "rank", "doc_id", "score_i") ==
      set(rebuilt.bm25TopK(probes, 5), "qid", "rank", "doc_id", "score_i"))
  }

  test("jaccard from the persisted index equals the corpus recompute " +
      "(distinct-token overlap, dln per-doc fact)") {
    import org.apache.spark.sql.expressions.Window
    for (trial <- 1 to 2) {
      val corpus = fixture(20, 80 + trial).toDF("doc_id", "text")
      val dir = java.nio.file.Files.createTempDirectory("pidx").toString
      val idx = PostingsIndex.build(corpus, dir, "doc_id", "text", nBuckets = 8)
      val probes = corpus.filter(col("doc_id") <= 3)
        .select(col("doc_id").as("qid"),
          explode(slice(split(col("text"), " "), 1, 4)).as("tok"))
        .distinct()
      // independent reference: the q214 corpus-recompute jac chain
      val dTok = corpus.select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("tok"))
      val dN = dTok.groupBy(col("doc_id")).agg(count(lit(1)).as("d_n"))
      val qN = probes.groupBy(col("qid")).agg(count(lit(1)).as("q_n"))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("sim_ppm").desc, col("doc_id"))
      val reference = probes.join(dTok, "tok")
        .filter(col("doc_id") =!= col("qid"))
        .groupBy(col("qid"), col("doc_id")).agg(count(lit(1)).as("i_n"))
        .join(dN, "doc_id").join(qN, "qid")
        .select(col("qid"), col("doc_id"),
          expr("(i_n * 1000000) div (q_n + d_n - i_n)").as("sim_ppm"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select("qid", "rank", "doc_id", "sim_ppm")
          .as[(Long, Int, Long, Long)].collect().toSet
      assert(rows(idx.jaccardTopK(probes, 5)) == rows(reference),
        s"trial $trial")
    }
  }

  test("rm3 expansion from the index equals the corpus recompute") {
    for (trial <- 1 to 2) {
      val corpus = fixture(20, 60 + trial).toDF("doc_id", "text")
      val dir = java.nio.file.Files.createTempDirectory("pidx").toString
      val idx = PostingsIndex.build(corpus, dir, "doc_id", "text", nBuckets = 8)
      val probes = corpus.filter(col("doc_id") <= 3)
        .select(col("doc_id").as("qid"),
          explode(slice(split(col("text"), " "), 1, 3)).as("tok"))
        .distinct()
      def terms(df: org.apache.spark.sql.DataFrame) =
        df.as[(Long, String)].collect().toSet
      assert(terms(idx.rm3ExpandedTerms(probes, corpus, "doc_id", "text",
          k = 8, fbDocs = 4, fbTerms = 3)) ==
        terms(Bm25.rm3ExpandedTerms(corpus, "doc_id", "text", probes,
          k = 8, fbDocs = 4, fbTerms = 3)), s"trial $trial")
    }
  }

  test("MaxScore serve equals the unpruned recompute on random corpora") {
    for (trial <- 1 to 2) {
      val corpus = fixture(20, 70 + trial).toDF("doc_id", "text")
      val dir = java.nio.file.Files.createTempDirectory("pidx").toString
      val idx = PostingsIndex.build(corpus, dir, "doc_id", "text",
        nBuckets = 8, withBounds = true)
      val probes = corpus.filter(col("doc_id") <= 3)
        .select(col("doc_id").as("qid"),
          explode(slice(split(col("text"), " "), 1, 4)).as("tok"))
        .distinct()
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select("qid", "rank", "doc_id", "score_i")
          .as[(Long, Int, Long, Long)].collect().toSet
      for (k <- Seq(3, 5, 12))
        assert(rows(idx.bm25TopKMaxScore(probes, k)) ==
          rows(Bm25.topK(corpus, "doc_id", "text", probes, k)),
          s"trial $trial k=$k")
    }
  }

  test("MaxScore prunes the stopword on an adversarial corpus and stays exact") {
    // every doc carries stopword "zz"; each doc also has rare content
    // terms. Probing [zz + a rare term] must (a) return the exact
    // unpruned top-k and (b) mark zz NON-essential: its ub is tiny
    // (df = corpus) while θ comes from the rare term's fully-scored
    // matches — the corpus-sized posting list never reaches candidate
    // generation or the scoring aggregation.
    val corpus = (1L to 40L).map { i =>
      val rare = s"r${i % 8}" // 5 docs per rare term → θ exists at k=3
      i -> s"zz $rare zz w$i zz x$i"
    }.toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("pidx").toString
    val idx = PostingsIndex.build(corpus, dir, "doc_id", "text",
      nBuckets = 8, withBounds = true)
    val probes = Seq((100L, "zz"), (100L, "r1"), (101L, "zz"), (101L, "r2"))
      .toDF("qid", "tok")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "rank", "doc_id", "score_i")
        .as[(Long, Int, Long, Long)].collect().toSet
    assert(rows(idx.bm25TopKMaxScore(probes, 3)) ==
      rows(Bm25.topK(corpus, "doc_id", "text", probes, 3)))
    val q = probes.select(col("qid").cast("long").as("qid"), col("tok"))
    val ess = idx.maxScoreEssential(q, idx.bucketsOf(q), 3)
      .as[(Long, String)].collect().toSet
    assert(ess == Set((100L, "r1"), (101L, "r2")),
      s"stopword must be pruned from the essential set, got $ess")
  }

  test("merge maintains bounds (rebuild-identical) and the MaxScore serve " +
      "after merge equals the recompute") {
    val all = fixture(24, 17)
    val (standing, batch) = all.partition(_._1 % 5 != 0)
    val mergedDir = java.nio.file.Files.createTempDirectory("pidx").toString
    val idx = PostingsIndex.build(standing.toDF("doc_id", "text"),
      mergedDir, "doc_id", "text", nBuckets = 8, withBounds = true)
    idx.merge(batch.toDF("doc_id", "text"), "doc_id", "text")
    val rebuiltDir = java.nio.file.Files.createTempDirectory("pidx").toString
    val rebuilt = PostingsIndex.build(all.toDF("doc_id", "text"),
      rebuiltDir, "doc_id", "text", nBuckets = 8, withBounds = true)
    def set(df: org.apache.spark.sql.DataFrame, cols: String*) =
      df.select(cols.map(col): _*).collect().map(_.toSeq).toSet
    assert(set(idx.bounds, "tok", "max_tf", "min_dl", "bkt") ==
      set(rebuilt.bounds, "tok", "max_tf", "min_dl", "bkt"))
    val probes = all.take(3).map { case (i, t) =>
      (i, t.split(" ").head) }.toDF("qid", "tok")
    assert(set(idx.bm25TopKMaxScore(probes, 5),
        "qid", "rank", "doc_id", "score_i") ==
      set(Bm25.topK(all.toDF("doc_id", "text"), "doc_id", "text", probes, 5),
        "qid", "rank", "doc_id", "score_i"))
  }

  test("a persisted index rejects a mismatched bucket count; open() reads it") {
    val corpus = fixture(10, 3).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("pidx").toString
    PostingsIndex.build(corpus, dir, "doc_id", "text", nBuckets = 8)
    val probes = Seq((1L, "ash")).toDF("qid", "tok")
    intercept[IllegalArgumentException] {
      new PostingsIndex(spark, dir, 32).bm25TopK(probes, 5).collect()
    }
    assert(PostingsIndex.open(spark, dir).bm25TopK(probes, 5).count() >= 0)
  }

  test("compact after merges: fewer files, identical serves") {
    val all = fixture(24, 13)
    val (standing, rest) = all.partition(_._1 % 4 != 0)
    val dir = java.nio.file.Files.createTempDirectory("pidx").toString
    val idx = PostingsIndex.build(standing.toDF("doc_id", "text"),
      dir, "doc_id", "text", nBuckets = 4)
    rest.grouped(3).foreach(b =>
      idx.merge(b.toDF("doc_id", "text"), "doc_id", "text"))
    def postingFiles(): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$dir/postings"))
        .count(_.getName.endsWith(".parquet"))
    }
    val probes = all.take(3).map { case (i, t) =>
      (i, t.split(" ").head) }.toDF("qid", "tok")
    def serve() = idx.bm25TopK(probes, 5)
      .select("qid", "rank", "doc_id", "score_i")
      .as[(Long, Int, Long, Long)].collect().toSet
    val (filesBefore, before) = (postingFiles(), serve())
    idx.compact()
    assert(postingFiles() < filesBefore,
      s"expected fewer posting files after compact, had $filesBefore")
    assert(serve() == before)
  }

  test("the serve's index scan is partition-pruned to the probed buckets") {
    val corpus = fixture(20, 7).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("pidx").toString
    val idx = PostingsIndex.build(corpus, dir, "doc_id", "text", nBuckets = 8)
    // one single-term probe → at most 1 of the 8 bucket directories read
    val one = idx.bm25TopK(Seq((1L, "ash")).toDF("qid", "tok"), 5)
    val scanned = one.queryExecution.executedPlan.toString()
    // the postings scan node must carry the bkt partition filter (static
    // pruning, the IvfIndex discipline) — not a post-scan Filter
    assert(scanned.contains("PartitionFilters") && scanned.contains("bkt"),
      s"expected a bkt PartitionFilter in:\n$scanned")
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case other =>
        other.children.flatMap(scans) ++ other.subqueries.flatMap(scans)
    }
    val postingFiles = scans(one.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("postings")))
      .map(f => f.relation.location.listFiles(f.partitionFilters, f.dataFilters)
        .map(_.files.size).sum)
    assert(postingFiles.nonEmpty && postingFiles.forall(_ <= 2),
      s"probed-bucket file count should be ~1 of 8, got $postingFiles")
  }
}
