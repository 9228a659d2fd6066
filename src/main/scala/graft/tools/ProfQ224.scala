package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: q224 phase-by-phase timing — the round-15 backlog asks for
  * a fixed-cost shave of q223/q224, and the job-level view (ProfJobs)
  * shows one opaque pool of AQE stage jobs. This replays q224's body
  * with a timer around each EAGER boundary (index builds, bucket
  * collects) and around the single final action that evaluates the
  * five-ranker DAG, so the shave targets the phase that actually pays.
  * Args: sfDir [reps]. */
object ProfQ224 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = graft.core.EngineConf.configure(
        SparkSession.builder().master("local[32]"), 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  [phase] $label%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    for (rep <- 0 until reps) {
      println(s"== q224 phases rep#$rep ==")
      val total0 = System.nanoTime()
      val dd = spark.read.parquet(s"$sfDir/documents.parquet")
      val idx = t("postings build") {
        graft.text.PostingsIndex.build(dd,
          graft.core.Scratch.dir("q224_postings_index", sfDir), "doc_id",
          "text", nBuckets = 16, withPositions = false)
      }
      val probes = dd.filter(col("doc_id") < 5)
        .select(col("doc_id").as("qid"),
          explode(slice(split(col("text"), " "), 1, 8)).as("tok"))
        .distinct()
      val bm25full = t("bm25 serve + pin") {
        val f = idx.bm25TopK(probes, k = 10)
        if (sys.env.contains("PROF_PIN")) f.localCheckpoint(true) else f
      }
      val bm25 = bm25full.select(col("qid"), col("doc_id"), col("rank"))
      val jac = idx.jaccardTopK(probes, k = 10)
        .select(col("qid"), col("doc_id"), col("rank"))
      val rrf = graft.similarity.Fusion
        .reciprocalRank(Seq("bm25" -> bm25, "jac" -> jac), kConst = 60,
          topK = 10)
        .select(col("qid"), col("doc_id"), col("rank"))
      val rm3 = t("rm3 plan (collects)") {
        idx.bm25TopK(idx.rm3ExpandedTermsFrom(bm25full, probes, dd,
            "doc_id", "text", fbDocs = 5, fbTerms = 5), k = 10)
          .select(col("qid"), col("doc_id"), col("rank"))
      }
      def docEmbedDim(i: Int) = graft.queries.TextQueries.docEmbedDim(i)
      val demb = dd.select(col("doc_id"),
        array((0 until 16).map(docEmbedDim): _*).as("emb"))
      val vidx = t("ivf build") {
        graft.sources.IvfIndex.build(demb,
          graft.core.Scratch.tempDir("q224ivf") + "/idx", "doc_id", "emb",
          nCentroids = 8, iters = 1)
      }
      val vec = vidx.topK(demb.filter(col("doc_id") < 5), "doc_id", "emb",
          k = 10, nprobe = 8, simDecimals = Some(9))
        .select(col("qid"), col("nn").as("doc_id"), col("rank"))
      val lists = bm25.withColumn("ranker", lit("bm25"))
        .unionByName(jac.withColumn("ranker", lit("jac")))
        .unionByName(rrf.withColumn("ranker", lit("rrf")))
        .unionByName(vec.withColumn("ranker", lit("vec")))
        .unionByName(rm3.withColumn("ranker", lit("rm3")))
      t("final action") {
        graft.queries.TextQueries.gradeRankers(dd, lists)
          .write.format("noop").mode("overwrite").save()
      }
      println(f"  [phase] TOTAL                  ${(System.nanoTime() - total0) / 1e9}%6.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
