package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot generator for the committed text-hash goldens
  * (`fixtures/goldens/text_hashes.parquet`): a small deterministic corpus
  * (LCG word salad + planted near-duplicates) with the engine's SimHash and
  * winnowing fingerprints AS COMPUTED AT COMMIT TIME. q95 recomputes both
  * from the fixture's text and the oracle replays the recorded values, so
  * any later drift in the pinned FNV-1a hashing, bit-vote, or window-minima
  * logic hash-mismatches instead of passing silently (these functions have
  * no SQL-expressible truth — the golden IS the contract). */
object GenTextGoldens {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("fixtures/goldens")
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    var seed = 0x9e3779b97f4a7c15L
    def next(): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % words.length).toInt + words.length) % words.length
    }
    val texts = scala.collection.mutable.ArrayBuffer.empty[String]
    (0 until 40).foreach { i =>
      val fresh = (0 until 8 + i % 24).map(_ => words(next())).mkString(" ")
      // every 4th doc is a near-duplicate of its predecessor — exercises the
      // hamming-adjacent and shared-window cases, not just random distance
      texts += (if (i % 4 == 3) texts(i - 1) + " omega" else fresh)
    }
    val corpus = texts.toSeq.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    corpus.select(col("doc_id"), col("text"),
        graft.functions.simhash64(split(col("text"), " ")).as("simhash"),
        concat_ws(",", graft.functions.winnow_fingerprint(col("text"))).as("fp_csv"))
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/text_hashes.parquet")
    println(s"[gen-text-goldens] wrote 40 docs to $outDir/text_hashes.parquet")
    spark.stop()
  }
}
