package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic invariants of the q108/q109 token-packing pair that the
  * row-level oracle parity implies but never states: concatenate-then-
  * chunk must fill every context window EXACTLY (budget tokens), except
  * the last window of each shard, and each document's exploded segments
  * must tile the document without loss. */
class PackingSpec extends SparkSpec {

  test("q109 manifest: every window exactly full except each shard's last") {
    val m = graft.SparkEntry.queries("q109_window_manifest")(spark, sf)
    val fill = m.groupBy(col("shard"), col("window_id"))
      .agg(sum(col("tokens_in")).as("fill"))
    val lastW = fill.groupBy(col("shard")).agg(max(col("window_id")).as("lw"))
    val bad = fill.join(lastW, "shard")
      .filter(col("window_id") =!= col("lw") && col("fill") =!= 512)
      .count()
    assert(bad === 0L)
    // last windows hold the remainder: 1..512 tokens
    val lastBad = fill.join(lastW, "shard")
      .filter(col("window_id") === col("lw") &&
        (col("fill") < 1 || col("fill") > 512))
      .count()
    assert(lastBad === 0L)
  }

  test("q109 segments tile each document: sum(tokens_in) = n_tokens, contiguous") {
    val m = graft.SparkEntry.queries("q109_window_manifest")(spark, sf)
    val n = graft.SparkEntry.queries("q108_token_packing")(spark, sf)
      .select(col("doc_id"), col("n_tokens"))
    val bad = m.groupBy(col("doc_id"))
      .agg(sum(col("tokens_in")).as("tot"), min(col("doc_from")).as("from0"))
      .join(n, "doc_id")
      .filter(col("tot") =!= col("n_tokens") || col("from0") =!= 0)
      .count()
    assert(bad === 0L)
  }
}
