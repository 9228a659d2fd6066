package graft

import org.apache.spark.sql.SparkSession

/** Every declared query must produce identical rows regardless of the
  * shuffle partitioning — the bug class this guards against is real: a
  * non-total window ORDER BY passed the sf0.01 oracle and broke at sf0.1
  * (q13, fixed by a price tiebreak). Runs the full surface at sf0.001
  * under two different shuffle-partition settings and compares. */
class QueryDeterminismSpec extends SparkSpec {

  private def runAll(parts: Int): Map[String, Seq[String]] = {
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    try {
      SparkEntry.allQueries.map { q =>
        q.name -> q.run(spark, sf).collect().map(_.toString).sorted.toSeq
      }.toMap
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", "4")
    }
  }

  test("oracle float boundaries keep a margin after 9-decimal rounding") {
    // Repo float policy (round-then-compare): every place a computed double
    // crosses an oracle threshold compares the 9-decimal-rounded value on
    // BOTH engines (oround / DuckDB round), so a last-bit accumulation
    // difference can only flip a pair sitting within ~1 ulp of a 0.5e-9
    // rounding boundary AND within 1e-9 of the threshold. This canary
    // asserts the data keeps a real margin from the one similarity
    // boundary the oracle-checked surface uses — sim 0.3, shared by q31/
    // q58/q117 (near-dup threshold) and q54 (ε = 0.7 on distance ⇔ sim ≥
    // 0.3) — so a future datagen change that lands values near the
    // boundary is flagged here instead of as a driver hash flake.
    // (Jaccard thresholds are NOT fragile: a single int/int division is
    // correctly rounded identically in both engines.)
    import org.apache.spark.sql.functions._
    val emb = graft.core.Tables.embeddings(spark, sf)
    val a = emb.select(col("label"), col("vec_id").as("ia"), col("embedding").as("ea"))
    val b = emb.select(col("label"), col("vec_id").as("ib"), col("embedding").as("eb"))
    val margin = a.join(b, "label").filter(col("ib") > col("ia"))
      .select(graft.functions.cosine_similarity(col("ea"), col("eb")).as("sim"))
      .agg(min(abs(col("sim") - lit(0.3)))).head.getDouble(0)
    assert(margin > 1e-7,
      f"a same-bucket pair sits $margin%.3g from the 0.3 similarity boundary")
  }

  test("all queries are partition-count invariant at sf0.001") {
    spark.catalog.clearCache()
    val a = runAll(3)
    spark.catalog.clearCache()
    val b = runAll(7)
    val names = SparkEntry.allQueries.map(_.name)
    val diffs = names.filter(n => a(n) != b(n))
    assert(diffs.isEmpty, s"partition-dependent queries: $diffs")
    // sanity: the surface is non-trivial
    assert(names.size >= 55)
    assert(a.values.count(_.nonEmpty) >= 50)
  }
}
