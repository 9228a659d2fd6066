package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact top-k heavy hitters via sketch-then-verify — the "top-k by sketch
  * with exact re-rank" surface (NEXT.md / VERDICT r4 item 8).
  *
  * The naive plan (`groupBy(item).count().orderBy(...).limit(k)`) shuffles
  * EVERY distinct item — at 100 TB of shingles/tokens that's billions of
  * groups through the exchange. This operator instead:
  *
  *  1. sketches per partition (mapPartitions, zero shuffle): exact local
  *     counts in a hash map, emit the local top-`m` plus the partition's
  *     exclusion bound = the (m+1)-th largest local count (an item NOT
  *     emitted by partition p has local count ≤ bound_p);
  *  2. re-ranks exactly: one more pass counts ONLY the candidate items
  *     (broadcast semi-join), so the shuffle carries ≤ partitions×m groups;
  *  3. certifies: any non-candidate's global count ≤ T = Σ_p bound_p, so if
  *     the k-th candidate count ≥ T the result is PROVABLY the exact top-k
  *     (threshold-algorithm argument). Otherwise it falls back to the full
  *     exact aggregation — the answer is always exact, the sketch only
  *     decides how much gets shuffled.
  *
  * Driver-side data is bounded: the certificate reads one summed bound and
  * the k result rows (k is user-small), same spirit as the size-gated
  * driver sets elsewhere in the engine (IvfIndex probed cids).
  */
object SketchTopK {

  /** @return exact (`item`, `n`) top-k by (n desc, item asc) */
  def topK(items: DataFrame, itemCol: String, k: Int,
      perPartitionM: Int = 4096): DataFrame = {
    require(k > 0 && perPartitionM >= k,
      s"need perPartitionM >= k > 0, got m=$perPartitionM k=$k")
    val spark = items.sparkSession
    import spark.implicits._
    val toks = items.select(col(itemCol).cast("string").as("item"))
      .filter(col("item").isNotNull).as[String]

    val sketch = toks.mapPartitions { it =>
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach(t => counts.update(t, counts.getOrElse(t, 0L) + 1L))
      val sorted = counts.toArray.sortBy { case (t, c) => (-c, t) }
      val bound = if (sorted.length > perPartitionM) sorted(perPartitionM)._2 else 0L
      sorted.iterator.take(perPartitionM).map { case (t, c) => (t, c, false) } ++
        Iterator.single(("", bound, true))
    }.toDF("item", "cnt", "is_bound")
      .localCheckpoint() // sketch is ≤ partitions×(m+1) rows; reused twice below

    // coalesce: a ZERO-partition input emits no bound rows at all, so the
    // sum is null — that is the t == 0 "nothing truncated" case, not an NPE
    val t = sketch.filter(col("is_bound"))
      .agg(coalesce(sum(col("cnt")), lit(0L))).head().getLong(0)
    val candidates = sketch.filter(!col("is_bound")).select(col("item")).distinct()
    val exactCandidates = toks.toDF("item")
      .join(broadcast(candidates), Seq("item"), "left_semi")
      .groupBy(col("item")).agg(count(lit(1)).as("n"))
    val top = exactCandidates
      .orderBy(col("n").desc, col("item")).limit(k).collect()

    // fewer than k candidates is only complete if NO partition truncated
    // (t == 0 ⇒ candidates = every distinct item); otherwise the threshold
    // test on the k-th exact count. STRICT inequality: a non-candidate can
    // have global count exactly T (every local count equal to its partition
    // bound), and at kth == T the (n desc, item asc) order could prefer a
    // lexicographically smaller non-candidate — so ties are not certifiable.
    val certified =
      if (top.length < k) t == 0L
      else top.last.getLong(1) > t
    if (certified)
      spark.createDataFrame(java.util.Arrays.asList(top: _*),
        exactCandidates.schema)
    else {
      // bounds too loose (m too small for this distribution): pay the full
      // shuffle once rather than return an uncertified answer
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"sketch-topK certificate failed (kth=${top.last.getLong(1)} <= T=$t); " +
          "falling back to full exact aggregation — raise perPartitionM")
      toks.toDF("item").groupBy(col("item")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("item")).limit(k)
    }
  }
}
