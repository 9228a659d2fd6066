package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Entity resolution / record linkage — the registry-reconciliation stage
  * (Fellegi & Sunter 1969 lineage) a curation pipeline runs when two
  * sources describe the same entities with dirty keys: BLOCK to bound the
  * candidate space, SCORE candidates with an edit distance, MATCH by
  * deterministic reciprocal-best-hit.
  *
  * Blocking passes (composable, union-distinct the results):
  *  - [[equiBlock]]: hash-join on a caller-built blocking key (cheap,
  *    misses records whose key fields are themselves corrupted);
  *  - [[sortedNeighborhood]] (Hernández & Stolfo 1995): global sort of
  *    BOTH registries by name, candidates = cross-side pairs within ±w
  *    ranks — catches what the equi-key missed, O(N·w) pairs total.
  *
  * Scale shapes: equiBlock is one shuffle on the key. Sorted
  * neighborhood's global rank is the TWO-PASS form (range-repartition →
  * per-partition ranks + broadcast partition-size offsets), never a
  * single-partition window; the rank-band pairing goes through
  * [[BandJoin]] (bucketed equi-join, no nested loop). Matching is two
  * per-entity windows over already-blocked candidates. */
object RecordLinkage {

  /** Dense global 1-based rank of `df` by (`orderCol`, tie cols), without
    * a single-partition window: range-repartition by the ordering, rank
    * within each partition, add the partition-prefix offsets (collected
    * from a count pass over the CACHED pid-annotated frame — the cache
    * pins one RangePartitioner sample so both passes see the same
    * boundaries). */
  def withGlobalRank(df: DataFrame, orderCols: Seq[String], rankCol: String,
      partitions: Int = 32): DataFrame = {
    val ordering = orderCols.map(col)
    val pidded = df.repartitionByRange(partitions, ordering: _*)
      .withColumn("__pid", spark_partition_id())
      .cache()
    val sizes = pidded.groupBy(col("__pid")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until partitions).scanLeft(0L) {
      (acc, p) => acc + sizes.getOrElse(p, 0L)
    }
    val offsetExpr = (0 until partitions).foldLeft(lit(0L)) { (acc, p) =>
      when(col("__pid") === p, lit(offsets(p))).otherwise(acc)
    }
    pidded
      .withColumn(rankCol,
        row_number().over(
          Window.partitionBy(col("__pid")).orderBy(ordering: _*)).cast("long")
          + offsetExpr)
      .drop("__pid")
  }

  /** Pass A — equi-key blocking: inputs carry (`<side>id`, `<side>_name`,
    * `bkey`); output distinct candidate pairs. */
  def equiBlock(left: DataFrame, right: DataFrame): DataFrame =
    left.join(right, "bkey")
      .select(col("lid"), col("l_name"), col("rid"), col("r_name"))

  /** Pass B — sorted neighborhood: global rank over the UNION of both
    * registries ordered by (name, side, id); candidates = cross-side
    * pairs within `w` ranks. */
  def sortedNeighborhood(left: DataFrame, right: DataFrame, w: Int): DataFrame = {
    val tagged = left.select(col("lid").as("id"), col("l_name").as("name"),
        lit(0).as("side"))
      .unionAll(right.select(col("rid").as("id"), col("r_name").as("name"),
        lit(1).as("side")))
    val ranked = withGlobalRank(tagged, Seq("name", "side", "id"), "rnk")
    val l = ranked.filter(col("side") === 0)
      .select(col("id").as("lid"), col("name").as("l_name"), col("rnk").as("lrnk"))
    val r = ranked.filter(col("side") === 1)
      .select(col("id").as("rid"), col("name").as("r_name"), col("rnk").as("rrnk"))
    BandJoin.bandJoin(l, r, Seq.empty, col("lrnk"), col("rrnk"), -w, w)
      .select(col("lid"), col("l_name"), col("rid"), col("r_name"))
  }

  /** Reciprocal best hit over scored candidates: Levenshtein ≤ `maxDist`,
    * keep pairs that are rank-1 for BOTH their left and right entity
    * (ties toward the smaller opposite id) — deterministic one-to-one
    * matching without a sequential greedy pass. */
  def mutualBest(candidates: DataFrame, maxDist: Int): DataFrame = {
    val scored = candidates
      .withColumn("dist", levenshtein(col("l_name"), col("r_name")))
      .filter(col("dist") <= maxDist)
    val wl = Window.partitionBy(col("lid")).orderBy(col("dist"), col("rid"))
    val wr = Window.partitionBy(col("rid")).orderBy(col("dist"), col("lid"))
    scored
      .withColumn("__rl", row_number().over(wl))
      .withColumn("__rr", row_number().over(wr))
      .filter(col("__rl") === 1 && col("__rr") === 1)
      .drop("__rl", "__rr")
  }
}
