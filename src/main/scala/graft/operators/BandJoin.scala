package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded range self-join (SURVEY §2.3 ops 16-17, §4 "range/band self-join").
  *
  * The reference's merge-candidate query is a theta-join
  * (`epoch(b.start − a.end) ≤ τ` + ordering predicates,
  * assets/recent_history.py:384-411). Catalyst plans a pure theta self-join
  * as BroadcastNestedLoopJoin — O(n²) and a single-node bottleneck at scale.
  *
  * This operator rewrites a band predicate
  * `rightVal − leftVal ∈ [lo, hi]` into an equi-join:
  * both sides bucket their value by the band width `B = hi − lo`; the left
  * side explodes into the (at most 2) buckets its band can reach; the join
  * is then hash/sort-merge on `(keys..., bucket)` and the exact band + any
  * residual predicates are applied after. At 100 TB: one shuffle on the
  * equi-keys, no nested loop, AQE handles skewed buckets.
  */
object BandJoin {

  /** Join `left` and `right` on equal `keys` plus
    * `right(rightVal) - left(leftVal) BETWEEN lo AND hi` (+ `residual`).
    * `leftVal`/`rightVal` must be numeric (e.g. epoch seconds).
    * Column name collisions must be resolved by the caller (alias first).
    */
  def bandJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftVal: Column,
      rightVal: Column,
      lo: Long,
      hi: Long,
      residual: Column = lit(true)): DataFrame = {
    require(hi >= lo, s"empty band [$lo, $hi]")
    val width = math.max(hi - lo, 1L)
    // left value v can match right values in [v+lo, v+hi] → buckets
    // floor((v+lo)/W) .. floor((v+hi)/W), at most 2 since the span is W.
    val l = left.withColumn("__buckets",
      array_distinct(array(
        floor((leftVal + lit(lo)) / lit(width)).cast("long"),
        floor((leftVal + lit(hi)) / lit(width)).cast("long"))))
      .withColumn("__bucket", explode(col("__buckets")))
      .drop("__buckets")
    val r = right.withColumn("__bucket", floor(rightVal / lit(width)).cast("long"))
    val joined = l.join(r, keys :+ "__bucket")
    val delta = rightVal - leftVal
    joined
      .filter(delta >= lit(lo) && delta <= lit(hi) && residual)
      .drop("__bucket")
  }
}
