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
    *
    * Bucket exactness (the residual can drop bucket false positives but can
    * never recover a pair whose bucket drifted): integral value columns go
    * through decimal arithmetic — exact across the full Long range, where
    * the plain `/` operator's double division could misbucket values beyond
    * 2^53 and silently drop matches. Fractional columns use double
    * arithmetic and assume |v| < 2^53 (every epoch representation fits).
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
    import org.apache.spark.sql.types._
    def isIntegral(df: DataFrame, c: Column): Boolean =
      df.select(c).schema.head.dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
    val exact = isIntegral(left, leftVal) && isIntegral(right, rightVal)
    // decimal(16,0) shift/width casts below overflow (silently nulling the
    // bucket under non-ANSI) beyond 1e15 — same guard the optimizer rule
    // applies; every epoch representation is far below it. Only the exact
    // (integral) path uses those casts, so the fractional/double path keeps
    // accepting large bounds under its documented |v| < 2^53 assumption.
    if (exact)
      require(math.abs(lo) < 1e15.toLong && math.abs(hi) < 1e15.toLong,
        s"band bounds must be below 1e15 for integral value columns, got [$lo, $hi]")
    else
      // The fractional path's |v| < 2^53 assumption extends to the BOUNDS:
      // v + shift is computed in doubles, and once the sum's ulp exceeds the
      // distance to a bucket boundary, floor((v+shift)/W) can land one
      // bucket off (e.g. v = -0.5, hi = 2^60: v+hi rounds to exactly 2^60,
      // buckets {-1, 1} — the right-side row in bucket 0 is silently
      // dropped and the residual filter can never recover it).
      require(math.abs(lo) < (1L << 53) && math.abs(hi) < (1L << 53),
        s"band bounds must be below 2^53 for fractional value columns, got [$lo, $hi]")
    // DECIMAL128 quotient rounding (≤5e-18 relative) is smaller than the
    // 1/width gap between exact quotients k/width and the next integer, so
    // Floor over the decimal quotient never misclassifies a Long input.
    def bucketOf(v: Column, shift: Long): Column =
      if (exact)
        floor((v.cast("decimal(19,0)") + lit(shift).cast("decimal(16,0)"))
          / lit(width).cast("decimal(16,0)")).cast("long")
      else
        floor((v + lit(shift)) / lit(width)).cast("long")
    // left value v can match right values in [v+lo, v+hi] → buckets
    // floor((v+lo)/W) .. floor((v+hi)/W), at most 2 since the span is W.
    val l = left.withColumn("__buckets",
      array_distinct(array(bucketOf(leftVal, lo), bucketOf(leftVal, hi))))
      .withColumn("__bucket", explode(col("__buckets")))
      .drop("__buckets")
    val r = right.withColumn("__bucket", bucketOf(rightVal, 0L))
    val joined = l.join(r, keys :+ "__bucket")
    val delta = rightVal - leftVal
    joined
      .filter(delta >= lit(lo) && delta <= lit(hi) && residual)
      .drop("__bucket")
  }
}
