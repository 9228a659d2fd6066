package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.{Bridge => B}
import graft.functions.{QuantileBucket, ZInterleave}

/** Z-order (Morton-curve) data layout for multi-dimensional data skipping —
  * the lakehouse clustering technique (Delta OPTIMIZE ZORDER BY, Hudi
  * clustering): rows sorted by the interleaved bit-code of their dimension
  * buckets land in files whose per-column min/max ranges are tight in ALL
  * dimensions simultaneously, so parquet row-group stats prune scans with
  * predicates on any clustered column — a single-column sort only helps its
  * leading column.
  *
  * Scale shape: one pass to sample per-column quantile boundaries (tiny,
  * driver-held, broadcast with the plan), then one range-repartition+sort
  * by the z-value — the same shuffle a plain sorted write costs.
  */
object ZOrder {

  /** Equal-frequency bucket boundaries per column (approx quantiles at
    * `relativeError`; boundary count = 2^bits − 1 → bucket ids fit `bits`). */
  def boundaries(df: DataFrame, cols: Seq[String], bits: Int,
      relativeError: Double = 0.001): Map[String, Array[Double]] = {
    val probs = (1 until (1 << bits)).map(_.toDouble / (1 << bits)).toArray
    // multi-column form: ONE aggregation job for all dimensions (the
    // per-column overload would re-scan the table once per dimension)
    val all = df.stat.approxQuantile(cols.toArray, probs, relativeError)
    cols.zip(all.map(_.distinct.sorted)).toMap
  }

  /** The z-value column for `cols` (numeric), `bits` bits per dimension. */
  def zvalue(df: DataFrame, cols: Seq[String], bits: Int): Column = {
    val bounds = boundaries(df, cols, bits)
    // approxQuantile returns no boundaries for an empty input OR for an
    // all-null column. Degrade ONLY the offending column to a constant
    // bucket (0) and keep interleaving the rest — collapsing the whole
    // z-value to lit(0L) would silently destroy clustering on every other
    // dimension. If every column degraded (empty input), fall back to a
    // constant z-value so an empty write still succeeds.
    val degraded = cols.filter(c => bounds(c).isEmpty)
    if (degraded.size == cols.size) lit(0L)
    else {
      if (degraded.nonEmpty)
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"z-order: no quantile boundaries for ${degraded.mkString(",")} " +
            "(all-null column?) — clustering on remaining columns only")
      val buckets = cols.map { c =>
        if (bounds(c).isEmpty)
          org.apache.spark.sql.catalyst.expressions.Literal(0,
            org.apache.spark.sql.types.IntegerType): org.apache.spark.sql.catalyst.expressions.Expression
        else QuantileBucket(B.expression(col(c)), bounds(c).toSeq)
      }
      B.column(ZInterleave(buckets, bits))
    }
  }

  /** Rows clustered along the z-curve: range-partitioned and sorted by the
    * z-value (dropped from the output — layout only, no schema change). */
  def cluster(df: DataFrame, cols: Seq[String], bits: Int = 8,
      numPartitions: Int = 0): DataFrame = {
    val z = zvalue(df, cols, bits)
    val withZ = df.withColumn("__zvalue", z)
    val parts =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    withZ
      .repartitionByRange(parts, col("__zvalue"))
      .sortWithinPartitions(col("__zvalue"))
      .drop("__zvalue")
  }

  /** Z-ordered parquet write. */
  def write(df: DataFrame, cols: Seq[String], path: String, bits: Int = 8): Unit =
    cluster(df, cols, bits).write.mode("overwrite").parquet(path)
}
