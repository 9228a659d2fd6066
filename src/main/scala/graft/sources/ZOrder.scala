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

  // ---------------------------------------------------------------------
  // Deterministic PARTITIONED variant + pruned box scan (q240).
  //
  // [[cluster]]'s equal-frequency buckets come from approxQuantile —
  // engine-pinned, so its pruning win is only spec-MEASURED (ZOrderSpec),
  // never oracle-HASHED, and the skipping itself happens implicitly in
  // parquet row-group stats. The variant below swaps the buckets for the
  // monotone max-grid quantizer `q(v) = (v·256) div (max+1)` and makes the
  // curve cell an explicit partition directory, which buys the two things
  // the production path cannot give: (1) a DuckDB oracle replays the
  // whole layout→prune→scan chain (q240's hash gate IS the no-loss
  // theorem: monotone quantization ⇒ every box row's cell is in the
  // covering set), and (2) the directory prune is visible in the scan
  // node rather than left to row-group statistics. Same codegen'd
  // ZInterleave kernel, same curve.
  // ---------------------------------------------------------------------

  /** Monotone 8-bit quantizer `(v·256) div (max+1)` over a named column. */
  def quant8(colName: String, maxV: Long): Column =
    expr(s"(CAST(`$colName` AS BIGINT) * 256) div ${maxV + 1}")

  /** Write `df` z-ordered on quantized (xCol, yCol): partition
    * directories by the 8-bit z-cell (top coordinate nibbles), z-sort
    * within partitions so row-group min/max stats follow the curve. */
  def writePartitioned(df: DataFrame, xCol: String, yCol: String,
      maxX: Long, maxY: Long, path: String): Unit = {
    val z = B.column(ZInterleave(Seq(
      B.expression(quant8(xCol, maxX).cast("int")),
      B.expression(quant8(yCol, maxY).cast("int"))), 8))
    df.withColumn("zval", z)
      .withColumn("zcell", expr("zval div 256"))
      .repartition(col("zcell"))
      .sortWithinPartitions(col("zval"))
      .write.mode("overwrite").partitionBy("zcell").parquet(path)
  }

  /** The z-cells a quantized box [qxLo,qxHi]×[qyLo,qyHi] can touch —
    * every cell whose 16×16 block intersects the box (≤ 256, a layout
    * constant, enumerated driver-side). Size equals the closed form
    * `(qxHi>>4 − qxLo>>4 + 1)·(qyHi>>4 − qyLo>>4 + 1)` q240's oracle
    * pins. `zval div 256` keeps exactly the top nibbles' interleave, so
    * a cell code is `ZInterleave.interleave([qx>>4, qy>>4], 4)`. */
  def coveringCells(qxLo: Long, qxHi: Long, qyLo: Long,
      qyHi: Long): Seq[Long] = {
    require(0 <= qxLo && qxLo <= qxHi && qxHi <= 255, s"x box [$qxLo,$qxHi]")
    require(0 <= qyLo && qyLo <= qyHi && qyHi <= 255, s"y box [$qyLo,$qyHi]")
    for (cx <- (qxLo >> 4) to (qxHi >> 4); cy <- (qyLo >> 4) to (qyHi >> 4))
      yield ZInterleave.interleave(Array(cx.toInt, cy.toInt), 4)
  }

  /** Pruned box scan over a [[writePartitioned]] layout: directory-prune
    * to the covering cells, then the exact box predicate. Equals the
    * full-scan filter by the monotone-quantization theorem (spec-pinned
    * on random boxes; hash-gated end to end by q240). */
  def boxScan(spark: org.apache.spark.sql.SparkSession, path: String,
      xCol: String, yCol: String, maxX: Long, maxY: Long, xLo: Long,
      xHi: Long, yLo: Long, yHi: Long): DataFrame = {
    def q(v: Long, maxV: Long): Long = v * 256 / (maxV + 1)
    val cells = coveringCells(q(xLo, maxX), q(xHi, maxX), q(yLo, maxY),
      q(yHi, maxY))
    spark.read.parquet(path)
      .filter(col("zcell").isin(cells: _*) &&
        col(xCol) >= xLo && col(xCol) <= xHi &&
        col(yCol) >= yLo && col(yCol) <= yHi)
  }
}
