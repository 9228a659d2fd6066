package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the most recent right row with
  * `right.ts <= left.ts` on the same key (optionally within `tolerance`
  * seconds) — the standard event-stream enrichment operator Spark lacks
  * natively (guide: "as-of join" is the canonical custom-operator example).
  *
  * Algorithm (scalable, NOT a range self-join): union both sides tagged,
  * one window per key ordered by (ts, side-tag) carrying the last seen
  * right payload forward (`last_value ignoring nulls`), then keep left
  * rows. One shuffle + one sort — the sort-merge as-of; no pair blowup,
  * no nested loop, hot keys still sort in O(n log n).
  *
  * Ties (right.ts == left.ts): the right row sorts before the left row at
  * equal timestamps (tag ordering), so an exactly-simultaneous right row
  * IS visible to the left row — matching the `<=` contract.
  */
object AsOfJoin {

  /** @param left      left frame
    * @param right     right frame
    * @param keys      equi keys present on both sides
    * @param leftTs    left event-time column (timestamp or numeric)
    * @param rightTs   right event-time column
    * @param payload   right-side columns to carry (renamed as given)
    * @param tolerance max lookback in seconds (None = unbounded)
    * @param rightTiebreak right column ordering simultaneous right rows
    *                  (the greatest wins, matching an
    *                  `ORDER BY ts DESC, tb DESC LIMIT 1` oracle)
    */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      tolerance: Option[Long] = None,
      rightTiebreak: Option[String] = None): DataFrame = {
    val leftCols = left.columns
    val l = left
      .withColumn("__ts", col(leftTs).cast("double"))
      .withColumn("__tb", lit(0.0))
      .withColumn("__side", lit(1))
      .withColumn("__payload", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          right.select(payload.map(col): _*).schema.fields)))
    val tb: Column = rightTiebreak.map(col(_).cast("double")).getOrElse(lit(0.0))
    val r = right
      .select((keys.map(col) :+ col(rightTs).cast("double").as("__ts")) :+
        struct(payload.map(col): _*).as("__payload") :+ tb.as("__tb"): _*)
      .withColumn("__side", lit(0))
    // align schemas: left keeps all its columns; right rows carry nulls there
    val lNorm = l.select(
      (keys.map(col) ++ Seq(col("__ts"), col("__side"), col("__tb"), col("__payload")) ++
        leftCols.filterNot(keys.contains).map(col)): _*)
    val rNorm = r.select(
      (keys.map(col) ++ Seq(col("__ts"), col("__side"), col("__tb"), col("__payload")) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).cast(
          left.schema(c).dataType).as(c))): _*)
    val unioned = lNorm.unionByName(rNorm)

    // right rows (side 0) sort before left rows (side 1) at equal ts;
    // simultaneous right rows ordered by tiebreak (last = greatest wins)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .withColumn("__match_ts", last(
        when(col("__side") === 0, col("__ts")), ignoreNulls = true).over(w))

    val withinTol = tolerance match {
      case Some(t) => col("__match_ts").isNotNull &&
        (col("__ts") - col("__match_ts")) <= t.toDouble
      case None => col("__match_ts").isNotNull
    }
    val matched = carried
      .filter(col("__side") === 1)
      .withColumn("__ok", withinTol)
    val out = matched.select(
      (leftCols.toIndexedSeq.map(col) ++ payload.map(p =>
        when(col("__ok"), col("__match").getField(p)).as(p))): _*)
    out
  }
}
