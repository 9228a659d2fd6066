package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.offset_by

/** Data-relative recency split (SURVEY §2.2 op 10 / assets/takeout.py:70-76):
  * "recent" = rows with `ts > max(ts) + offset` *per key* — relative to the
  * newest data, not the wall clock (late data shifts the split point).
  *
  * One window-max per key partition (single shuffle on the key); at 100 TB
  * the alternative (global agg + broadcast) only wins when there is no key.
  */
object RecencySplit {

  /** Adds `is_recent`. `offset` is a Polars offset string, e.g. "-15d". */
  def withFlag(df: DataFrame, tsCol: Column, keyCol: Column, offset: String): DataFrame = {
    val mx = max(tsCol).over(Window.partitionBy(keyCol))
    df.withColumn("is_recent", tsCol > offset_by(mx, offset))
  }

  /** (full, recent) — the reference materializes both. */
  def split(df: DataFrame, tsCol: Column, keyCol: Column, offset: String): (DataFrame, DataFrame) = {
    val flagged = withFlag(df, tsCol, keyCol, offset)
    (flagged.drop("is_recent"), flagged.filter(col("is_recent")).drop("is_recent"))
  }
}
