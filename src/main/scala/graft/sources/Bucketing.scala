package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table co-location (the 100 TB repeated-join story).
  *
  * A fact-fact equi-join shuffles BOTH sides every query. Writing the
  * tables bucketed by the join key (`bucketBy` + `saveAsTable`) pays the
  * shuffle once at write time; every subsequent join/aggregation on that
  * key reads co-located buckets and plans with NO Exchange on either side
  * (asserted in BucketingSpec). This is how the engine amortizes the
  * reference's repeatedly-joined per-user tables: bucket by `user_id`
  * (or orderkey for the star schema) once, then every session-merge /
  * graph / threshold pass over them is shuffle-free.
  *
  * Bucket count sizing: at 100 TB target ≤ ~128 MB per bucket file per
  * task — thousands of buckets; locally a handful. AQE cannot change
  * bucket counts at runtime, so both join sides must use the same count
  * (or a divisor, with `spark.sql.bucketing.coalesceBucketsInJoin`).
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table (idempotent: drops the
    * table AND its location first — a crashed prior write leaves a stale
    * directory that blocks managed-table creation). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, sortCols: Seq[String] = Seq.empty): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val warehouse = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = warehouse.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(warehouse)) fs.delete(warehouse, true)
    val w = df.write.mode(SaveMode.Overwrite).bucketBy(buckets, key)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .format("parquet")
      .saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
