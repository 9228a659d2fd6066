package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** The append-only commit ledger shared by the exactly-once index
  * classes (`text.LedgeredPostingsIndex`, `dedup.LedgeredBandIndex`,
  * `dedup.VersionedSetSimIndex`): rows of two longs whose MEANING the
  * caller assigns ((batch_id, n_docs), (batch_id, version), or
  * (compaction_gen, covered_batch_id)). One read shape, one append
  * shape, one atomicity argument — a single `coalesce(1)` parquet
  * append materializes through the committer's temporary-then-rename,
  * so a multi-row commit lands whole or not at all, which is what makes
  * the last-write-is-the-commit-point protocol sound. Reads are bounded
  * by ledger row count (ingest-cycle metadata, never data). */
private[graft] object Ledger {

  def rows(spark: SparkSession, dir: String): Seq[(Long, Long)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    // explicit schema: the ledger's layout is fixed by [[append]], and
    // schema inference on a parquet read is a Spark job (a driver
    // round-trip + footer reads) — measured r17 as one job per ledger
    // read on every exactly-once query (6+ reads each in q232/q234/q248)
    else spark.read.schema("k BIGINT, v BIGINT").parquet(dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
  }

  def append(spark: SparkSession, dir: String,
      newRows: Seq[(Long, Long)]): Unit = {
    import spark.implicits._
    newRows.toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(dir)
  }
}
