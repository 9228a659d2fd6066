package graft.dedup

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** EXACTLY-ONCE ingest for the persisted MinHash band-bucket index — the
  * dedup-shelf twin of `text.LedgeredPostingsIndex` (q223), closing the
  * same at-least-once gap in q194/q217's blind-append band index: batch-
  * keyed partition appends + a committed-id ledger written LAST, so a
  * redelivered micro-batch is a NO-OP and a batch that died mid-append
  * is healed by its retry and invisible to probes until then.
  *
  * The band index is the EASY case of the discipline: band rows are a
  * pure per-document function (no global statistics — unlike
  * `SetSimJoin.prefixIndex`'s corpus frequencies or the postings
  * index's df/stats), so there are no partials to sum and no rewrite to
  * make retry-safe: one table, appends only, ledger last. Consequently
  * stream-merged-with-redeliveries ≡ `Dedup.minhashBandBuckets` over
  * the union of committed batches, row for row as a MULTISET (pinned in
  * LedgeredBandIndexSpec; q227 require-asserts it in-query at every SF).
  *
  * 100 TB shape: per-batch cost is the batch's banding + one appended
  * file set; a probe equi-joins on (band, bucket) against committed
  * partitions; redelivery costs one ledger read (batch-count-sized
  * metadata).
  */
final class LedgeredBandIndex(spark: SparkSession, path: String) {

  private def fs =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def committedIds(): Set[Long] =
    graft.core.Ledger.rows(spark, s"$path/ledger").map(_._1).toSet

  /** The index's committed rows (id, band, bucket) — torn appends are
    * excluded (literal isin on the partition column: static pruning). */
  def committedRows(): DataFrame = {
    val vals: Seq[Any] = committedIds().toSeq.sorted.map(i => s"b$i")
    if (vals.isEmpty || !fs.exists(new Path(s"$path/buckets")))
      // nothing committed yet (or nothing ever appended): typed empty
      spark.range(0).select(col("id"), lit(0).as("band"),
        lit(0L).as("bucket"))
    else
      spark.read.parquet(s"$path/buckets")
        .filter(col("batch").isin(vals: _*))
        .select(col("id"), col("band"), col("bucket"))
  }

  /** Idempotent merge: false (untouched) when `batchId` is committed;
    * otherwise heal any torn partition of this batch, append the batch's
    * fresh band rows under `batch=b<id>`, and commit the ledger row
    * LAST. Contract: batch ids disjoint from already-indexed doc ids
    * across batches (the mergeIntoBandIndex contract), batchId stable
    * across redeliveries (foreachBatch's replay contract). */
  def mergeOnce(batch: DataFrame, idCol: String, textCol: String,
      batchId: Long, bands: Int = 4, rowsPerBand: Int = 2): Boolean = {
    require(batchId >= 0L, s"batchId must be >= 0, got $batchId")
    if (committedIds().contains(batchId)) return false
    val pv = s"b$batchId"
    val torn = fs.globStatus(new Path(s"$path/buckets/batch=$pv"))
    if (torn != null) torn.foreach(s => fs.delete(s.getPath, true))
    // n_docs from the raw batch ids (NOT from the banded frame: that
    // would run the MinHash signatures twice — once for the count, once
    // for the write)
    val n = batch.select(col(idCol)).distinct().count()
    Dedup.minhashBandBuckets(batch, idCol, textCol, bands, rowsPerBand)
      .withColumn("batch", lit(pv))
      .write.mode("append").partitionBy("batch").parquet(s"$path/buckets")
    // COMMIT POINT
    graft.core.Ledger.append(spark, s"$path/ledger", Seq((batchId, n)))
    true
  }

  /** Incremental near-dup candidates of `batch` against the COMMITTED
    * index state — `Dedup.probeIndex`'s equi-join shape. */
  def probe(batch: DataFrame, idCol: String, textCol: String,
      bands: Int = 4, rowsPerBand: Int = 2): DataFrame =
    Dedup.probeIndex(batch, idCol, textCol, committedRows(),
      bands, rowsPerBand)
}

object LedgeredBandIndex {

  /** Initialize an EMPTY ledgered band index at `path`, removing any
    * prior state (a leftover ledger would silently no-op new batches). */
  def create(spark: SparkSession, path: String): LedgeredBandIndex = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true): Unit
    fs.mkdirs(p): Unit
    new LedgeredBandIndex(spark, path)
  }
}
