package graft.graph

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** INCREMENTAL connected components over a persisted mapping — the
  * standing-state version of the CC shelf, and the graph analogue of
  * the dedup indexes' ingest story: near-dup pairs (or any edges) arrive
  * in batches, and each batch folds into a persisted (node, root)
  * mapping WITHOUT re-solving the historical edge set. The fold runs CC
  * on the QUOTIENT graph only — batch edges with endpoints mapped
  * through the current roots — which is batch-sized, never
  * corpus-sized: merging k edges touches O(k) quotient nodes however
  * big the standing components are.
  *
  * Correctness is a small THEOREM (spec-pinned against a from-scratch
  * solve): roots are canonical MIN ids (`ConnectedComponents`' label
  * convention), so every quotient node IS the minimum of its standing
  * class, and the quotient CC's min-label per merged class equals the
  * global minimum over the union — incremental ≡ batch CC on all edges
  * ever ingested, root for root.
  *
  * Exactly-once: the mapping is GLOBAL state a retry cannot
  * delta-repair (the prefix-index argument), so it uses the MVCC
  * discipline of `dedup.VersionedSetSimIndex`: each merge writes a full
  * new `v<n>` mapping (copy-on-write — component mappings are
  * node-count-sized, far smaller than their edge history), commits a
  * (batch_id, version) ledger row LAST, readers resolve the highest
  * committed version, orphan/torn version dirs are invisible and
  * overwritten by retries.
  */
final class VersionedCcIndex(spark: SparkSession, path: String) {

  private def fs =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The mapping's fixed on-disk layout — an explicit read schema skips
    * the per-read parquet schema-inference job. */
  private def readVersion(v: Long): DataFrame =
    spark.read.schema("node BIGINT, root BIGINT").parquet(s"$path/v$v")

  // Ledger state cached per instance and folded forward on this
  // instance's own appends — the VersionedSetSimIndex discipline (sound
  // under the single-writer contract; cross-process readers open their
  // own instance and read fresh).
  private var ledgerCache: Option[Map[Long, Long]] = None

  def committed(): Map[Long, Long] = ledgerCache.getOrElse {
    val m = graft.core.Ledger.rows(spark, s"$path/ledger").toMap
    ledgerCache = Some(m)
    m
  }

  def liveVersion(): Long = {
    val c = committed()
    if (c.isEmpty) -1L else c.values.max
  }

  /** The live (node, root) mapping. Requires ≥ 1 committed version. */
  def live(): DataFrame = {
    val v = liveVersion()
    require(v >= 0L, s"no committed version at $path")
    readVersion(v)
  }

  /** Idempotent versioned merge of an edge batch (`src`, `dst`). */
  def mergeOnce(edges: DataFrame, batchId: Long): Boolean = {
    require(batchId >= 0L, s"batchId must be >= 0, got $batchId")
    val c = committed()
    if (c.contains(batchId)) return false
    val vNew = (if (c.isEmpty) -1L else c.values.max) + 1L
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    val next =
      if (vNew == 0L)
        graft.operators.ConnectedComponents.components(e)
          .select(col("id").as("node"), col("component").as("root"))
      else {
        val m = readVersion(vNew - 1)
        // endpoints through the current roots (unmapped nodes are their
        // own root — they were singletons until now)
        val ra = m.select(col("node").as("src"), col("root").as("ra"))
        val rb = m.select(col("node").as("dst"), col("root").as("rb"))
        val quotient = e
          .join(ra, Seq("src"), "left").join(rb, Seq("dst"), "left")
          .select(coalesce(col("ra"), col("src")).as("src"),
            coalesce(col("rb"), col("dst")).as("dst"))
          .filter(col("src") =!= col("dst"))
        // CC on the BATCH-SIZED quotient; every quotient node is the min
        // of its class, so min labels here are global minima (theorem)
        val comp = graft.operators.ConnectedComponents.components(quotient)
          .select(col("id").as("root"), col("component").as("new_root"))
        val updated = m.join(comp, Seq("root"), "left")
          .select(col("node"), coalesce(col("new_root"), col("root")).as("root"))
        // nodes first seen in this batch
        val seen = e.select(col("src").as("node"))
          .unionByName(e.select(col("dst").as("node"))).distinct()
          .join(m.select(col("node")), Seq("node"), "left_anti")
        val added = seen
          .join(comp.select(col("root").as("node"), col("new_root")),
            Seq("node"), "left")
          .select(col("node"), coalesce(col("new_root"), col("node")).as("root"))
        updated.unionByName(added)
      }
    next.write.mode("overwrite").parquet(s"$path/v$vNew")
    // COMMIT POINT
    graft.core.Ledger.append(spark, s"$path/ledger", Seq((batchId, vNew)))
    // durable once append returns — fold into the cached ledger state
    ledgerCache = Some(c + (batchId -> vNew))
    true
  }

  /** Drop every version directory except the live one (the
    * VersionedSetSimIndex.prune contract: single writer, no old
    * readers; committed ids stay committed). */
  def prune(): Unit = {
    val v = liveVersion()
    val st = fs.globStatus(new Path(s"$path/v*"))
    if (st != null) st.foreach { s =>
      val name = s.getPath.getName
      if (name.startsWith("v") && name.drop(1).nonEmpty &&
        name.drop(1).forall(_.isDigit) &&
        name.drop(1).toLong != v) fs.delete(s.getPath, true): Unit
    }
  }
}

object VersionedCcIndex {

  /** Initialize an EMPTY versioned CC index at `path` (prior state
    * removed — a leftover ledger would no-op new batches). */
  def create(spark: SparkSession, path: String): VersionedCcIndex = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true): Unit
    fs.mkdirs(p): Unit
    new VersionedCcIndex(spark, path)
  }
}
