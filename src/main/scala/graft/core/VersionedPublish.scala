package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** MULTI-PROCESS-SAFE publication of read-only serve artifacts — the
  * VersionedSetSimIndex MVCC discipline applied to the standing shared
  * indexes (VERDICT r14 missing #1): [[AtomicPublish]] is crash-
  * consistent but single-writer-single-reader-process by contract — it
  * renames the artifact IN PLACE, so a second process that listed the
  * live directory just before a republish reads files the rename swept
  * away. At 100× a serving fleet has many drivers on one artifact root;
  * publication must be append-only.
  *
  * Scheme (copy-on-write versioning, no pointer file):
  *   - each version is an immutable directory `<root>/v<N>`;
  *   - a publish builds into a UNIQUELY-suffixed staging dir
  *     (`v<N>_build_<nonce>` — two racing writers cannot collide), then
  *     COMMITS by a single atomic rename to `v<N>`;
  *   - readers resolve the live version by listing `v*` and taking the
  *     highest committed N (staging dirs are ignored by name shape), so
  *     a reader concurrent with any number of publishes sees a COMPLETE
  *     old or a COMPLETE new artifact, never a torn one;
  *   - a writer that loses the rename race (v<N> appeared first) deletes
  *     its staging and serves the winner's version — publish is
  *     idempotent across processes;
  *   - a crashed build leaves an orphan staging dir that no reader ever
  *     resolves; the next publish ignores it.
  *
  * Retention: [[publish]] keeps the newest `retain` versions (default 2)
  * and prunes older ones. The read contract is therefore: a resolved
  * version stays readable for at least `retain − 1` subsequent
  * publishes — for the once-per-corpus shared serve indexes (which never
  * republish within a process lifetime) that is unbounded in practice;
  * fleets that republish continuously size `retain` to their longest
  * read. */
object VersionedPublish {

  private val VersionRe = "^v(\\d+)$".r

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Committed version numbers at `root`, ascending (empty when never
    * published). Staging/orphan dirs are excluded by name shape. */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val f = fs(spark, root)
    val rootPath = new Path(root)
    if (!f.exists(rootPath)) Seq.empty
    else f.listStatus(rootPath).toSeq.flatMap { st =>
      st.getPath.getName match {
        case VersionRe(n) if st.isDirectory => Some(n.toLong)
        case _ => None
      }
    }.sorted
  }

  /** The live (highest committed) version dir, or None when empty. */
  def currentDir(spark: SparkSession, root: String): Option[String] =
    versions(spark, root).lastOption.map(v => s"$root/v$v")

  /** Publish a NEW version built by `build` (which receives the staging
    * path and must leave the complete artifact there) and return the
    * committed version dir. Safe against concurrent publishers: the
    * loser of the commit rename serves the winner's version. */
  def publish(spark: SparkSession, root: String, retain: Int = 2)
      (build: String => Unit): String = {
    require(retain >= 1, s"retain must be >= 1, got $retain")
    val f = fs(spark, root)
    f.mkdirs(new Path(root)): Unit
    val vNew = versions(spark, root).lastOption.getOrElse(-1L) + 1L
    // unique nonce: two processes publishing the same vNew must not share
    // a staging dir (this is identity, not randomness — determinism of
    // query RESULTS is unaffected, the artifact content is what's hashed)
    val nonce = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getName.replaceAll("[^A-Za-z0-9]", "") + System.nanoTime()
    val staging = new Path(s"$root/v${vNew}_build_$nonce")
    build(staging.toString)
    val dest = new Path(s"$root/v$vNew")
    if (f.rename(staging, dest)) {
      prune(spark, root, retain)
      dest.toString
    } else {
      // lost the race (or fs refused): if the version landed via another
      // writer, serve it; otherwise fail loudly — a silently missing
      // artifact would surface as a confusing read error later
      f.delete(staging, true): Unit
      currentDir(spark, root).getOrElse(
        throw new IllegalStateException(
          s"versioned publish failed: rename $staging -> $dest refused " +
            s"and no committed version exists at $root"))
    }
  }

  /** Local-filesystem resolution of the live version dir — for oracle
    * SQL builders, which run without a SparkSession (the driver's DuckDB
    * compare reads the same local scratch tree the engine wrote). None
    * when never published; Verify fails fast on a dumped oracle whose
    * scratch path does not exist, so a None here surfaces loudly. */
  def currentDirLocal(root: String): Option[String] = {
    val kids = new java.io.File(root).listFiles()
    if (kids == null) None
    else kids.toSeq.flatMap { k =>
      k.getName match {
        case VersionRe(n) if k.isDirectory => Some(n.toLong)
        case _ => None
      }
    }.sorted.lastOption.map(v => s"$root/v$v")
  }

  /** Serve the live version dir, publishing one first iff none exists.
    * The common path for the once-per-corpus shared serve indexes: every
    * process after the first resolves build-free; two processes racing
    * on an empty root both end with a complete artifact (at worst one
    * redundant build, never a torn read). */
  def getOrPublish(spark: SparkSession, root: String)
      (build: String => Unit): String =
    currentDir(spark, root).getOrElse(publish(spark, root)(build))

  /** Drop committed versions older than the newest `retain`. Orphan
    * staging dirs older than the oldest retained version's commit are
    * left alone (cheap, invisible to readers; a cleanup sweep can list
    * `v*_build_*` separately if scratch space matters). */
  private def prune(spark: SparkSession, root: String, retain: Int): Unit = {
    val f = fs(spark, root)
    versions(spark, root).dropRight(retain).foreach { v =>
      f.delete(new Path(s"$root/v$v"), true): Unit
    }
  }
}
