package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Crash-consistent publication of a scratch artifact directory: build
  * into `<path>_build`, then delete-and-RENAME into place, so a reader
  * never sees a torn or partial directory at the served path (the
  * VersionedSetSimIndex discipline, shared by `postingsShared` and
  * `coPurchaseShared` so the two publish paths cannot drift apart).
  *
  * The rename's return value is CHECKED: a filesystem that refuses the
  * rename (cross-mount scratch override, vanished parent) must fail the
  * publish loudly — silently memoizing a missing artifact would turn
  * every later consumer into a confusing missing-file error with no
  * retry.
  *
  * Concurrency contract: single writer per scratch root (callers
  * memoize per-JVM; concurrent PROCESSES sharing one scratch dir are
  * outside the contract, documented at each call site).
  */
object AtomicPublish {

  /** Run `build` against the staging dir, then atomically publish it at
    * `path`. `build` receives the staging path and must leave the
    * complete artifact there.
    *
    * Re-publish over an existing artifact parks the old directory at
    * `<path>_old` BEFORE renaming staging in and deletes it only after
    * the new artifact is in place, so a crash at any point leaves a
    * complete artifact on disk: either the old one (at `path` or, worst
    * case, recoverable at `path_old`) or the new one at `path`. The
    * earlier delete-then-rename order had a window where NEITHER
    * survived. */
  def publish(spark: SparkSession, path: String)(build: String => Unit): Unit = {
    val dest = new Path(path)
    val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new Path(path + "_build")
    val parked = new Path(path + "_old")
    if (fs.exists(staging)) fs.delete(staging, true): Unit
    build(staging.toString)
    if (fs.exists(parked)) fs.delete(parked, true): Unit
    if (fs.exists(dest)) {
      require(fs.rename(dest, parked),
        s"atomic publish failed: park $dest -> $parked returned false")
    }
    require(fs.rename(staging, dest),
      s"atomic publish failed: rename $staging -> $dest returned false")
    if (fs.exists(parked)) fs.delete(parked, true): Unit
  }
}
