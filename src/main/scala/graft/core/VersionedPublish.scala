package graft.core

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** MULTI-PROCESS-SAFE publication of read-only serve artifacts — the
  * VersionedSetSimIndex MVCC discipline applied to the standing shared
  * indexes (VERDICT r14 missing #1): in-place rename publication is
  * crash-consistent but single-process by contract — a second process
  * that listed the live directory just before a republish reads files
  * the rename swept away. At 100× a serving fleet has many drivers on
  * one artifact root; publication must be append-only.
  *
  * Scheme (copy-on-write versioning, MARKER-FILE commit):
  *   - every build lands in its own immutable, uniquely-named artifact
  *     directory `<root>/b_<nonce>` — artifact dirs are NEVER renamed
  *     or mutated after the build completes (a directory rename onto an
  *     existing destination is NOT a safe commit primitive: Hadoop
  *     filesystems — RawLocalFileSystem via FileUtil.copy, HDFS by
  *     rename-into semantics — NEST the source inside an existing
  *     non-empty destination and report success, which would pollute
  *     the winner's artifact in a commit race);
  *   - a publish COMMITS by renaming a one-line temp file to the marker
  *     `<root>/commit_v<N>` whose content is the artifact dir name — a
  *     FILE rename, atomic on every Hadoop filesystem;
  *   - readers resolve the live artifact by listing `commit_v*` markers
  *     and following the highest N, so a reader concurrent with any
  *     number of publishes sees a COMPLETE artifact, never a torn one.
  *     A marker can be PRUNED by a concurrent publisher between the
  *     reader's listing and its read of the marker body — resolution
  *     treats a vanished marker as pruned and resolves the remaining
  *     highest, never crashes on it;
  *   - race on the same version number: on filesystems where the marker
  *     rename refuses an existing destination (HDFS), the loser detects
  *     the existing marker, deletes its staging, and serves the
  *     winner's artifact; on filesystems where the rename silently
  *     replaces a same-instant rival's marker (POSIX), BOTH artifacts
  *     are complete builds of the same inputs (the builders here are
  *     deterministic), one of the two dirs ends up unreferenced, and
  *     every reader still resolves exactly one complete artifact;
  *   - a crashed build leaves an orphan `b_*` dir no marker references
  *     — invisible to every reader, reclaimable by [[sweepOrphans]]
  *     (deletes unreferenced `b_*` dirs older than both the live marker
  *     and a grace window sized above the fleet's longest
  *     build-to-commit latency; see its scaladoc for why the marker-age
  *     cut alone would race an in-flight staging).
  *
  * Staleness contract: every call to [[publish]] builds a NEW version —
  * memoize per process (the call sites do) to get exactly the
  * rebuild-once-per-process semantics the in-place publisher had, so a
  * fixture regeneration between processes can never serve a stale
  * artifact. There is deliberately NO serve-if-any-version-exists
  * shortcut: against a persistent scratch root it would silently pin
  * every future process to the first corpus ever built.
  *
  * Retention: [[publish]] keeps the newest `retain` versions (default
  * 2) and prunes older ones (marker first, then dir). A resolved
  * version therefore stays readable for at least `retain − 1`
  * subsequent publishes; fleets that republish continuously size
  * `retain` to their longest read — and a reader that CACHES its
  * resolved dir (the per-JVM memoizing call sites do, for the process
  * lifetime) is a read of unbounded length: on a shared persistent
  * root, `retain` must cover the longest-lived reader process, or the
  * reader must re-resolve when its cached path disappears (the call
  * sites document this; in this repo every process publishes its own
  * version on first touch and reads only that, so the interaction is
  * latent, not live).
  *
  * Everything here is plain Hadoop-FileSystem protocol — the
  * [[Configuration]]-based overloads run without a SparkSession, which
  * is what lets `tools.PublishStress` drive the contract from bare
  * subprocess JVMs (the real multi-process proof). */
object VersionedPublish {

  private val MarkerRe = "^commit_v(\\d+)$".r

  private def fs(conf: Configuration, root: String) =
    new Path(root).getFileSystem(conf)

  private def hconf(spark: SparkSession): Configuration =
    spark.sparkContext.hadoopConfiguration

  /** Committed (version, artifact dir name) pairs, version-ascending.
    * A marker pruned by a concurrent publisher between the listing and
    * the body read is skipped, not an error. */
  def committed(conf: Configuration, root: String): Seq[(Long, String)] = {
    val f = fs(conf, root)
    val rootPath = new Path(root)
    if (!f.exists(rootPath)) Seq.empty
    else f.listStatus(rootPath).toSeq.flatMap { st =>
      st.getPath.getName match {
        case MarkerRe(n) if st.isFile =>
          try {
            val in = f.open(st.getPath)
            val body =
              try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
              finally in.close()
            if (body.nonEmpty) Some((n.toLong, body)) else None
          } catch {
            case _: java.io.FileNotFoundException => None // pruned mid-list
          }
        case _ => None
      }
    }.sortBy(_._1)
  }

  def committed(spark: SparkSession, root: String): Seq[(Long, String)] =
    committed(hconf(spark), root)

  /** Committed version numbers at `root`, ascending. */
  def versions(conf: Configuration, root: String): Seq[Long] =
    committed(conf, root).map(_._1)

  def versions(spark: SparkSession, root: String): Seq[Long] =
    versions(hconf(spark), root)

  /** The live (highest committed) artifact dir, or None when empty. */
  def currentDir(conf: Configuration, root: String): Option[String] =
    committed(conf, root).lastOption.map { case (_, d) => s"$root/$d" }

  def currentDir(spark: SparkSession, root: String): Option[String] =
    currentDir(hconf(spark), root)

  /** Local-filesystem resolution of the live artifact dir — for oracle
    * SQL builders, which run without a SparkSession (the driver's DuckDB
    * compare reads the same local scratch tree the engine wrote). None
    * when never published; Verify fails fast on a dumped oracle whose
    * scratch path does not exist, so a None here surfaces loudly. */
  def currentDirLocal(root: String): Option[String] = {
    val kids = new java.io.File(root).listFiles()
    if (kids == null) None
    else kids.toSeq.flatMap { k =>
      k.getName match {
        case MarkerRe(n) if k.isFile =>
          try {
            val body = new String(
              java.nio.file.Files.readAllBytes(k.toPath), "UTF-8").trim
            if (body.nonEmpty) Some((n.toLong, body)) else None
          } catch {
            // ONLY a vanished file is "pruned mid-list"; any other I/O
            // failure (permissions, disk) must surface, not silently
            // resolve an older version
            case _: java.nio.file.NoSuchFileException => None
          }
        case _ => None
      }
    }.sortBy(_._1).lastOption.map { case (_, d) => s"$root/$d" }
  }

  /** Publish a NEW version built by `build` (which receives the staging
    * path and must leave the complete artifact there) and return the
    * committed artifact dir. Safe against concurrent publishers and
    * concurrent readers (see the protocol above). */
  /** Marker version numbers present in the listing BY NAME — no body
    * reads, so a marker whose body a concurrent prune swept away still
    * counts. [[publish]] derives the next version from THIS, never from
    * [[committed]]: dropping vanished-body markers there is correct for
    * resolution, but a publisher that derived vNew from it could — under
    * concurrent publisher churn — commit at an already-pruned version
    * number and then prune its own fresh artifact. */
  private def listedVersions(conf: Configuration, root: String): Seq[Long] = {
    val f = fs(conf, root)
    val rootPath = new Path(root)
    if (!f.exists(rootPath)) Seq.empty
    else f.listStatus(rootPath).toSeq.flatMap { st =>
      st.getPath.getName match {
        case MarkerRe(n) if st.isFile => Some(n.toLong)
        case _ => None
      }
    }.sorted
  }

  def publish(conf: Configuration, root: String, retain: Int)
      (build: String => Unit): String = {
    require(retain >= 1, s"retain must be >= 1, got $retain")
    val f = fs(conf, root)
    f.mkdirs(new Path(root)): Unit
    // unique nonce: identity only (two processes must not share a
    // staging dir or temp marker); query-result determinism is
    // unaffected — the artifact CONTENT is what the oracles hash
    val nonce = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getName.replaceAll("[^A-Za-z0-9]", "") + System.nanoTime()
    val stagingName = s"b_$nonce"
    val staging = s"$root/$stagingName"
    build(staging)
    val vNew = listedVersions(conf, root).lastOption.getOrElse(-1L) + 1L
    val tmp = new Path(s"$root/m_$nonce.tmp")
    val out = f.create(tmp, true)
    try out.write(stagingName.getBytes("UTF-8")) finally out.close()
    val marker = new Path(s"$root/commit_v$vNew")
    if (f.rename(tmp, marker)) {
      prune(conf, root, retain)
      staging
    } else {
      f.delete(tmp, true): Unit
      if (f.exists(marker)) {
        // lost the commit race on a no-overwrite filesystem: another
        // writer owns vNew — discard our build, serve the winner's
        f.delete(new Path(staging), true): Unit
        currentDir(conf, root).getOrElse(throw new IllegalStateException(
          s"versioned publish race at $root: marker $marker exists but resolves to nothing"))
      } else {
        // a genuine filesystem refusal must not silently discard the
        // fresh build and serve stale data — fail loudly
        throw new IllegalStateException(
          s"versioned publish failed: rename $tmp -> $marker refused by the filesystem")
      }
    }
  }

  def publish(spark: SparkSession, root: String, retain: Int = 2)
      (build: String => Unit): String =
    publish(hconf(spark), root, retain)(build)

  /** Drop committed versions older than the newest `retain`: marker
    * first (new readers stop resolving it), then the artifact dir
    * (in-flight readers of it are outside the retention window by
    * contract). Orphan `b_*` dirs from crashed or out-raced builds are
    * left alone — no marker references them, so no reader ever sees
    * them; [[sweepOrphans]] reclaims them. */
  private def prune(conf: Configuration, root: String, retain: Int): Unit = {
    val f = fs(conf, root)
    committed(conf, root).dropRight(retain).foreach { case (v, dir) =>
      f.delete(new Path(s"$root/commit_v$v"), false): Unit
      f.delete(new Path(s"$root/$dir"), true): Unit
    }
  }

  /** Reclaim orphan build state: `b_*` dirs (and `m_*.tmp` marker temps)
    * that no commit marker references AND that are strictly older than
    * BOTH the newest marker and `now − graceMs`. Returns the deleted
    * paths.
    *
    * Safety against a concurrent publisher: an in-flight staging dir is
    * unreferenced too. The older-than-the-newest-marker cut alone does
    * NOT protect it — publisher A can finish staging (fixing the dir's
    * mtime), publisher B can commit a marker a moment later, and a
    * sweep between B's commit and A's commit would see A's staging as
    * older-than-newest-marker garbage. The grace window closes that
    * interleaving: a fleet sizes `graceMs` above its longest
    * build-to-commit latency (default 1 h), so anything younger than
    * the grace is presumed in flight regardless of marker history. An
    * out-raced or crashed build stays unreferenced forever and ages
    * past any grace, which is what makes it sweepable. On an empty root
    * (no marker yet) nothing is swept — there is no commit to age
    * against.
    *
    * The sweep is safe to run concurrently with readers: it only
    * deletes dirs no marker references, which no reader can resolve. */
  def sweepOrphans(conf: Configuration, root: String,
      graceMs: Long = 3600L * 1000L): Seq[String] = {
    require(graceMs >= 0L, s"graceMs must be >= 0, got $graceMs")
    val f = fs(conf, root)
    val rootPath = new Path(root)
    if (!f.exists(rootPath)) Seq.empty
    else {
      val statuses = f.listStatus(rootPath).toSeq
      val newestMarkerTime = statuses.collect {
        case st if st.isFile && MarkerRe.findFirstIn(st.getPath.getName).isDefined =>
          st.getModificationTime
      }.maxOption
      newestMarkerTime match {
        case None => Seq.empty // no commit to age against — sweep nothing
        case Some(markerCut) =>
          val cut = math.min(markerCut, System.currentTimeMillis() - graceMs)
          val referenced = committed(conf, root).map(_._2).toSet
          statuses.flatMap { st =>
            val name = st.getPath.getName
            val orphanBuild = st.isDirectory && name.startsWith("b_") &&
              !referenced.contains(name)
            val tmpMarker =
              st.isFile && name.startsWith("m_") && name.endsWith(".tmp")
            if ((orphanBuild || tmpMarker) && st.getModificationTime < cut) {
              f.delete(st.getPath, true): Unit
              Some(st.getPath.toString)
            } else None
          }
      }
    }
  }

  def sweepOrphans(spark: SparkSession, root: String): Seq[String] =
    sweepOrphans(hconf(spark), root)

  def sweepOrphans(spark: SparkSession, root: String,
      graceMs: Long): Seq[String] =
    sweepOrphans(hconf(spark), root, graceMs)
}
