package graft.core

import org.apache.spark.sql.{Column, DataFrame}

/** Deployment-dependent execution limits (SURVEY §2.2 op 15 /
  * reference consts.py:29 + utils/custom_config.py:9-16: LOCAL caps at
  * 100 rows, BRANCH at 1,000, PROD unlimited — dev runs stay cheap while
  * the production plan is identical).
  *
  * The reference's `slice(0, N)` is file-order-dependent; Spark's `limit`
  * is not order-stable, so the engine's contract requires an explicit
  * ordering when limits feed anything order-sensitive (tests, oracles).
  */
object EngineConf {

  sealed trait Deployment { def rowLimit: Option[Int] }
  case object Local extends Deployment { val rowLimit = Some(100) }
  case object Branch extends Deployment { val rowLimit = Some(1000) }
  case object Prod extends Deployment { val rowLimit = None }

  def fromEnv(env: Map[String, String] = sys.env): Deployment =
    env.getOrElse("GRAFT_DEPLOYMENT", "PROD").toUpperCase match {
      case "LOCAL" => Local
      case "BRANCH" => Branch
      case _ => Prod
    }

  /** Apply the deployment row limit after a deterministic ordering. */
  def applyLimit(df: DataFrame, deployment: Deployment, orderBy: Seq[Column]): DataFrame =
    deployment.rowLimit match {
      case Some(n) if orderBy.nonEmpty => df.orderBy(orderBy: _*).limit(n)
      case Some(n) => df.limit(n)
      case None => df
    }

  /** The cluster-scale session knobs, shared by Verify/Bench and any
    * deployment (local runs use the same settings so plans match what a
    * 1000-executor cluster would produce):
    *
    *  - AQE on: runtime coalescing of small shuffle partitions, runtime
    *    broadcast demotion/promotion, and — critically for the per-user
    *    workloads — skew-join splitting for hot users;
    *  - `shufflePartitions` sized to the parallelism at hand (the cluster
    *    default of 200 is wrong in both directions: too many for local
    *    runs, far too few at 100 TB — AQE coalescing makes a high static
    *    value safe);
    *  - 128 MiB scan partitions: large enough to amortize task overhead,
    *    small enough that a partition's working set fits executor memory
    *    alongside shuffle buffers (the spill-awareness knob);
    *  - GraftExtensions active: every engine session (Verify/Bench/tools)
    *    runs with the custom SQL functions and the BandJoinRewrite
    *    optimizer rule registered — the same `spark.sql.extensions` line a
    *    cluster deployment uses, so the benched/verified plans are the
    *    deployed plans. */
  def configure(b: org.apache.spark.sql.SparkSession.Builder,
      shufflePartitions: Int): org.apache.spark.sql.SparkSession.Builder =
    b.config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (128L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      // Streaming checkpoint I/O (optimization guide §7.3, measured r16):
      // the default FileContext-based checkpoint manager applies a POSIX
      // permission to EVERY checkpoint file it creates, and without
      // libhadoop native IO Hadoop's local filesystem implements that by
      // FORKING a chmod per file — thread dumps of the streaming queries
      // showed ChecksumCheckpointFileManager pool threads dominated by
      // ProcessImpl.forkAndExec. The FileSystem-based manager (the
      // documented fallback, same rename-commit atomicity contract) skips
      // the per-file permission round-trip; measured warm sf0.1: q156
      // 8.0→5.5s, q157 8.0→3.1, q133 4.5→2.9, q227 5.7→4.5, q230 7.3→5.7,
      // q223 15.2→12.7. On HDFS/object stores permissions are metadata
      // RPCs, so the choice is at worst neutral there; fleets that want
      // the FileContext manager back override GRAFT_CHECKPOINT_FM.
      .config("spark.sql.streaming.checkpointFileManagerClass",
        sys.env.getOrElse("GRAFT_CHECKPOINT_FM",
          "org.apache.spark.sql.execution.streaming.checkpointing.FileSystemBasedCheckpointFileManager"))
      // No-data micro-batches exist to advance the watermark (and fire
      // evictions/timeouts) on an IDLE live stream — a latency feature.
      // Every declared streaming query here is a bounded replay that
      // advances its watermark with explicit sentinel DATA batches, so
      // the automatic empty trigger after each data batch only re-commits
      // every state-store partition for nothing (measured warm sf0.1:
      // q156 5.5→3.4s, q157 2.6→2.1, q220 9.2→7.3, q230 5.7→4.5; emitted
      // row SETS are unchanged — the oracle hash gate pins that).
      // Live-serving fleets that want idle-time eviction re-enable via
      // GRAFT_STREAM_NODATA_BATCHES=true.
      .config("spark.sql.streaming.noDataMicroBatches.enabled",
        sys.env.getOrElse("GRAFT_STREAM_NODATA_BATCHES", "false"))
}
