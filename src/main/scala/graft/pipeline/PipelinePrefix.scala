package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import graft.enrich.{Embedder, LLMClient}
import graft.operators.{Sessionize, SessionOps}

/** OPT-IN memoization of the expensive enrichment prefix shared by the
  * recent-path consumers (sessions / merged / graph all start with the
  * same Sessionize → ids → embeddings computation).
  *
  * Default OFF (`graft.pipeline.cachePrefix` unset/false): every consumer
  * re-runs its own prefix — the independent-query contract the bench and
  * the driver measure, and the reference's own per-asset materialization
  * behavior. Flag ON: the first consumer materializes the prefix into the
  * Spark cache and later consumers with the SAME input plan + parameters
  * reuse it — one Sessionize pass for the q50/q51/q52 group instead of
  * three.
  *
  * Contract when ON (why it is not the default):
  *  - enrichment clients are keyed by CLASS, not instance — callers assert
  *    that two clients of the same class are deterministic and
  *    interchangeable (true of the engine's stub seams; NOT necessarily of
  *    a rate-limited production client with per-instance config);
  *  - entries live until [[clear]] or session end (bounded by the number
  *    of distinct (input plan, params) prefixes — in practice one);
  *  - queries whose OUTPUT is the side effect of running the prefix must
  *    not go through the memo: q86's `observe` counters only fire when the
  *    plan actually executes, and a cache hit would silently zero them —
  *    q86 therefore always re-runs its own pass.
  */
object PipelinePrefix {

  /** Session-conf flag; read at call time, default false. */
  val Flag = "graft.pipeline.cachePrefix"

  private val memo = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  // engine-assigned per-SparkSession id (SparkSession.sessionUUID is not
  // public API): weak keys so a collected session doesn't pin its entry
  private val sessionIds = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, java.lang.Long]())
  private val nextSessionId = new java.util.concurrent.atomic.AtomicLong()
  private def sessionId(s: SparkSession): Long =
    sessionIds.computeIfAbsent(s, _ => nextSessionId.incrementAndGet())

  def enabled(spark: SparkSession): Boolean =
    spark.conf.get(Flag, "false").toBoolean

  /** Sessionize, memoized when the flag is on (delegates untouched when
    * off — byte-identical plans, pinned in PipelinePrefixSpec). */
  def sessions(activity: DataFrame, llm: LLMClient, chunkSize: Int = 15): DataFrame =
    memoized(activity.sparkSession,
      key("sessions", activity, chunkSize, llm.getClass.getName)) {
      Sessionize.sessions(activity, llm, chunkSize)
    }

  /** The full embedded prefix (Sessionize → ids → embeddings) — what
    * RecentPath.run consumes. Builds on the [[sessions]] memo, so a prior
    * q50-shaped call already saves the Sessionize pass here. */
  def embeddedSessions(activity: DataFrame, llm: LLMClient, embedder: Embedder,
      chunkSize: Int = 15): DataFrame =
    memoized(activity.sparkSession,
      key("embedded", activity, chunkSize, llm.getClass.getName,
        embedder.getClass.getName)) {
      SessionOps.withEmbeddings(
        SessionOps.withIds(sessions(activity, llm, chunkSize)), embedder)
    }

  /** Unpersist and drop every memoized prefix. */
  def clear(): Unit = {
    memo.values.forEach(df => { df.unpersist(); () })
    memo.clear()
  }

  private def key(stage: String, activity: DataFrame, chunkSize: Int,
      classNames: String*): String = {
    // canonicalized analyzed plan = structural identity of the INPUT, so
    // two consumers building the same activity frame from the same tables
    // hit the same entry regardless of expression ids. The owning
    // SparkSession's UUID is part of the key: a second (or restarted)
    // session computing the same plan must NOT receive a DataFrame bound
    // to another — possibly stopped — session.
    val plan = activity.queryExecution.analyzed.canonicalized.toString
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(plan.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (Seq(stage, s"s${sessionId(activity.sparkSession)}", digest,
      chunkSize.toString) ++ classNames).mkString("|")
  }

  private def memoized(spark: SparkSession, k: String)(build: => DataFrame): DataFrame =
    if (!enabled(spark)) build
    else {
      // evict entries whose owning context has stopped — they can never be
      // served again (their key embeds the dead session's UUID) and would
      // otherwise accumulate across session restarts in this JVM
      memo.entrySet().removeIf(e =>
        e.getValue.sparkSession.sparkContext.isStopped)
      memo.computeIfAbsent(k, _ => build.cache())
    }
}
