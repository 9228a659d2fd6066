package graft.enrich

/** Client-side request-rate budget for enrichment operators (the reference
  * wraps every Mistral chat/embed call in a 5 req/s `AsyncLimiter`,
  * utils/recent_history_utils.py:101,216 — previously documented on the
  * trait seam here but unenforced).
  *
  * Enforcement is per limiter instance, i.e. per task after executor-side
  * deserialization: callers size `requestsPerSecond` as
  * globalBudget / maxConcurrentTasks (executors × cores), the same division
  * the trait doc prescribes. A blocking interval bucket (not a semaphore):
  * requests are spaced `1/rate` apart with no burst accumulation, matching
  * AsyncLimiter's steady-state behavior.
  */
final class RateLimiter(val permitsPerSecond: Double) extends Serializable {
  require(permitsPerSecond > 0, "rate must be positive")
  @transient private var nextFreeNs = 0L
  private def intervalNs: Long = (1e9 / permitsPerSecond).toLong

  /** Blocks until the next permit instant; first acquire never blocks. */
  def acquire(): Unit = synchronized {
    val now = System.nanoTime()
    if (nextFreeNs == 0L || now >= nextFreeNs) {
      nextFreeNs = now + intervalNs
    } else {
      val target = nextFreeNs
      nextFreeNs += intervalNs
      // parkNanos may return early (pending unpark permit from the task
      // scheduler, or spuriously) — re-check the deadline in a loop or the
      // rate guarantee silently breaks
      var remaining = target - System.nanoTime()
      while (remaining > 0) {
        java.util.concurrent.locks.LockSupport.parkNanos(remaining)
        remaining = target - System.nanoTime()
      }
    }
  }
}

/** One rate-limited request per PROMPT (the reference's chat path issues
  * one HTTP call per chunk prompt under the limiter). */
final class RateLimitedLLM(inner: LLMClient, requestsPerSecond: Double)
    extends LLMClient {
  private val limiter = new RateLimiter(requestsPerSecond)
  override def complete(prompts: Seq[String]): Seq[String] =
    prompts.map { p => limiter.acquire(); inner.complete(Seq(p)).head }
}

/** One rate-limited request per BATCH (the reference embeds ≤100 texts per
  * API call; `SessionOps.withEmbeddings` already groups to that shape, so
  * each `embed` invocation is one request). */
final class RateLimitedEmbedder(inner: Embedder, requestsPerSecond: Double)
    extends Embedder {
  private val limiter = new RateLimiter(requestsPerSecond)
  override def dim: Int = inner.dim
  override def embed(texts: Seq[String]): Seq[Array[Float]] = {
    limiter.acquire()
    inner.embed(texts)
  }
}
