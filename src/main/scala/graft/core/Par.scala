package graft.core

/** Run independent Spark ACTIONS concurrently from one driver call site
  * (optimization guide §2.6 "overlap independent jobs": actions are only
  * sequential because driver code calls them sequentially; independent
  * jobs back-fill executors freed by each other's straggler tails, and
  * locally they overlap the per-action driver latency that dominates
  * many-small-write maintenance paths).
  *
  * A FRESH pool is created per call: Spark's per-job properties (job
  * group, description) live in an InheritableThreadLocal, and a pool
  * thread inherits them at creation — a cached global pool would pin
  * whatever group the first caller happened to carry. All tasks run to
  * completion even when one fails (a write's partial effects are the
  * same torn state the callers' crash-consistency contracts already
  * detect); the FIRST failure then propagates to the caller. */
object Par {
  def run(tasks: (() => Unit)*): Unit = {
    val live = tasks.filterNot(_ == null)
    if (live.sizeIs <= 1) { live.foreach(_()); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(live.size)
    try {
      val futs = live.map(t =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = t()
        }))
      var firstErr: Throwable = null
      var interrupted = false
      futs.foreach { f =>
        // swallow nothing, skip nothing: an InterruptedException or
        // CancellationException on ONE get() must not abandon the wait on
        // the remaining futures — the documented contract is that every
        // task runs to completion before the first failure propagates
        // (concurrent Spark writes escaping behind the caller's unwind
        // would race the caller's phase-2 overwrites). Uninterruptible
        // wait is correct here: the tasks are bounded Spark actions; the
        // interrupt is re-asserted once the drain completes.
        var got = false
        while (!got) {
          try { f.get(); got = true }
          catch {
            case e: java.util.concurrent.ExecutionException =>
              if (firstErr == null) firstErr = e.getCause
              got = true
            case e: java.util.concurrent.CancellationException =>
              if (firstErr == null) firstErr = e
              got = true
            case _: InterruptedException =>
              interrupted = true
          }
        }
      }
      if (interrupted) Thread.currentThread().interrupt()
      if (firstErr != null) throw firstErr
    } finally { pool.shutdown(): Unit }
  }
}
