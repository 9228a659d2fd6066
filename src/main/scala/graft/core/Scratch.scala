package graft.core

/** Per-query scratch tables shared between the engine and the DuckDB
  * oracle.
  *
  * Some verification stages are only value-checkable if both engines read
  * the SAME intermediate (e.g. LSH candidate pairs whose bucket keys come
  * from engine-pinned hash functions): the query writes the intermediate
  * to a scratch parquet dir, and its oracle SQL `read_parquet`s that dir.
  *
  * The oracle string cannot take the sf directory as a parameter (the
  * driver contract dumps plain SQL), so the path is keyed by the sf name
  * and the LAST sf a query ran against is recorded here. This is safe
  * under the driver's contract: `Verify` runs every query and THEN dumps
  * `oracle_sql.json` from the same process, so the dumped SQL points at
  * the scratch dir of exactly the run being compared — and a later Bench
  * run at a different sf writes to a DIFFERENT per-sf dir, never
  * clobbering the one the oracle is about to read.
  */
object Scratch {

  private val lastSf = new java.util.concurrent.ConcurrentHashMap[String, String]()

  // under the repo's build dir, NOT java.io.tmpdir: the oracle's DuckDB
  // process may run minutes after the engine wrote the table, and a tmp
  // cleaner (or a per-process tmpdir) would turn every scratch oracle red.
  // Absolute path so the embedded SQL is cwd-independent. GRAFT_SCRATCH_DIR
  // overrides for runs whose working directory differs from the checkout
  // the comparing process will read (the cwd-derived default is only valid
  // when writer and reader agree on it — Verify fails fast if a dumped
  // oracle points at a scratch dir that does not exist).
  private[graft] val base = sys.env.getOrElse("GRAFT_SCRATCH_DIR",
    new java.io.File("target/graft_scratch").getAbsolutePath)

  private def path(query: String, sfName: String): String =
    s"$base/${query}_$sfName"

  /** Scratch dir for `query` running against `sfDir`; records the sf so a
    * later [[lastDir]] (lazy oracle build) resolves to the same path. */
  def dir(query: String, sfDir: String): String = {
    val sfName = new java.io.File(sfDir).getName
    lastSf.put(query, sfName)
    path(query, sfName)
  }

  /** Scratch dir of the last run of `query` (the driver's Verify sf if the
    * query has not run in this process — matches the driver's compare sf). */
  def lastDir(query: String): String =
    path(query, lastSf.getOrDefault(query, "sf0.01"))

  /** Per-run WORKING temp dir (stream in/out/checkpoint trees — never read
    * by an oracle), recursively deleted at JVM shutdown so repeated bench
    * reps / verify sweeps in one process cannot accumulate stray /tmp
    * trees once the process exits. Oracle-read intermediates must use
    * [[dir]] instead: they are read by a DuckDB process that outlives this
    * JVM. */
  def tempDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    tempDirs.add(p.toString)
    p.toString
  }

  // ONE shutdown hook draining a queue — registering a hook Thread per
  // tempDir call would accumulate unbounded hook threads across bench
  // reps in a long-lived process
  private val tempDirs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles()
        if (kids != null) kids.foreach(rm)
        f.delete(): Unit
      }
      var d = tempDirs.poll()
      while (d != null) { rm(new java.io.File(d)); d = tempDirs.poll() }
    }))
  }
}
