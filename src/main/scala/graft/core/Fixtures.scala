package graft.core

/** Repo-committed raw fixtures (`fixtures/<name>/` at the repo root).
  *
  * The driver contract passes only a parquet sfDir, but raw-input entry
  * points (takeout JSON, media blobs) read these fixed locations — and the
  * resolved path is also embedded into oracle SQL executed by a separate
  * DuckDB process, so resolution must yield an absolute path and be
  * repeatable at QUERY time (QueryDef oracles are lazy for this reason):
  * env override → upward search from the working directory (survives a
  * relocated checkout and running from a subdirectory) → the canonical
  * repo path as a last resort.
  */
object Fixtures {

  def resolve(sub: String, envVar: String): String =
    sys.env.get(envVar).getOrElse {
      val cwd = new java.io.File(".").getCanonicalFile
      Iterator.iterate(cwd)(_.getParentFile)
        .takeWhile(_ != null)
        .map(d => new java.io.File(d, s"fixtures/$sub"))
        .collectFirst { case f if f.isDirectory => f.getAbsolutePath }
        .getOrElse(s"/root/repo/fixtures/$sub")
    }
}
