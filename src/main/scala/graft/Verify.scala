package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Verify <sfDir> <outDir> [queryName...]")
    val Array(sfDir, outDir) = args.take(2)
    val only = args.drop(2).toSet
    val unknown = only -- SparkEntry.queries.keySet
    require(unknown.isEmpty,
      s"unknown query name(s): ${unknown.mkString(", ")} — a typo here would " +
        "otherwise write zero outputs and exit 0")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.core.EngineConf.configure(
        SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Fail fast on dangling scratch references: some oracles read_parquet a
    // scratch table the query wrote THIS run (q56/q57/q97/q98/q103). A dump
    // whose scratch dir is absent (clean build dir, different cwd than the
    // writer, query skipped via the `only` filter) would make the DuckDB
    // compare read missing — or worse, stale — candidate data. Better to
    // die loudly here than to let the driver record a silent mismatch.
    val scratchRefs = SparkEntry.oracleSql.toSeq
      .filter { case (name, _) => only.isEmpty || only(name) }
      .flatMap { case (name, sqlText) =>
        "'([^']+)/\\*\\.parquet'".r.findAllMatchIn(sqlText)
          .map(_.group(1)).filter(_.startsWith(graft.core.Scratch.base))
          .map(name -> _)
      }
    val dangling = scratchRefs.filterNot { case (_, p) => new java.io.File(p).isDirectory }
    require(dangling.isEmpty,
      s"oracle_sql.json references scratch dirs that do not exist — the DuckDB " +
        s"compare would read missing data: ${dangling.mkString(", ")} " +
        "(set GRAFT_SCRATCH_DIR or run from the writing checkout)")
    spark.stop()
  }
}
