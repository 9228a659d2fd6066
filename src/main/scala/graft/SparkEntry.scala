package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The query surface is assembled from per-domain modules under
  * `graft.queries`; each returns `Seq[QueryDef]` (Spark impl + optional
  * DuckDB oracle SQL). Names must stay stable across rounds.
  */
object SparkEntry {

  def allQueries: Seq[QueryDef] =
    RelationalQueries.all ++ EventQueries.all ++ VectorQueries.all ++
      TextQueries.all ++ PipelineQueries.all ++ DedupQueries.all ++
      SqlSurfaceQueries.all ++ ExtendedQueries.all ++ CurationQueries.all ++
      WarehouseQueries.all

  /** Flagship on /root/testdata/sf0.001 (driver smoke-checks rows>0): the
    * reference's recent path end-to-end — activity → stub-LLM sessions →
    * embeddings → adaptive thresholds → banded candidate pairs →
    * connected-components merge. */
  def entry(spark: SparkSession): DataFrame =
    queries("q51_pipeline_merged")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
