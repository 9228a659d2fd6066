package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One entry in the engine's declared query surface.
  *
  * @param name     stable query id (key in `SparkEntry.queries`)
  * @param oracleFn equivalent ANSI SQL runnable by DuckDB against the same
  *                 parquet tables, built LAZILY at access time (None → the
  *                 driver records a rows-only check). Lazy because some
  *                 oracles embed an environment-resolved fixture path —
  *                 baking the string at class-init would freeze whatever
  *                 path the first classload saw.
  * @param run      the Spark-side implementation
  *
  * Determinism contract (required for the driver's hash compare):
  *  - every query ends in a total ORDER BY (unique tie-break key);
  *  - every *computed* floating-point column is `round(...)`-ed identically
  *    on both sides, and any ORDER BY over a computed double orders by the
  *    rounded value;
  *  - column aliases match the oracle SQL exactly.
  */
final case class QueryDef(
    name: String,
    oracleFn: Option[() => String],
    run: (SparkSession, String) => DataFrame) {
  def oracle: Option[String] = oracleFn.map(_())
}

object QueryDef {
  def sql(name: String, oracleSql: => String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, Some(() => oracleSql), fn)
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, None, fn)
}
