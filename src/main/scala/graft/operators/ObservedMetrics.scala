package graft.operators

import org.apache.spark.sql.{DataFrame, Row}

/** Surfaces `Dataset.observe` validation counters as a queryable frame —
  * the reference publishes the same counts as asset metadata
  * (assets/recent_history.py:107-120: num_sessions / invalid_* /
  * error_rate); here they become (stage, metric, value) rows a downstream
  * report can join or alert on.
  *
  * `observe` accumulates during one full pass over the observed plan, so
  * `collect` forces that pass through the frame's OWN QueryExecution —
  * `qe.toRdd`, NOT `df.foreachPartition`/`df.rdd`/`df.count()`, each of
  * which wraps the plan in a fresh QueryExecution whose separate metric
  * accumulators are the ones that fill — and then flattens every named
  * observation. One extra pass, zero extra shuffles; at scale callers that
  * already materialize the frame (write/cache) can read the same metrics
  * without this helper's pass. */
object ObservedMetrics {

  def collect(df: DataFrame): DataFrame = collectAll(Seq(df))

  /** Harvest the observe counters of SEVERAL observed frames from ONE pass:
    * the plans are unioned (projected to a 1-column marker row, which keeps
    * every `CollectMetrics` node but prunes the payload columns), so a
    * single action materializes every stage concurrently in one Spark job
    * instead of one sequential full pass per stage. Observation names must
    * be unique across the inputs (Spark rejects duplicates in one query). */
  def collectAll(dfs: Seq[DataFrame]): DataFrame = {
    require(dfs.nonEmpty, "collectAll needs at least one observed frame")
    val spark = dfs.head.sparkSession
    val qe = dfs.map(_.select(org.apache.spark.sql.functions.lit(1).as("__one")))
      .reduce(_ unionAll _).queryExecution
    qe.toRdd.foreach(_ => ())
    import spark.implicits._
    qe.observedMetrics.toSeq.flatMap { case (stage, row) =>
      row.schema.fieldNames.map { f =>
        val v = row.getAs[Any](f) match {
          case null => 0.0 // sum over zero observed rows
          case n: Number => n.doubleValue()
          case other => sys.error(s"non-numeric observed metric $stage.$f: $other")
        }
        (stage, f, v)
      }
    }.toDF("stage", "metric", "value")
  }
}
