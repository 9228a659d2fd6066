package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by salting (SURVEY §8 scale hardening).
  *
  * Hot keys (a power user's million sessions, boilerplate dedup buckets)
  * overload one reducer in a plain `groupBy`/`join`. Salting fans a key
  * into `salts` sub-keys:
  *
  *  - aggregation: two-phase — partial agg on (key, salt), final agg on
  *    key. Works for any algebraic aggregate (sum/count/min/max + avg via
  *    sum+count). The first shuffle spreads the hot key over `salts`
  *    reducers; the second is |keys|-sized.
  *  - join: replicate the small side per salt, salt the big side — the hot
  *    key's rows split across `salts` tasks.
  *
  * Deterministic salt (hash of a row id / stable column, not rand()) keeps
  * reruns and retries byte-identical — rand() per task re-executes
  * differently on speculative retries and breaks exactly-once semantics.
  *
  * AQE's skew-join splitting covers the join case at runtime when stats
  * expose it; this operator is the explicit plan-level tool for known-hot
  * keys and for aggregations (which AQE does not salt).
  */
object Salt {

  /** Deterministic salt in [0, salts) from `saltSource` (any stable
    * expression — an id column, xxhash of the row's natural key). */
  def saltCol(saltSource: Column, salts: Int): Column =
    pmod(xxhash64(saltSource), lit(salts)).cast("int")

  /** Two-phase salted sum/count aggregation:
    * `df.groupBy(keys).agg(sum(valueCol), count(*))` with the hot-key
    * shuffle spread over `salts` partial groups. */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
      saltSource: Column, salts: Int = 16): DataFrame = {
    val partial = df
      .withColumn("__salt", saltCol(saltSource, salts))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"), sum(col("__pcnt")).as("n"))
  }

  /** Salted inner equi-join: `big ⋈ small on keys` with the big side
    * salted and the small side replicated `salts`×. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      saltSource: Column, salts: Int = 16): DataFrame = {
    val b = big.withColumn("__salt", saltCol(saltSource, salts))
    val s = small.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    b.join(s, keys :+ "__salt").drop("__salt")
  }
}
