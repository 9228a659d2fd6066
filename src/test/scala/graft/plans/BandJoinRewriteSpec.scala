package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

class BandJoinRewriteSpec extends SparkSpec {

  /** Session with GraftExtensions active (shares the JVM SparkContext). */
  private lazy val ext: SparkSession = {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      SparkSession.builder()
        .master("local[4]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .withExtensions(new graft.GraftExtensions)
        .getOrCreate()
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  private def tables(): Unit = {
    import ext.implicits._
    (1 to 500).map(i => (i.toLong, (i * 7L) % 1000))
      .toDF("a_id", "a_ts").createOrReplaceTempView("ta")
    (1 to 500).map(i => (i.toLong, (i * 13L) % 1000))
      .toDF("b_id", "b_ts").createOrReplaceTempView("tb")
  }

  private def physical(df: DataFrame): String = df.queryExecution.executedPlan.toString

  test("raw-SQL band theta join plans as a hash join, not BNLJ") {
    tables()
    val q = ext.sql(
      """SELECT a_id, b_id FROM ta JOIN tb
        |ON b_ts - a_ts >= 0 AND b_ts - a_ts <= 10""".stripMargin)
    val plan = physical(q)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("Join") || plan.contains("HashJoin") || plan.contains("SortMergeJoin"), plan)
  }

  test("rewritten band join returns exactly the nested-loop result") {
    tables()
    val rewritten = ext.sql(
      """SELECT a_id, b_id FROM ta JOIN tb
        |ON b_ts - a_ts >= 0 AND b_ts - a_ts <= 10""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // same query on the extension-free session → BNLJ reference result
    import spark.implicits._
    (1 to 500).map(i => (i.toLong, (i * 7L) % 1000))
      .toDF("a_id", "a_ts").createOrReplaceTempView("ta0")
    (1 to 500).map(i => (i.toLong, (i * 13L) % 1000))
      .toDF("b_id", "b_ts").createOrReplaceTempView("tb0")
    val reference = spark.sql(
      """SELECT a_id, b_id FROM ta0 JOIN tb0
        |ON b_ts - a_ts >= 0 AND b_ts - a_ts <= 10""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rewritten == reference)
    assert(reference.nonEmpty)
  }

  test("r <= l + lit form and strict bounds are recognized; equivalence holds") {
    tables()
    val q = """SELECT a_id, b_id FROM %s a JOIN %s b
              |ON b_ts < a_ts + 25 AND b_ts > a_ts - 5""".stripMargin
    val rewritten = ext.sql(q.format("ta", "tb"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val plan = physical(ext.sql(q.format("ta", "tb")))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    import spark.implicits._
    val reference = spark.sql(q.format("ta0", "tb0"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rewritten == reference && reference.nonEmpty)
  }

  test("negative band bounds (cross-midnight quirk shape) stay correct") {
    tables()
    val q = """SELECT a_id, b_id FROM %s JOIN %s
              |ON b_ts - a_ts >= -50 AND b_ts - a_ts <= -10""".stripMargin
    val rewritten = ext.sql(q.format("ta", "tb"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val reference = spark.sql(q.format("ta0", "tb0"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rewritten == reference && reference.nonEmpty)
  }

  test("one-sided ranges and equi joins are left untouched") {
    tables()
    // no lower bound → not a band; must still produce correct results
    val oneSided = ext.sql(
      "SELECT count(*) FROM ta JOIN tb ON b_ts - a_ts <= 10")
      .head().getLong(0)
    val ref = spark.sql(
      "SELECT count(*) FROM ta0 JOIN tb0 ON b_ts - a_ts <= 10")
      .head().getLong(0)
    assert(oneSided == ref)
    // plain equi join unaffected
    val equi = ext.sql("SELECT count(*) FROM ta JOIN tb ON a_ts = b_ts").head().getLong(0)
    val equiRef = spark.sql("SELECT count(*) FROM ta0 JOIN tb0 ON a_ts = b_ts").head().getLong(0)
    assert(equi == equiRef)
  }
}
