package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DataQuality contract: rule semantics on crafted rows (NULL predicate
  * fails, thresholds gate the pass flag, uniqueness counts distinct, FK
  * counts resolvable rows), and the scan-sharing design — all row rules
  * in ONE aggregation pass. */
class DataQualitySpec extends SparkSpec {
  import spark.implicits._
  import DataQuality.RowRule

  private val rows = Seq(
    (1L, Some(10L), "a"), (2L, Some(-5L), "a"), (3L, None, "b"),
    (4L, Some(7L), "b"), (4L, Some(9L), "c") // duplicate key 4
  ).toDF("k", "v", "tag")

  test("row rules: NULL predicate fails, counts and flags exact") {
    val out = DataQuality.report(DataQuality.rowAudit(rows, Seq(
        RowRule("v_complete", col("v").isNotNull, 1000000L),
        RowRule("v_positive", col("v") > 0, 700000L),
        RowRule("tag_is_a", col("tag") === "a", 500000L))))
      .as[(String, Long, Long, Option[Long], Long, Int)].collect()
      .map(r => r._1 -> r).toMap
    // v > 0: row 3's NULL predicate must count as FAIL, not be skipped
    assert(out("v_positive") == (("v_positive", 5L, 3L, Some(600000L),
      700000L, 0)))
    assert(out("v_complete") == (("v_complete", 5L, 4L, Some(800000L),
      1000000L, 0)))
    assert(out("tag_is_a") == (("tag_is_a", 5L, 2L, Some(400000L),
      500000L, 0)))
  }

  test("uniqueness and referential integrity") {
    val uniq = DataQuality.report(
        DataQuality.uniqueness(rows, "k_unique", Seq("k"), 1000000L))
      .as[(String, Long, Long, Option[Long], Long, Int)].collect()(0)
    assert(uniq == (("k_unique", 5L, 4L, Some(800000L), 1000000L, 0)))
    val ref = Seq(1L, 2L, 3L).toDF("rk")
    val fk = DataQuality.report(
        DataQuality.referential(rows, "k", ref, "rk", "fk_k", 1000000L))
      .as[(String, Long, Long, Option[Long], Long, Int)].collect()(0)
    // keys 4, 4 unresolved → 3 of 5 rows pass
    assert(fk == (("fk_k", 5L, 3L, Some(600000L), 1000000L, 0)))
    // passing case
    val ok = DataQuality.report(DataQuality.rowAudit(rows,
        Seq(RowRule("k_complete", col("k").isNotNull, 1000000L))))
      .as[(String, Long, Long, Option[Long], Long, Int)].collect()(0)
    assert(ok._6 == 1)
  }

  test("scan sharing: N row rules plan exactly one aggregate over one scan") {
    val audited = DataQuality.rowAudit(rows, (1 to 6).map(i =>
      RowRule(s"r$i", col("k") > i, 1000000L)))
    val plan = audited.queryExecution.optimizedPlan.toString
    // one Aggregate node, one scan — six rules share the pass
    assert("Aggregate".r.findAllIn(plan).size == 1,
      s"row rules must share one aggregation pass:\n$plan")
  }
}
