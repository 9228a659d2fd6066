package graft.queries

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Behavioral pins for the warehouse-layer surface (q138–q146) beyond the
  * oracle parity the driver checks: the semantics that make each operator
  * what it claims to be. */
class WarehouseSpec extends SparkSpec {
  import spark.implicits._

  test("funnel (q138): out-of-order steps do not convert") {
    // user 1: view→click→purchase (stage 3)
    // user 2: click BEFORE its first view, purchase before the click —
    //         only the view counts (stage 1)
    // user 3: purchase only (stage 0 — no view anchor)
    def ts(m: Int) = new java.sql.Timestamp(m * 60000L)
    val ev = Seq(
      (1L, ts(0), "view"), (1L, ts(1), "click"), (1L, ts(2), "purchase"),
      (2L, ts(0), "purchase"), (2L, ts(1), "click"), (2L, ts(2), "view"),
      (3L, ts(0), "purchase"))
      .toDF("user_id", "ts", "event_type")
      .withColumn("event_id", monotonically_increasing_id())
    val dir = java.nio.file.Files.createTempDirectory("funnel").toString
    ev.select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        lit(0.0).as("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntryFixture.funnel(spark, dir)
      .select("user_id", "stage").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 1L, 3L -> 0L))
  }

  test("scd2 (q143): A,A,B,A produces three versions with abutting bounds") {
    def ts(m: Int) = new java.sql.Timestamp(m * 60000L)
    val ev = Seq(
      (1L, ts(0), "A"), (1L, ts(1), "A"), (1L, ts(2), "B"), (1L, ts(3), "A"))
      .toDF("user_id", "ts", "event_type")
      .withColumn("event_id", monotonically_increasing_id())
    val dir = java.nio.file.Files.createTempDirectory("scd2").toString
    ev.select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        lit(0.0).as("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntryFixture.scd2(spark, dir)
      .select("version", "event_type", "from_us", "to_us", "n_events")
      .as[(Long, String, Long, Long, Long)].collect().toList
    assert(got == List(
      (1L, "A", 0L, 120000000L, 2L),
      (2L, "B", 120000000L, 180000000L, 1L),
      (3L, "A", 180000000L, -1L, 1L)))
  }

  test("bloom pruning (q142): no false negatives — every build-side key " +
      "with orders survives the filter") {
    val d = sf
    val mustKeep = Tables.customer(spark, d)
      .filter(col("c_acctbal") < 0).select(col("c_custkey"))
      .join(Tables.orders(spark, d)
        .select(col("o_custkey").as("c_custkey")).distinct(), "c_custkey")
      .as[Long].collect().toSet
    val kept = graft.queries.WarehouseQueries.all
      .find(_.name == "q142_bloom_prune").get
      .run(spark, d)
      .filter(col("actual_in") === 1)
      .select(col("o_custkey")).distinct().as[Long].collect().toSet
    assert(mustKeep.nonEmpty && kept == mustKeep)
  }

  test("z-order (q141): the Morton code decodes back to (x, y)") {
    val rows = graft.queries.WarehouseQueries.all
      .find(_.name == "q141_zorder_layout").get
      .run(spark, sf)
      .select("x", "y", "zval").as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (x, y, z) =>
      var (dx, dy) = (0L, 0L)
      (0 until 8).foreach { i =>
        dx |= ((z >> (2 * i)) & 1) << i
        dy |= ((z >> (2 * i + 1)) & 1) << i
      }
      assert((dx, dy) == (x, y), s"zval $z decoded to ($dx,$dy), not ($x,$y)")
    }
  }

  test("count-min (q144): estimate >= exact for EVERY token, not just the " +
      "reported top-20") {
    val vocab = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).cast("long").as("cnt"))
    val b = vocab.select(col("tok"), col("cnt"),
        explode(array((1 to 3).map(lit): _*)).as("j"))
      .withColumn("bucket",
        conv(substring(md5(concat(col("tok"), lit("|cms-"),
          col("j").cast("string"))), 1, 12), 16, 10).cast("long") % 1024)
    val cells = b.groupBy("j", "bucket").agg(sum("cnt").as("cell"))
    val under = b.join(cells, Seq("j", "bucket"))
      .groupBy("tok").agg(min("cell").as("est"), first("cnt").as("cnt"))
      .filter(col("est") < col("cnt")).count()
    assert(under == 0L)
  }
}

/** Tiny indirection so the fixture tests run the DECLARED query bodies
  * against a synthetic sf dir (the driver contract passes any dir). */
private object SparkEntryFixture {
  def funnel(s: org.apache.spark.sql.SparkSession, dir: String) =
    graft.queries.EventQueries.all
      .find(_.name == "q138_funnel_steps").get.run(s, dir)
  def scd2(s: org.apache.spark.sql.SparkSession, dir: String) =
    graft.queries.WarehouseQueries.all.find(_.name == "q143_scd2_history").get
      .run(s, dir)
}
