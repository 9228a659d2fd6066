package graft.operators

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class HllSketchSpec extends SparkSpec {
  import spark.implicits._

  private def events = Tables.events(spark, sf)

  /** In-memory truth: registers recomputed from the raw 48-bit hashes with
    * plain JVM bit arithmetic. */
  private def bruteRegisters(p: Int): Map[(String, Long), Long] = {
    val suffixBits = 48 - p
    events.select(col("event_type"),
        KmvSketch.hash48(col("user_id"), "hll-v1").as("h"))
      .as[(String, Long)].collect()
      .map { case (g, h) =>
        val reg = h >>> suffixBits
        val suffix = h & ((1L << suffixBits) - 1)
        val rho =
          if (suffix == 0) suffixBits + 1L
          else suffixBits - (63 - java.lang.Long.numberOfLeadingZeros(suffix)).toLong
        ((g, reg), rho)
      }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
  }

  test("registers equal JVM bit-arithmetic truth (len(bin) == 63-nlz trick)") {
    val got = HllSketch.registers(events, "event_type", "user_id", p = 6)
      .as[(String, Long, Long)].collect()
      .map { case (g, r, m) => (g, r) -> m }.toMap
    assert(got === bruteRegisters(6))
  }

  test("merge law: per-shard register tables combine to the global table") {
    val ev = events.withColumn("shard", col("event_id") % 3)
    val global = HllSketch.registers(events, "event_type", "user_id")
      .as[(String, Long, Long)].collect().toSet
    val perShard = (0 until 3).map { sh =>
      HllSketch.registers(ev.filter(col("shard") === sh), "event_type", "user_id")
    }.reduce(_.unionAll(_))
    val merged = HllSketch.merge(perShard, "event_type")
      .as[(String, Long, Long)].collect().toSet
    assert(merged === global)
  }

  test("raw estimate is within 3/sqrt(64) of the true cardinality when " +
      "out of the linear-counting regime, and deterministic") {
    // synthetic group large enough that raw HLL (no small-range correction)
    // is in its accurate regime: n >> 2.5 * m = 160
    val big = spark.range(5000).select(lit("g").as("grp"), col("id"))
    val regs = HllSketch.registers(big, "grp", "id")
    val est1 = HllSketch.rawEstimate(regs, "grp").as[(String, Long, Long)].head()
    val est2 = HllSketch.rawEstimate(regs, "grp").as[(String, Long, Long)].head()
    assert(est1 === est2)
    val err = math.abs(est1._2 - 5000.0) / 5000.0
    assert(err < 3.0 / math.sqrt(64), s"raw_est=${est1._2} err=$err")
  }

  test("windowed merge law: rolling max over daily sketches equals the " +
      "sketch of the unioned window (q211's shape)") {
    // 3 days of overlapping user sets; the 3-day rolling register table
    // built by element-wise max over per-day sketches must equal the
    // registers computed directly on the union of the window's rows
    val ev = spark.range(300).select(
      (col("id") % 3).as("day"), (col("id") % 97).as("user_id"))
    val daily = HllSketch.registers(ev, "day", "user_id")
    val rolledW = daily.select(lit("w").as("grp"), col("reg"), col("max_rho"))
      .groupBy(col("grp"), col("reg")).agg(max(col("max_rho")).as("max_rho"))
      .as[(String, Long, Long)].collect().map(r => (r._2, r._3)).toMap
    val direct = HllSketch.registers(
        ev.select(lit("w").as("grp"), col("user_id")), "grp", "user_id")
      .as[(String, Long, Long)].collect().map(r => (r._2, r._3)).toMap
    assert(rolledW == direct)
  }
}
