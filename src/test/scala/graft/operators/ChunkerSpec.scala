package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChunkerSpec extends SparkSpec {
  import spark.implicits._

  private def activity(rows: (Long, String, String)*) =
    rows.toSeq.toDF("user_id", "s", "title")
      .select(col("user_id"), to_timestamp(col("s")).as("ts"), col("title"))

  private def collect(df: org.apache.spark.sql.DataFrame, size: Int) =
    Chunker.chunks(df, size).collect()
      .map(c => (c._1, c._2.toString, c._3, c._4))
      .sortBy(c => (c._1, c._2, c._3))

  test("chunk ids restart per (user, day); boundaries at exactly chunkSize") {
    val rows = (0 until 30).map(i => (1L, f"2024-01-01 10:$i%02d:00", s"t$i")) ++
      (0 until 3).map(i => (1L, f"2024-01-02 09:0$i:00", s"d2-$i")) ++
      Seq((2L, "2024-01-01 08:00:00", "u2"))
    val got = collect(activity(rows: _*), 15)
    assert(got.map(c => (c._1, c._2, c._3, c._4.size)).toSeq == Seq(
      (1L, "2024-01-01", 0L, 15), (1L, "2024-01-01", 1L, 15),
      (1L, "2024-01-02", 0L, 3), (2L, "2024-01-01", 0L, 1)))
    // rows ordered by time inside the chunk, HH:mm rendered
    assert(got.head._4.head == ("10:00", "t0"))
    assert(got.head._4.last == ("10:14", "t14"))
  }

  test("cross-midnight events split into separate day groups") {
    val got = collect(activity(
      (1L, "2024-01-01 23:59:00", "before"),
      (1L, "2024-01-02 00:01:00", "after")), 15)
    assert(got.length == 2)
    assert(got(0)._2 == "2024-01-01" && got(1)._2 == "2024-01-02")
  }

  test("empty input → no chunks; equal timestamps tie-break on title") {
    assert(collect(activity(), 15).isEmpty)
    val got = collect(activity(
      (1L, "2024-01-01 10:00:00", "b"),
      (1L, "2024-01-01 10:00:00", "a")), 15)
    assert(got.head._4.map(_._2).toSeq == Seq("a", "b"))
  }
}
