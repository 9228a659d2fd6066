package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private val clicks = Seq(
    (1L, 100L, 10L), (1L, 101L, 25L), (1L, 102L, 5L), (2L, 200L, 50L))
    .toDF("user_id", "click_id", "ts")
  private val purchases = Seq(
    (1L, 900L, 10L, 1.0), (1L, 901L, 20L, 2.0), (2L, 902L, 60L, 3.0))
    .toDF("user_id", "p_id", "ts", "amount")

  test("most recent right row at-or-before each left row") {
    val got = AsOfJoin.join(clicks, purchases, Seq("user_id"),
        "ts", "ts", Seq("p_id", "amount"), rightTiebreak = Some("p_id"))
      .select("click_id", "p_id", "amount")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got(100L) == Some(900L)) // simultaneous (ts=10): <= includes it
    assert(got(101L) == Some(901L)) // most recent of the two
    assert(got(102L) == None) // before any purchase
    assert(got(200L) == None) // user 2's purchase is later
  }

  test("tolerance bounds the lookback") {
    val got = AsOfJoin.join(clicks, purchases, Seq("user_id"),
        "ts", "ts", Seq("p_id"), tolerance = Some(3L), rightTiebreak = Some("p_id"))
      .select("click_id", "p_id")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got(100L) == Some(900L)) // gap 0 <= 3
    assert(got(101L) == None) // gap 5 > 3
  }

  test("simultaneous right rows: greatest tiebreak wins") {
    val p2 = Seq((1L, 900L, 10L, 1.0), (1L, 905L, 10L, 9.0))
      .toDF("user_id", "p_id", "ts", "amount")
    val got = AsOfJoin.join(clicks.filter(col("click_id") === 100L), p2,
        Seq("user_id"), "ts", "ts", Seq("p_id"), rightTiebreak = Some("p_id"))
      .head().getAs[Long]("p_id")
    assert(got == 905L)
  }

  test("left rows and columns are all preserved (left-join semantics)") {
    val out = AsOfJoin.join(clicks, purchases, Seq("user_id"),
      "ts", "ts", Seq("amount"))
    assert(out.count() == clicks.count())
    assert(out.columns.toSet == Set("user_id", "click_id", "ts", "amount"))
  }
}
