package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** k-anonymity ladder contract. Independent reference: the release rules
  * applied by hand to a fixture small enough to reason about. */
class AnonymizeSpec extends SparkSpec {

  private def release(rows: Seq[(String, String, Long)], k: Int) = {
    val df = spark.createDataFrame(rows).toDF("fine", "coarse", "user")
    Anonymize.kAnonymizeLadder(df, "user", k,
        Seq(col("fine"), col("coarse")))
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getInt(4)))
      .toSet
  }

  test("hand-worked ladder: release, generalize, suppress") {
    // fine cell a1: users 1,2 (k=2 passes); a2: user 3 only (fails);
    // b1: user 4 only (fails). Remainder {a2-row, b1-row} regroups at
    // coarse: A has just user 3 (fails), B just user 4 (fails) -> both
    // suppressed with masked users.
    val rows = Seq(
      ("a1", "A", 1L), ("a1", "A", 2L), ("a2", "A", 3L), ("b1", "B", 4L))
    assert(release(rows, 2) == Set(
      (0, "a1", 2L, 2L, 0),
      (2, "A", 1L, -1L, 1),
      (2, "B", 1L, -1L, 1)))
  }

  test("remainder counting blocks the differencing attack") {
    // fine cell c1 passes with users 1,2. Cell c2 holds ONLY user 3.
    // Full-population counting would release coarse C (users 1,2,3 >= 3)
    // -- but C minus c1 isolates user 3. Remainder counting must refuse.
    val rows = Seq(
      ("c1", "C", 1L), ("c1", "C", 2L), ("c1", "C", 1L), ("c2", "C", 3L))
    val out = release(rows, 2)
    assert(out.contains((0, "c1", 3L, 2L, 0)))
    // coarse remainder is the single user-3 row: suppressed, masked
    assert(out.contains((2, "C", 1L, -1L, 1)))
    assert(!out.exists { case (lvl, qi, _, _, sup) =>
      lvl == 1 && qi == "C" && sup == 0 })
  }

  test("every released (non-audit) row covers >= k users -- the theorem") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 300).map { _ =>
      val f = rnd.nextInt(30); (s"f$f", s"c${f % 5}", rnd.nextInt(40).toLong)
    }
    for (k <- Seq(2, 5, 9)) {
      val out = release(rows, k)
      out.filter(_._5 == 0).foreach { r =>
        assert(r._4 >= k, s"released row $r under k=$k")
      }
      // conservation: released + audited events == input events
      assert(out.toSeq.map(_._3).sum == rows.size.toLong)
    }
  }

  test("coarser rung counts remainder only, not the full population") {
    // d1 passes; d2 (user 5 twice) and d3 (user 6) each fail alone; the
    // coarse D rung sees only their remainder -> releases at level 1 with
    // n_users = 2 (not the full-population 4)
    val rows = Seq(
      ("d1", "D", 1L), ("d1", "D", 2L),
      ("d2", "D", 5L), ("d2", "D", 5L), ("d3", "D", 6L))
    assert(release(rows, 2) == Set(
      (0, "d1", 2L, 2L, 0),
      (1, "D", 3L, 2L, 0)))
  }
}
