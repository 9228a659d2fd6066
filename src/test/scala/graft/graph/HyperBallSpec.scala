package graft.graph

import graft.SparkSpec
import graft.operators.HllSketch
import org.apache.spark.sql.functions._

/** HyperBall contract: after r max-merge rounds, node v's registers are
  * EXACTLY `HllSketch.registers` of the true BFS ball B(v, r) — the
  * max-merge-commutes-with-union theorem the estimator stands on. The
  * reference ball is computed here by brute r-step closure over the edge
  * list, entirely independent of the operator's iterate. */
class HyperBallSpec extends SparkSpec {
  import spark.implicits._

  private def randomEdges(n: Int, m: Int, seed: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    // symmetric, no self-loops
    (1 to m).flatMap { _ =>
      val a = 1L + rnd.nextInt(n); val b = 1L + rnd.nextInt(n)
      if (a == b) Nil else Seq((a, b), (b, a))
    }.distinct
  }

  test("radius-r registers equal the HLL of the exact BFS ball (r = 0, 1, 2)") {
    for (trial <- 1 to 2) {
      val edges = randomEdges(n = 25, m = 40, seed = 31 + trial)
      val edf = edges.toDF("src", "dst")
      val got = GraphOps.hyperBallRegisters(edf, rounds = 2, p = 4)
        .select("radius", "id", "reg", "max_rho")
        .as[(Long, Long, Long, Long)].collect().toSet

      // brute truth: adjacency closure in driver code
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      def ball(v: Long, r: Int): Set[Long] = {
        var s = Set(v)
        for (_ <- 1 to r) s = s ++ s.flatMap(u => adj.getOrElse(u, Set.empty))
        s
      }
      val expected = (0 to 2).flatMap { r =>
        val members = nodes.flatMap(v => ball(v, r).map(v -> _))
        val mdf = members.toDF("id", "member")
        HllSketch.registers(mdf, "id", "member", p = 4, salt = "hb-v1")
          .select(lit(r.toLong).as("radius"), col("id"), col("reg"),
            col("max_rho"))
          .as[(Long, Long, Long, Long)].collect()
      }.toSet
      assert(got == expected, s"trial $trial")
    }
  }

  test("DIRECTED edges: registers accumulate the FORWARD ball (v absorbs successors)") {
    // a→b only: B(a,1) = {a,b}, B(b,1) = {b} — the documented contract,
    // which the earlier src→dst emission silently inverted (it computed
    // the in-ball; symmetric callers never noticed)
    val edf = Seq((1L, 2L)).toDF("src", "dst")
    val got = GraphOps.hyperBallRegisters(edf, rounds = 1, p = 4)
      .filter(col("radius") === 1)
      .select("id", "reg", "max_rho").as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSet).toMap
    def hll(members: Seq[Long]) = HllSketch.registers(
        members.map(m => (0L, m)).toDF("id", "member"), "id", "member",
        p = 4, salt = "hb-v1")
      .select("reg", "max_rho").as[(Long, Long)].collect().toSet
    assert(got(1L) == hll(Seq(1L, 2L)), "a must absorb its successor b")
    assert(got(2L) == hll(Seq(2L)), "b has no out-edge — singleton ball")
  }

  test("registers only grow with radius (max-merge monotonicity)") {
    val edf = randomEdges(n = 15, m = 20, seed = 9).toDF("src", "dst")
    val regs = GraphOps.hyperBallRegisters(edf, rounds = 2, p = 4)
      .as[(Long, Long, Long, Long)].collect()
    val byRadius = regs.groupBy(_._1).view
      .mapValues(_.map(t => (t._2, t._3) -> t._4).toMap).toMap
    for (r <- 0 to 1; ((id, reg), rho) <- byRadius(r.toLong))
      assert(byRadius(r + 1L).getOrElse((id, reg), 0L) >= rho,
        s"register ($id, $reg) shrank from radius $r to ${r + 1}")
  }

  test("harmonic shells are non-negative and pivot matches the per-radius estimates") {
    val edf = randomEdges(n = 25, m = 40, seed = 77).toDF("src", "dst")
    val harm = GraphOps.harmonicX2Milli(edf)
      .as[(Long, Long, Long, Long, Long)].collect()
    val est = GraphOps.ballEstMilli(
        GraphOps.hyperBallRegisters(edf, rounds = 2, p = 4))
      .select("radius", "id", "est_milli")
      .as[(Long, Long, Long)].collect()
      .groupBy(_._2).view.mapValues(_.map(t => t._1 -> t._3).toMap).toMap
    assert(harm.nonEmpty)
    for ((id, e0, e1, e2, h) <- harm) {
      assert(e1 >= e0 && e2 >= e1, s"ball estimates shrank for $id")
      assert(h == 2 * (e1 - e0) + (e2 - e1), s"shell arithmetic off for $id")
      assert(h >= 0)
      assert(e0 == est(id)(0L) && e1 == est(id)(1L) && e2 == est(id)(2L),
        s"pivot disagrees with per-radius estimates for $id")
    }
  }

  test("an isolated clique's outer shell is empty and its ball estimate shared") {
    val clique = for (a <- 1L to 5L; b <- 1L to 5L if a != b) yield (a, b)
    val harm = GraphOps.harmonicX2Milli(clique.toDF("src", "dst"))
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(harm.length == 5)
    // ball(v,1) = ball(v,2) = the clique ⇒ est1 = est2, harm = 2·(est1−est0)
    for ((_, e0, e1, e2, h) <- harm) {
      assert(e1 == e2, "radius-2 shell of an isolated clique must be empty")
      assert(h == 2 * (e1 - e0))
    }
    // every member sees the SAME radius-1 ball (the whole clique), so the
    // shared-ball estimate agrees; est0 (each node's own singleton sketch)
    // legitimately differs per hash, so harm itself need not
    assert(harm.map(_._3).toSet.size == 1, "shared ball estimate must agree")
  }

  test("an isolated clique's radius-1 ball registers equal the whole clique") {
    // clique on {1..5}: ball(v, 1) = {1..5} for every member, so all five
    // nodes must end radius 1 with IDENTICAL register tables
    val clique = for (a <- 1L to 5L; b <- 1L to 5L if a != b) yield (a, b)
    val regs = GraphOps.hyperBallRegisters(clique.toDF("src", "dst"),
        rounds = 1, p = 4)
      .filter(col("radius") === 1)
      .select("id", "reg", "max_rho")
      .as[(Long, Long, Long)].collect()
    val tables = regs.groupBy(_._1).view
      .mapValues(_.map(t => (t._2, t._3)).toSet).toMap
    assert(tables.size == 5 && tables.values.toSet.size == 1,
      s"clique members disagree: $tables")
  }
}
