package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import MixturePlan.{isqrt, waterfill}

/** Waterfill invariants (q255/q256's subject): budget conservation,
  * cap respect, proportional shares for open domains, synchronous-round
  * cap ordering, and the loud non-convergence/overflow guards. */
class MixturePlanSpec extends AnyFunSuite {

  test("isqrt is exact floor(sqrt) including perfect squares and edges") {
    for (n <- Seq(0L, 1L, 2L, 3L, 4L, 15L, 16L, 17L, 24L, 25L, 26L,
        999999L, 1000000L, 1000001L, 999999999999L, 1000000000000L)) {
      val s = isqrt(n)
      assert(s * s <= n && (s + 1) * (s + 1) > n, s"isqrt($n) = $s")
    }
    intercept[IllegalArgumentException](isqrt(-1L))
  }

  test("no caps: allocation is proportional to isqrt weights, within budget") {
    // stocks large enough that nobody caps at budget 1000
    val a = waterfill(Seq("a" -> 10000L, "b" -> 40000L), budget = 1000L)
    val Seq(aa, ab) = a.sortBy(_.domain)
    assert(aa.weight == 100L && ab.weight == 200L)
    assert(aa.allocTokens == 1000L * 100 / 300)
    assert(ab.allocTokens == 1000L * 200 / 300)
    assert(a.forall(_.cappedRound == 0L))
    assert(a.map(_.allocTokens).sum <= 1000L)
  }

  test("a small domain caps and returns its unused share to the pool") {
    // weights: isqrt(100)=10, isqrt(1600)=40. Round 1 shares of 500:
    // a: 500*10/50 = 100 >= 100 -> caps; b: 400. Round 2: b gets
    // (500-100)*40/40 = 400 < 1600 -> open.
    val a = waterfill(Seq("a" -> 100L, "b" -> 1600L), budget = 500L)
      .sortBy(_.domain)
    assert(a(0).allocTokens == 100L && a(0).cappedRound == 1L)
    assert(a(1).allocTokens == 400L && a(1).cappedRound == 0L)
  }

  test("cascading caps land in increasing synchronous rounds") {
    // weights isqrt: a=6, b=46, c=316. Round 1 (W=368, R=17008):
    // share_a = 17008*6/368 = 277 >= 47 -> a caps; share_b =
    // 17008*46/368 = 2126 < 2136 -> open. Round 2 (W=362, R=16961):
    // share_b = 16961*46/362 = 2155 >= 2136 -> b caps ONLY after a's
    // refund. Final: c gets (17008-47-2136)*316/316 = 14825, open.
    val a = waterfill(
      Seq("a" -> 47L, "b" -> 2136L, "c" -> 100000L), budget = 17008L)
      .sortBy(_.domain)
    assert(a(0).cappedRound == 1L && a(0).allocTokens == 47L)
    assert(a(1).cappedRound == 2L && a(1).allocTokens == 2136L)
    assert(a(2).cappedRound == 0L && a(2).allocTokens == 14825L)
    assert(a.map(_.allocTokens).sum <= 17008L)
  }

  test("budget >= total stock caps everything at its stock") {
    val a = waterfill(Seq("a" -> 10L, "b" -> 20L), budget = 1000L)
    assert(a.forall(x => x.allocTokens == x.nTokens && x.cappedRound > 0))
  }

  test("zero budget allocates zero everywhere, converged") {
    val a = waterfill(Seq("a" -> 10L, "b" -> 20L), budget = 0L)
    assert(a.forall(_.allocTokens == 0L))
  }

  test("non-convergence within maxRounds fails loudly") {
    // the cascade above needs TWO rounds; capping maxRounds at 1 must
    // trip the explicit fixed-point verification, not silently return
    // the round-1 state
    intercept[IllegalArgumentException](
      waterfill(Seq("a" -> 47L, "b" -> 2136L, "c" -> 100000L),
        budget = 17008L, maxRounds = 1))
  }

  test("input guards: empty, negative stock, negative budget, overflow, >64 domains") {
    intercept[IllegalArgumentException](waterfill(Seq.empty, 10L))
    intercept[IllegalArgumentException](waterfill(Seq("a" -> -1L), 10L))
    intercept[IllegalArgumentException](waterfill(Seq("a" -> 1L), -1L))
    intercept[IllegalArgumentException](
      waterfill(Seq("a" -> (Long.MaxValue / 2)), budget = Long.MaxValue / 2))
    intercept[IllegalArgumentException](
      waterfill((0 to 64).map(i => (s"d$i", 10L)), 10L))
    // duplicate names would silently conflate two stocks into one
    // round-state entry (ADVICE r15) — refused loudly instead
    val dup = intercept[IllegalArgumentException](
      waterfill(Seq("web" -> 100L, "code" -> 50L, "web" -> 70L), 10L))
    assert(dup.getMessage.contains("duplicate domain names"))
    assert(dup.getMessage.contains("web"))
  }
}
