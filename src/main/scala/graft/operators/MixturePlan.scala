package graft.operators

/** Token-budget ALLOCATION across corpus domains — temperature-weighted
  * WATERFILLING with availability caps, the planning step of data
  * mixing (the reference's pipeline feeds fixed per-source corpora;
  * a 100 TB trainer instead fixes a token BUDGET and asks how to split
  * it across domains: upsample low-resource domains — the temperature
  * weighting every large-LM data recipe uses (GPT-3 App. A, XLM-R §3.1
  * describe the ∝ n^α rule) — without allocating more than a domain
  * HAS). q115's oversampling operator is the uncapped sibling; this one
  * adds the budget + stock constraints:
  *
  *   maximize allocation proportional to w_d = isqrt(n_d)   (α = 0.5)
  *   subject to Σ alloc_d ≤ B   and   alloc_d ≤ n_d
  *
  * Solved by synchronous-round waterfilling: give every open domain its
  * proportional share of the remaining budget; domains whose share
  * covers their whole stock become CAPPED (alloc = n_d, they leave the
  * pool and return their unused share); repeat until no new domain
  * caps. The capped set grows monotonically, so the loop converges in
  * ≤ |domains| rounds.
  *
  * DETERMINISM: all arithmetic is Long (truncating division); isqrt is
  * floor(IEEE sqrt) with a ±1 correction step — IEEE 754 sqrt is
  * correctly rounded, so any engine computes the identical weight. The
  * oracle unrolls the same synchronous rounds as SQL CTE stages; the
  * round a domain capped in is part of the output, so a drifted
  * iteration order hash-mismatches.
  *
  * SCALE: the per-domain token counts come from a distributed
  * aggregation; the waterfill itself runs on the |domains|-row
  * aggregate — bounded by contract (`require ≤ 64`), the same
  * driver-local discipline as the planner/centroid frames. The plan's
  * consumers (the sampling job) are corpus-sized and fully distributed.
  */
object MixturePlan {

  /** One domain's allocation: `cappedRound` = the synchronous round the
    * domain's stock was exhausted in (0 = never; it holds a fractional
    * share). */
  final case class Alloc(domain: String, nTokens: Long, weight: Long,
      allocTokens: Long, cappedRound: Long)

  /** Per-document keep probability executing an allocation, on the ppm
    * grid: alloc/stock with a LOUD overflow guard (DuckDB's BIGINT
    * multiply errors at the same point — the two engines must fail
    * together, never silently diverge). One definition shared by q256
    * and the ScaleSmoke row so the two cannot drift. */
  def keepPpm(a: Alloc): Long = {
    require(a.allocTokens <= Long.MaxValue / 1000000L,
      s"keep_ppm overflow for ${a.domain}: alloc ${a.allocTokens}")
    if (a.nTokens > 0) a.allocTokens * 1000000L / a.nTokens else 0L
  }

  /** floor(√n) exactly: floor of the correctly-rounded IEEE sqrt plus a
    * one-step correction (enough because IEEE sqrt errs by < 1 ulp). */
  def isqrt(n: Long): Long = {
    require(n >= 0L, s"isqrt of negative $n")
    // domain bound keeps (s0+1)² inside Long (and matches the oracle's
    // double-sqrt path); 4·10^18 tokens is ~16 000× a 100 TB corpus
    require(n <= 4_000_000_000_000_000_000L,
      s"isqrt domain bound exceeded: $n")
    val s0 = math.sqrt(n.toDouble).toLong
    s0 + (if ((s0 + 1) * (s0 + 1) <= n) 1L else 0L) -
      (if (s0 * s0 > n) 1L else 0L)
  }

  /** Waterfill `budget` tokens across `domains` = (name, stock) pairs.
    * `maxRounds` must match the oracle's unroll depth; non-convergence
    * within it fails LOUDLY (it means more domains capped sequentially
    * than the unroll covers — raise both sides together). NOTE the
    * default depth of 8 is sized to the call sites, not the 64-domain
    * contract bound: a legal deeply-cascading input (each round capping
    * exactly one of up to 64 domains) needs `maxRounds` — and the
    * oracle unroll — raised to |domains|; the convergence check below
    * turns a too-shallow depth into a loud error, never a wrong plan.
    * Domain names must be unique — round state is keyed by name, so
    * duplicates would silently conflate two stocks into one cap. */
  def waterfill(domains: Seq[(String, Long)], budget: Long,
      maxRounds: Int = 8): Seq[Alloc] = {
    require(domains.nonEmpty, "waterfill needs at least one domain")
    require(domains.size <= 64,
      s"waterfill is a bounded driver-local computation (${domains.size} > 64 domains)")
    require(domains.map(_._1).distinct.size == domains.size,
      s"duplicate domain names: ${domains.map(_._1).diff(domains.map(_._1).distinct).distinct.mkString(", ")}")
    require(budget >= 0L, s"budget must be >= 0, got $budget")
    val w = domains.map { case (dom, n) =>
      require(n >= 0L, s"negative token stock for domain $dom: $n")
      (dom, n, isqrt(n))
    }
    val maxW = w.map(_._3).max.max(1L)
    require(budget <= Long.MaxValue / maxW,
      s"budget $budget x weight $maxW would overflow the share arithmetic")
    val cappedRound = scala.collection.mutable.Map[String, Long]()
      .withDefaultValue(0L)
    var round = 0
    var changed = true
    while (changed && round < maxRounds) {
      round += 1
      val cn = w.collect { case (d, n, _) if cappedRound(d) > 0 => n }.sum
      val uw = w.collect { case (d, _, ww) if cappedRound(d) == 0 => ww }.sum
      val r = budget - cn // >= 0: a domain caps only when its share covers n
      changed = false
      if (uw > 0) w.foreach { case (d, n, ww) =>
        if (cappedRound(d) == 0L && r * ww / uw >= n) {
          cappedRound(d) = round.toLong; changed = true
        }
      }
    }
    val cn = w.collect { case (d, n, _) if cappedRound(d) > 0 => n }.sum
    val uw = w.collect { case (d, _, ww) if cappedRound(d) == 0 => ww }.sum
    val r = budget - cn
    // explicit fixed-point verification: every open domain's share must
    // sit strictly under its stock, or the unroll depth was too shallow
    if (uw > 0) w.foreach { case (d, n, ww) =>
      require(cappedRound(d) > 0 || r * ww / uw < n,
        s"waterfill did not converge in $maxRounds rounds (domain $d still caps) — raise maxRounds AND the oracle unroll together")
    }
    w.map { case (d, n, ww) =>
      val alloc =
        if (cappedRound(d) > 0) n
        else if (uw == 0) 0L
        else r * ww / uw
      Alloc(d, n, ww, alloc, cappedRound(d))
    }
  }
}
