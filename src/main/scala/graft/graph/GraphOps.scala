package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edge-list graph operators (SURVEY §1.1 "Graph" row: the reference's
  * `recent_sessions_graph` is a plain `(user_id, parent_id, child_id,
  * weight)` edge table; traversal = iterative joins — no graph library).
  *
  * All iterative ops localCheckpoint per round (lineage truncation) and
  * converge in O(log diameter) rounds where doubling applies.
  */
object GraphOps {

  /** Nodes reachable from `sources` following parent→child edges, with
    * hop distance. BFS by iterative join; frontier deduped each round. */
  def reachableFrom(edges: DataFrame, sources: DataFrame, maxHops: Int = 20): DataFrame = {
    var frontier = sources.select(col("id")).distinct()
      .withColumn("hops", lit(0)).localCheckpoint(true)
    var visited = frontier
    var hop = 0
    var active = frontier.count() > 0
    while (hop < maxHops && active) {
      val next = frontier
        .join(edges.select(col("parent_id").as("id"), col("child_id")), "id")
        .select(col("child_id").as("id"))
        .distinct()
        .join(visited.select(col("id"), lit(true).as("__seen")), Seq("id"), "left_anti")
        .withColumn("hops", lit(hop + 1))
        .localCheckpoint(true)
      active = next.count() > 0
      visited = visited.union(next).localCheckpoint(true)
      frontier = next
      hop += 1
    }
    visited
  }

  /** Out-degree / in-degree / weight stats per node — the graph summary
    * the reference surfaces as asset metadata. */
  def degrees(edges: DataFrame): DataFrame = {
    val out = edges.groupBy(col("parent_id").as("id"))
      .agg(count(lit(1)).as("out_degree"), min(col("weight")).as("min_out_weight"))
    val in = edges.groupBy(col("child_id").as("id"))
      .agg(count(lit(1)).as("in_degree"))
    out.join(in, Seq("id"), "full_outer")
      .na.fill(0, Seq("out_degree", "in_degree"))
  }

  /** Weakly connected components of the edge list (delegates to the
    * engine's ConnectedComponents). */
  def components(edges: DataFrame): DataFrame =
    graft.operators.ConnectedComponents.components(
      edges.select(col("parent_id").as("src"), col("child_id").as("dst")))

  /** PageRank in parts-per-million INTEGER fixed point — deterministic by
    * construction: float PageRank depends on Spark's partition-level
    * summation order; integer contributions (`r div outdeg`, summed as
    * BIGINT) are order-independent, so the iterate is bit-reproducible and
    * a second engine can replay every iteration exactly (q140's oracle
    * unrolls the same recurrence in SQL).
    *
    *   r₀ = 10^6;  r_{t+1}(v) = (10^6 − d) + (d · Σ_{u→v} r_t(u) div out(u)) div 10^6
    *
    * with d the damping in ppm. Dangling mass is dropped (the standard
    * simplification) — identically on both sides.
    *
    * Scale: each iteration is one equi-join (edges ⋈ ranks on src, ranks
    * broadcast when nodes are small) + one partial-aggregated sum by dst —
    * the classic pregel-as-joins shape; lineage is cut per round. */
  def pagerankPpm(edges: DataFrame, nodes: DataFrame, iters: Int = 3,
      dampingPpm: Long = 850000L): DataFrame = {
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val e = edges.join(outdeg, "src")
    val base = 1000000L - dampingPpm
    var ranks = nodes.select(col("id"), lit(1000000L).as("r"))
    for (_ <- 1 to iters) {
      val contrib = e.join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst"), expr("r div outdeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("cs"))
      // (d·cs) div 10^6 via the split cs = q·10^6 + r ⇒ d·q + (d·r) div 10^6:
      // identical value in exact integer math, but never overflows Long —
      // the naive product wraps once a hub's contribution sum passes
      // Long.MaxValue/d ≈ 1.08e13 (reachable at 10^7+ nodes with mass
      // concentrated on one node). d·q can't overflow (q ≤ total mass div
      // 10^6 = node count), d·r < 10^6·10^6.
      ranks = nodes.join(contrib.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .select(col("id"),
          (lit(base) + expr(s"${dampingPpm}L * (coalesce(cs, 0L) div 1000000L) " +
            s"+ (${dampingPpm}L * (coalesce(cs, 0L) % 1000000L)) div 1000000L"))
            .as("r"))
        .localCheckpoint(false)
    }
    ranks
  }

  /** WEIGHTED PageRank in ppm integer fixed point — [[pagerankPpm]] with
    * edge weights (the TextRank setting, Mihalcea–Tarau EMNLP 2004:
    * co-occurrence counts as weights):
    *
    *   r_{t+1}(v) = (10^6 − d) + (d · Σ_{u→v} (r_t(u)·w(u,v)) div W(u)) div 10^6
    *
    * with W(u) = Σ_x w(u,x). The per-edge product uses the exact split
    * `r·w div W = (r div W)·w + ((r mod W)·w) div W` — identical value,
    * never overflows for `(r mod W)·w < W·w_max ≤ 2^63` (documented
    * bound: fine for count-scale weights; re-grid weights first if a
    * single edge weight times a single out-weight can pass 9.2·10^18).
    * Deterministic by the same argument as [[pagerankPpm]]: integer
    * contributions sum order-independently, so the oracle unrolls the
    * recurrence exactly. Dangling mass drops identically (symmetric
    * graphs have none).
    *
    * Scale: per round, one equi-join edges ⋈ ranks on src + one
    * partial-aggregated sum by dst — the pregel-as-joins shape; the
    * out-weight table is vocabulary/node-sized. Lineage cut per round. */
  def weightedPagerankPpm(edges: DataFrame, nodes: DataFrame,
      iters: Int = 3, dampingPpm: Long = 850000L): DataFrame = {
    // loud input contract: w ≤ 0 would make wout = 0 possible, and under
    // non-ANSI semantics `r div wout` is then NULL — that source's
    // contributions would drop SILENTLY from the sum, a quiet deviation
    // from the documented recurrence. Row-wise raise_error instead
    // (the prioritySample discipline; weights are data, not parameters).
    val ew = edges.select(col("src"), col("dst"), expr(
      """CASE WHEN w IS NULL OR w <= 0 THEN
        |  CAST(raise_error(concat('weightedPagerankPpm: non-positive edge weight ',
        |    coalesce(CAST(w AS STRING), 'NULL'))) AS LONG)
        |WHEN CAST(w AS DOUBLE) <> CAST(CAST(w AS LONG) AS DOUBLE) THEN
        |  CAST(raise_error(concat('weightedPagerankPpm: non-integral edge weight ',
        |    CAST(w AS STRING), ' would truncate')) AS LONG)
        |ELSE CAST(w AS LONG) END""".stripMargin).as("w"))
    val wout = ew.groupBy(col("src")).agg(sum(col("w")).as("wout"))
    val e = ew.join(wout, "src")
    val base = 1000000L - dampingPpm
    var ranks = nodes.select(col("id"), lit(1000000L).as("r"))
    for (_ <- 1 to iters) {
      val contrib = e.join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst"),
          expr("(r div wout) * w + ((r % wout) * w) div wout").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("cs"))
      ranks = nodes.join(contrib.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .select(col("id"),
          (lit(base) + expr(s"${dampingPpm}L * (coalesce(cs, 0L) div 1000000L) " +
            s"+ (${dampingPpm}L * (coalesce(cs, 0L) % 1000000L)) div 1000000L"))
            .as("r"))
        .localCheckpoint(false)
    }
    ranks
  }

  /** PERSONALIZED PageRank in ppm integer fixed point — random walk with
    * restart to a SEED SET (Haveliwala WWW 2002; the P³/RP³ random-walk
    * recommender of Cooper et al. 2014 when run on a bipartite
    * interaction graph): teleport mass returns only to seeds, so the
    * stationary mass concentrates in the seeds' neighborhood — the
    * graph-based expansion step that grows a trusted seed corpus into
    * its relevant surroundings.
    *
    *   r₀(v) = 10^6·[v ∈ S]
    *   r_{t+1}(v) = (10^6 − d)·[v ∈ S] + (d · Σ_{u→v} r_t(u) div out(u)) div 10^6
    *
    * Same overflow-split product and truncating integer divisions as
    * [[pagerankPpm]], so the iterate is bit-reproducible and a second
    * engine unrolls it exactly. Dangling mass drops identically.
    *
    * Scale shape: identical joins to pagerankPpm, PLUS the sparsity PPR
    * gives for free — nodes the walk has not reached carry r = 0 and are
    * filtered out of the contribution join's BUILD side, so the shuffled
    * contribution volume and the per-node aggregation track the seed
    * NEIGHBORHOOD, not the graph (at 100 TB a 3-hop ball is orders of
    * magnitude below the node count). The edge list itself is still
    * scanned once per round to probe the join — the standard
    * pregel-as-joins cost, linear and sequential-read-friendly; what the
    * frontier filter removes is the quadratic-prone part (shuffle +
    * state), not the scan. Lineage cut per round. */
  def personalizedPagerankPpm(edges: DataFrame, nodes: DataFrame,
      seeds: DataFrame, iters: Int = 3,
      dampingPpm: Long = 850000L, cutLineage: Boolean = true): DataFrame = {
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val e = edges.join(outdeg, "src")
    val base = 1000000L - dampingPpm
    // distinct: a duplicated seed id would fan the left join out and
    // silently double that node's restart and contribution mass
    val seeded = nodes
      .join(seeds.select(col("id")).distinct().withColumn("s", lit(1L)),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("s"), lit(0L)).as("is_seed"))
    var ranks = seeded.select(col("id"), col("is_seed"),
      (col("is_seed") * 1000000L).as("r"))
    for (_ <- 1 to iters) {
      val contrib = e.join(ranks.select(col("id").as("src"), col("r")), "src")
        .filter(col("r") > 0) // sparse frontier: unreached nodes ship no rows
        .select(col("dst"), expr("r div outdeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("cs"))
      ranks = seeded
        .join(contrib.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .select(col("id"), col("is_seed"),
          (col("is_seed") * base +
            expr(s"${dampingPpm}L * (coalesce(cs, 0L) div 1000000L) " +
              s"+ (${dampingPpm}L * (coalesce(cs, 0L) % 1000000L)) div 1000000L"))
            .as("r"))
      // cutLineage=false folds ALL rounds into one lazily-planned action:
      // for a small fixed `iters` the plan stays bounded and AQE's
      // ReusedExchange shares the edge/seed builds across rounds — per-
      // round checkpoints would fragment that into one multi-job query
      // per round (measured at sf0.1, q207 site, warm: 49 jobs/8.6s with
      // cuts + cached build vs 34 jobs/7.3s single-action uncached).
      // Keep the cuts (default) for large `iters`, where the uncut plan
      // tree keeps growing.
      if (cutLineage) ranks = ranks.localCheckpoint(false)
    }
    ranks.select(col("id"), col("is_seed"), col("r").as("ppr_ppm"))
  }

  /** Chains: maximal parent→child paths where each node has ≤1 out-edge
    * and ≤1 in-edge (the top-1 similarity graph is near-functional, so its
    * structure is mostly chains) — labeled by component. */
  def chainMembership(edges: DataFrame): DataFrame = {
    val deg = degrees(edges)
    val chainNodes = deg.filter(col("out_degree") <= 1 && col("in_degree") <= 1)
      .select(col("id"))
    val chainEdges = edges
      .join(chainNodes.withColumnRenamed("id", "parent_id"), "parent_id")
      .join(chainNodes.withColumnRenamed("id", "child_id"), "child_id")
    components(chainEdges)
  }

  /** Synchronous label-propagation community detection (Raghavan et al.
    * 2007), made DETERMINISTIC: every node starts labeled with its own
    * id; each round it adopts the most frequent label among its
    * neighbors PLUS one self-vote (the self-vote both anchors isolated
    * nodes and damps the bipartite two-coloring oscillation synchronous
    * LPA is known for), ties broken toward the SMALLEST label. A fixed
    * `iters` rounds — not convergence-polling — so a second engine can
    * unroll the identical recurrence (the q140 discipline; q182's oracle
    * does exactly that).
    *
    * Scale shape: one round = one equi-join (symmetrized edges ⋈ labels
    * on src) + a (node, label) count + a per-node integer argmax
    * (`min(struct(-cnt, label))` — no window, pure partial-aggregable
    * algebra). Lineage is cut per round. Labels are node ids, so the
    * argmax tie-break and the final community ids are integers end to
    * end.
    *
    * @param edges undirected input as (src, dst) pairs in either
    *              orientation; symmetrized internally.
    * @param nodes one row per node: (id).
    * @return (id, community) — community = the label held after `iters`
    *         rounds. */
  def labelPropagation(edges: DataFrame, nodes: DataFrame,
      iters: Int = 3): DataFrame = {
    // the symmetrized edge frame is re-read by EVERY round's vote join,
    // and each round is its own action (the per-round cut below), so an
    // uncached sym re-runs its union+distinct SHUFFLE once per round —
    // profiled at q182/sf0.1 as three ~11 MB-write 64-task stages of
    // 8-11 s runtime each. Persist it once (the GraphX edge-cache
    // discipline; guide §5: reused AND expensive to recompute),
    // unpersist before returning.
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist()
    try {
    var labels = nodes.select(col("id"), col("id").cast("long").as("lab"))
    for (_ <- 1 to iters) {
      val votes = sym.join(labels.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), col("lab"))
        .union(labels.select(col("id"), col("lab")))
      labels = votes
        .groupBy(col("id"), col("lab"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("id"))
        .agg(min(struct((-col("cnt")).as("nc"), col("lab"))).as("best"))
        .select(col("id"), col("best.lab").as("lab"))
        // per-round cut KEPT unconditionally (unlike personalizedPagerank
        // Ppm's cutLineage escape hatch): labels is referenced TWICE per
        // round (neighbor join + self-vote), so the uncut logical tree
        // doubles per round — the single-action variant was measured at
        // the q182 site and LOST (38 jobs/8.1s cached+cut vs 42
        // jobs/8.8s single-action)
        .localCheckpoint(false)
    }
    // materialize the last round before dropping the edge cache it reads.
    // NOTE for callers: the eager localCheckpoint means the full result is
    // materialized in executor storage at call time and its checkpointed
    // blocks live until the RDD is GC'd — callers that consumed the result
    // lazily/partially inherit that lifetime (the price of being able to
    // unpersist sym here rather than leaking the symmetrized edge cache).
    labels.select(col("id"), col("lab").as("community"))
      .localCheckpoint()
    // finally: a failed round must not leak the symmetrized edge cache
    } finally sym.unpersist(): Unit
  }

  /** Per-node triangle counts by the degree-ordered node-iterator
    * (Suri & Vassilvitskii WWW 2011 — "the curse of the last reducer"):
    * orient every edge from its lower-(degree, id) endpoint to the
    * higher, enumerate wedges only at each edge's LOW-degree end, and
    * close them against the undirected edge set. The orientation bounds
    * per-node wedge fanout by O(√m) on any graph (a star's hub generates
    * ZERO wedges because all its edges point outward-by-degree), which is
    * what makes the self-join survive skew at 100 TB; every join is an
    * equi-join (wedges shuffle on the closing (x, y) pair).
    *
    * @param pairs undirected edges normalized as (a, b) with a < b,
    *              deduplicated.
    * @return (id, tri) for nodes in ≥1 triangle. */
  def triangleCounts(pairs: DataFrame): DataFrame = {
    val pe = pairs.select(col("a"), col("b"))
    val deg = pe.select(col("a").as("id"))
      .union(pe.select(col("b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("dg"))
    // shuffle_hash everywhere a wedge-volume frame meets a join: the
    // wedge frame is O(m^1.5)-sized (41M rows at sf0.1 for 1.2M edges)
    // and a SortMergeJoin SORTS it — profiled at sf0.1 that sort spilled
    // 2.5 GB memory + 0.5 GB disk and was the superlinear-under-
    // contention hotspot in BENCH_r12 (105.5s vs 17.8s quiet at ~1.6x
    // ambient load: sort spill + GC degrade non-proportionally when CPU
    // is starved). A shuffled hash join streams the wedge side with no
    // sort and builds only the edge/degree side per partition; none of
    // these sides could ever broadcast at real scale (edges and nodes
    // are corpus-sized), so the hint also keeps the bench plan honest.
    val o = pe
      .join(deg.select(col("id").as("a"), col("dg").as("da"))
        .hint("shuffle_hash"), "a")
      .join(deg.select(col("id").as("b"), col("dg").as("db"))
        .hint("shuffle_hash"), "b")
      .select(
        when(col("da") <= col("db"), col("a")).otherwise(col("b")).as("u"),
        when(col("da") <= col("db"), col("b")).otherwise(col("a")).as("v"))
    val wedges = o.select(col("u"), col("v").as("x"))
      .join(o.select(col("u"), col("v").as("y")).hint("shuffle_hash"), "u")
      .filter(col("x") < col("y"))
    val tri = wedges.join(pe.hint("shuffle_hash"),
      wedges("x") === pe("a") && wedges("y") === pe("b"))
      .select(col("u"), col("x"), col("y"))
    // ONE pass over the closing join's output: each triangle credits its
    // three corners via explode. The previous three-projection union made
    // the per-node count a THREE-consumer plan — the wedge exchange was
    // read (and its SMJ side sorted) once per branch, tripling the
    // heaviest stage's shuffle read (profiled: 1067 MB read ≈ 3× the
    // 350 MB wedge shuffle).
    tri.select(explode(array(col("u"), col("x"), col("y"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("tri"))
  }

  /** Result of a k-core peel: surviving nodes with their in-core degree,
    * the surviving edge set, whether the peel reached its fixpoint within
    * the round budget, and the rounds actually run. */
  final case class KCoreResult(nodes: DataFrame, edges: DataFrame,
      converged: Boolean, rounds: Int)

  /** The k-core: the maximal subgraph in which every node has degree ≥ k
    * (Seidman 1983; Matula & Beck JACM 1983's peeling), by synchronous
    * iterative peeling — each round recomputes degrees over the surviving
    * edge set and drops every node below k. The peel is monotone (nodes
    * only leave), so an unchanged survivor COUNT is an exact fixpoint
    * test, and the whole recurrence is integer counts end to end — a
    * second engine unrolls the identical rounds (q204's oracle).
    *
    * Scale shape: one round = one union + count groupBy (degree) + two
    * equi-joins (edge restriction) — no windows, no collects; survivor
    * state stays distributed and lineage is cut per round. Rounds needed
    * = the number of layers the synchronous peel collapses, typically
    * far below the sequential min-degree peel's O(n) steps.
    *
    * @param pairs undirected edges normalized as (a, b) with a < b,
    *              deduplicated.
    * @param k     minimum in-core degree.
    * @param maxRounds round budget; `converged=false` if the fixpoint
    *              was not reached (output is then the round-`maxRounds`
    *              iterate — still identical cross-engine). */
  def kCore(pairs: DataFrame, k: Int, maxRounds: Int = 12): KCoreResult = {
    require(k >= 1, s"k must be >= 1, got $k")
    var live = pairs.select(col("a"), col("b"))
    var nodes: DataFrame = null
    var prevCount = -1L
    var converged = false
    var round = 0
    while (round < maxRounds && !converged) {
      // Round shape notes (measured r17, q204 site at sf0.1): the ONLY
      // big exchange per round is the degree aggregation — the two
      // node-restriction joins run as broadcast hash joins of the
      // materialized (tiny relative to edges) node RDD, so the edge
      // frame itself is never reshuffled. Two tempting "fewer joins"
      // rewrites LOST here and are recorded so they are not re-tried: a
      // count-window over exploded endpoint rows (9.4 s warm vs 6.5 —
      // WindowExec sorts and buffers, no codegen), and a single
      // explode+join+count==2 survival pass (9.2 s — the in-plan node
      // frame forces a sort-merge join that reshuffles and sorts the
      // exploded edges every round).
      nodes = live.select(col("a").as("id"))
        .union(live.select(col("b").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .localCheckpoint(false)
      // LAZY checkpoint, materialized and counted by ONE RDD-level job:
      // a Dataset.count() is a two-job aggregate under AQE (partial
      // stage + single-partition final), while counting the checkpoint
      // RDD's rows directly is one job over the just-materialized
      // blocks — same number, half the driver round-trips per round.
      val n = nodes.queryExecution.toRdd.count()
      round += 1
      if (n == prevCount) converged = true
      else {
        prevCount = n
        live = live
          .join(nodes.select(col("id").as("a")), "a")
          .join(nodes.select(col("id").as("b")), "b")
          .select(col("a"), col("b"))
          .localCheckpoint(false)
      }
    }
    KCoreResult(nodes, live, converged, round)
  }

  /** HyperBall (Boldi–Vigna, ALENEX 2013): per-node HyperLogLog counters
    * of the radius-r ball, iterated by REGISTER MAX-MERGE along edges —
    * the neighborhood-function / effective-diameter estimator that works
    * where per-node BFS cannot (Σ over nodes of |Ball(v, r)| would need
    * n BFS runs; here each round is ONE equi-join + partial-max
    * aggregation over (node, register) rows, n·m state total). Built on
    * the repo's deterministic HLL ([[graft.operators.HllSketch]]: 48-bit
    * md5 registers, no float log anywhere), so both engines replay every
    * register bit — the oracle unrolls the rounds.
    *
    * `edges`: (src, dst) DIRECTED rows (symmetrize for undirected balls).
    * Returns (radius, id, reg, max_rho) for radius 0..rounds; radius 0 is
    * the singleton {v}. Correctness invariant (spec-pinned): the radius-r
    * registers of v EQUAL `HllSketch.registers` of the exact BFS ball
    * B(v, r) — max-merge along edges commutes with set union, which is
    * the whole HyperBall trick.
    *
    * 100 TB shape: state is n·m rows (m = 2^p registers), each round
    * shuffles |E|·m posting rows through a partial-max — mergeable all
    * the way down, no frontier materialization, no per-node traversal.
    * Rounds are unrolled lazily (2–3 typical) so AQE plans the whole
    * chain and reuses the edge exchange across rounds. */
  def hyperBallRegisters(edges: DataFrame, rounds: Int, p: Int = 4,
      salt: String = "hb-v1"): DataFrame = {
    require(rounds >= 1 && rounds <= 6, s"rounds=$rounds out of [1,6]")
    val nodes = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id"))).distinct()
    var b = graft.operators.HllSketch.registers(
      nodes.withColumn("v", col("id")), "id", "v", p, salt)
    var out = b.withColumn("radius", lit(0L))
    for (r <- 1 to rounds) {
      // forward ball: v absorbs its SUCCESSORS' registers (v → w pulls
      // w's counters into v), so after r rounds v holds exactly the
      // nodes reachable FROM v within r hops — the documented B(v, r).
      // (The src→dst emission this replaced computed the IN-ball on
      // directed input; identical on symmetrized graphs, which is why
      // every in-repo caller — and the old spec — never noticed.)
      val fromNbrs = edges
        .join(b.withColumnRenamed("id", "dst"), "dst")
        .select(col("src").as("id"), col("reg"), col("max_rho"))
      b = b.unionByName(fromNbrs)
        .groupBy(col("id"), col("reg")).agg(max(col("max_rho")).as("max_rho"))
      out = out.unionByName(b.withColumn("radius", lit(r.toLong)))
    }
    out.select(col("radius"), col("id"), col("reg"), col("max_rho"))
  }

  /** Per-(radius, node) integer ball-size estimate from
    * [[hyperBallRegisters]] output — q238's arithmetic as a reusable
    * step (p = 4 ONLY: the frozen constants are α16·m²·1000 = 172288 and
    * the 2^45 register ceiling of the 48-bit md5 rho): Z is scaled by
    * 2^45 so every 2^(45−ρ) is an exact BIGINT and absent registers
    * contribute 2^45; `est_milli = ⌊172288·2^45 / Z_s⌋` in
    * DECIMAL(38,0) ≡ HUGEINT (raw FFGM estimate — HllSketch's documented
    * no-small-range-correction stance). Output:
    * (radius, id, n_regs, z_scaled, est_milli). `p` exists only to be
    * REQUIRED 4: registers built at another precision would silently
    * yield garbage (negative Z once a node holds > 16 registers). */
  def ballEstMilli(regs: DataFrame, p: Int = 4): DataFrame = {
    require(p == 4,
      s"ballEstMilli's frozen constants (m=16, α16·m²·1000=172288) are p=4-only, got $p")
    regs.groupBy(col("radius"), col("id"))
      .agg(count(lit(1)).as("n_regs"),
        sum(expr("shiftleft(1L, cast(45 - max_rho as int))")).as("zp"))
      .select(col("radius"), col("id"), col("n_regs"),
        (col("zp") + (lit(16L) - col("n_regs")) * lit(35184372088832L))
          .as("z_scaled"))
      .withColumn("est_milli", expr(
        "CAST((CAST(172288 AS DECIMAL(38,0)) * 35184372088832) div z_scaled AS LONG)"))
  }

  /** HARMONIC CENTRALITY estimated by HyperBall (Boldi–Vigna 2014,
    * "Axioms for centrality" — the score HyperBall was built to compute
    * for every node at once): `H(v) = Σ_{u≠v} 1/d(u,v)`, truncated at
    * radius 2 (contributions beyond the horizon are deliberately
    * dropped — the standard HyperBall trade, documented rather than
    * estimated):
    * {{{
    *   H₂(v) = (|B(v,1)| − |B(v,0)|) / 1 + (|B(v,2)| − |B(v,1)|) / 2
    * }}}
    * with ball sizes the [[ballEstMilli]] integer-HLL estimates, emitted
    * ×2 so the 1/2 weight stays integer:
    * `harm_x2_milli = 2·(est₁ − est₀) + (est₂ − est₁)`. Register
    * max-merge is monotone, so Z is non-increasing and est_r
    * non-decreasing in r — every shell term is ≥ 0 (spec-pinned along
    * with the clique identity: all members of an isolated clique share
    * one centrality).
    *
    * Scale shape: exactly [[hyperBallRegisters]]' n·m-row state plus one
    * radius→column pivot aggregation — all-nodes centrality with no
    * per-node traversal, the shape closeness/harmonic needs at 100 TB
    * where n BFS runs are unthinkable. Output: (id, est0_milli,
    * est1_milli, est2_milli, harm_x2_milli). */
  def harmonicX2Milli(edges: DataFrame, p: Int = 4,
      salt: String = "hb-v1"): DataFrame = {
    require(p == 4, s"ballEstMilli's frozen grid constants are p=4-only, got $p")
    harmonicX2MilliFromEst(
      ballEstMilli(hyperBallRegisters(edges, rounds = 2, p, salt)))
  }

  /** The radius-pivot + shell-arithmetic half of [[harmonicX2Milli]]
    * over an ALREADY-COMPUTED per-(radius, id) ball-estimate frame
    * ([[ballEstMilli]]'s output, radii 0..2) — lets two consumers of the
    * same register iterate (the q238 NF view and the q242 centrality
    * view) share one materialized estimate artifact. */
  def harmonicX2MilliFromEst(est: DataFrame): DataFrame = {
    est.groupBy(col("id")).agg(
        sum(when(col("radius") === 0, col("est_milli"))).as("est0_milli"),
        sum(when(col("radius") === 1, col("est_milli"))).as("est1_milli"),
        sum(when(col("radius") === 2, col("est_milli"))).as("est2_milli"))
      .select(col("id"), col("est0_milli"), col("est1_milli"),
        col("est2_milli"),
        (lit(2L) * (col("est1_milli") - col("est0_milli")) +
          (col("est2_milli") - col("est1_milli"))).as("harm_x2_milli"))
  }
}
