package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  // chain 1→2→3, branch 3→4 and 3→5, separate pair 10→11
  private lazy val edges = Seq(
    (1L, 2L, 0.1), (2L, 3L, 0.2), (3L, 4L, 0.3), (3L, 5L, 0.4), (10L, 11L, 0.5))
    .toDF("parent_id", "child_id", "weight")

  test("reachability with hop counts") {
    val got = GraphOps.reachableFrom(edges, Seq(1L).toDF("id"))
      .as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 3))
  }

  test("degrees") {
    val d = GraphOps.degrees(edges).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(d(3L) == (2L, 1L)) // two out-edges, one in-edge
    assert(d(11L) == (0L, 1L))
    assert(d(1L) == (1L, 0L))
  }

  test("components span the whole weakly-connected graph") {
    val comps = GraphOps.components(edges).as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L, 5L).map(comps).distinct.size == 1)
    assert(comps(10L) == comps(11L))
    assert(comps(1L) != comps(10L))
  }

  test("chain membership excludes branch nodes") {
    val chains = GraphOps.chainMembership(edges).as[(Long, Long)].collect().toMap
    // 3 has out-degree 2 → edges 3→4 / 3→5 are not chain edges
    assert(chains(1L) == chains(2L))
    assert(!chains.contains(4L) || chains.get(4L) != chains.get(1L))
    assert(chains(10L) == chains(11L))
  }

  test("deployment row limits") {
    import graft.core.EngineConf
    val df = (1 to 5000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    assert(EngineConf.applyLimit(df, EngineConf.Local, Seq(col("id"))).count() == 100)
    assert(EngineConf.applyLimit(df, EngineConf.Branch, Seq(col("id"))).count() == 1000)
    assert(EngineConf.applyLimit(df, EngineConf.Prod, Seq(col("id"))).count() == 5000)
    assert(EngineConf.fromEnv(Map("GRAFT_DEPLOYMENT" -> "local")) == EngineConf.Local)
    assert(EngineConf.fromEnv(Map.empty) == EngineConf.Prod)
    // limited output is deterministic thanks to the explicit ordering
    val a = EngineConf.applyLimit(df.repartition(7), EngineConf.Local, Seq(col("id")))
      .as[(Long, String)].collect().toSeq
    val b = EngineConf.applyLimit(df.repartition(3), EngineConf.Local, Seq(col("id")))
      .as[(Long, String)].collect().toSeq
    assert(a == b)
  }

  test("pagerankPpm matches the hand-unrolled integer recurrence") {
    // 1→2, 1→3, 2→3, 3→1: hand-roll r1 with r0 = 1e6
    //   out(1)=2, out(2)=1, out(3)=1
    //   r1(1) = 150000 + 850000*(1000000 div 1)          div 1e6 = 1000000
    //   r1(2) = 150000 + 850000*(1000000 div 2)          div 1e6 = 575000
    //   r1(3) = 150000 + 850000*(500000 + 1000000)       div 1e6 = 1425000
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val n = Seq(1L, 2L, 3L).toDF("id")
    val r1 = GraphOps.pagerankPpm(e, n, iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(r1 == Map(1L -> 1000000L, 2L -> 575000L, 3L -> 1425000L))
    // deterministic across runs and partitionings; mass stays bounded
    val a = GraphOps.pagerankPpm(e.repartition(4), n, iters = 3)
      .as[(Long, Long)].collect().toMap
    val b = GraphOps.pagerankPpm(e, n, iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(a == b)
    assert(a.values.forall(r => r >= 150000L && r <= 3000000L))
  }

  test("weightedPagerankPpm matches the hand-unrolled weighted recurrence; uniform weights reduce to pagerankPpm") {
    // 1→2 (w 3), 1→3 (w 1), 2→3 (w 2), 3→1 (w 5): W(1)=4, W(2)=2, W(3)=5
    //   r1(1) = 150000 + 850000·(1e6·5 div 5) div 1e6 = 1000000
    //   r1(2) = 150000 + 850000·(1e6·3 div 4) div 1e6 = 787500
    //   r1(3) = 150000 + 850000·(1e6·1 div 4 + 1e6·2 div 2) div 1e6 = 1212500
    val e = Seq((1L, 2L, 3L), (1L, 3L, 1L), (2L, 3L, 2L), (3L, 1L, 5L))
      .toDF("src", "dst", "w")
    val n = Seq(1L, 2L, 3L).toDF("id")
    val r1 = GraphOps.weightedPagerankPpm(e, n, iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(r1 == Map(1L -> 1000000L, 2L -> 787500L, 3L -> 1212500L))
    // weight-1 edges ≡ the unweighted operator, any iteration depth
    val eu = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val uw = GraphOps.pagerankPpm(eu, n, iters = 3)
      .as[(Long, Long)].collect().toMap
    val ww = GraphOps.weightedPagerankPpm(eu.withColumn("w", lit(1L)), n,
      iters = 3).as[(Long, Long)].collect().toMap
    assert(uw == ww)
    // deterministic under repartitioning
    val a = GraphOps.weightedPagerankPpm(e.repartition(4), n, iters = 3)
      .as[(Long, Long)].collect().toMap
    val b = GraphOps.weightedPagerankPpm(e, n, iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("weightedPagerankPpm: non-positive edge weight fails loudly") {
    // w = 0 would make wout = 0 possible and `r div wout` NULL — the
    // source's contributions would silently drop from the documented
    // recurrence; the operator must raise instead
    val e = Seq((1L, 2L, 0L), (2L, 1L, 3L)).toDF("src", "dst", "w")
    val n = Seq(1L, 2L).toDF("id")
    val ex = intercept[Exception] {
      GraphOps.weightedPagerankPpm(e, n, iters = 1).collect()
    }
    def msg(t: Throwable): String =
      Option(t.getMessage).getOrElse("") +
        Option(t.getCause).map(c => Option(c.getMessage).getOrElse("")).getOrElse("")
    assert(msg(ex).contains("non-positive edge weight"), msg(ex))
    // NULL and fractional weights are the same silent-drop class
    val en = Seq((1L, 2L, Some(3L)), (2L, 1L, None)).toDF("src", "dst", "w")
    val exN = intercept[Exception] {
      GraphOps.weightedPagerankPpm(en, n, iters = 1).collect()
    }
    assert(msg(exN).contains("non-positive edge weight"), msg(exN))
    val ef = Seq((1L, 2L, 1.5), (2L, 1L, 3.0)).toDF("src", "dst", "w")
    val exF = intercept[Exception] {
      GraphOps.weightedPagerankPpm(ef, n, iters = 1).collect()
    }
    assert(msg(exF).contains("non-integral edge weight"), msg(exF))
  }

  test("pagerankPpm: node with no in-edges settles at the base rank") {
    val e = Seq((1L, 2L)).toDF("src", "dst")
    val n = Seq(1L, 2L).toDF("id")
    val r = GraphOps.pagerankPpm(e, n, iters = 3).as[(Long, Long)].collect().toMap
    assert(r(1L) == 150000L)
  }

  test("personalizedPagerankPpm matches the hand-unrolled seeded recurrence") {
    // path 1→2→3 plus isolated 4; seed = {1}; r0 = (1e6, 0, 0, 0)
    //   out(1)=1, out(2)=1, out(3)=0 (dangling), 4 untouched
    //   r1(1) = 150000 (seed restart, no in-mass)
    //   r1(2) = 0 + 850000·(1000000 div 1) div 1e6 = 850000
    //   r1(3) = 0 (source r0(2) = 0 — sparse frontier ships nothing)
    //   r1(4) = 0 (non-seed, unreached)
    val e = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val n = Seq(1L, 2L, 3L, 4L).toDF("id")
    val sd = Seq(1L).toDF("id")
    val r1 = GraphOps.personalizedPagerankPpm(e, n, sd, iters = 1)
      .select(col("id"), col("ppr_ppm")).as[(Long, Long)].collect().toMap
    assert(r1 == Map(1L -> 150000L, 2L -> 850000L, 3L -> 0L, 4L -> 0L))
    // round 2: mass reaches 3; 4 stays exactly 0 (teleport-only-to-seeds)
    val r2 = GraphOps.personalizedPagerankPpm(e, n, sd, iters = 2)
      .select(col("id"), col("ppr_ppm")).as[(Long, Long)].collect().toMap
    assert(r2 == Map(1L -> 150000L, 2L -> 127500L,
      3L -> 722500L, 4L -> 0L)) // r2(2) = 850000·150000 div 1e6; r2(3) = 850000·850000 div 1e6
    // partitioning-independence (integer sums are order-free)
    val a = GraphOps.personalizedPagerankPpm(e.repartition(4), n, sd, iters = 3)
      .select(col("id"), col("ppr_ppm")).as[(Long, Long)].collect().toMap
    assert(a == GraphOps.personalizedPagerankPpm(e, n, sd, iters = 3)
      .select(col("id"), col("ppr_ppm")).as[(Long, Long)].collect().toMap)
  }

  test("personalizedPagerankPpm: unreachable component carries zero mass") {
    // component {1,2} seeded; component {10,11} must stay at exactly 0 —
    // the locality that makes PPR's per-round work track the seed ball
    val e = Seq((1L, 2L), (2L, 1L), (10L, 11L), (11L, 10L)).toDF("src", "dst")
    val n = Seq(1L, 2L, 10L, 11L).toDF("id")
    val r = GraphOps.personalizedPagerankPpm(e, n, Seq(1L).toDF("id"), iters = 4)
      .select(col("id"), col("ppr_ppm")).as[(Long, Long)].collect().toMap
    assert(r(10L) == 0L && r(11L) == 0L)
    assert(r(1L) > 0L && r(2L) > 0L)
  }

  private def lpa(edges: Seq[(Long, Long)], nodes: Seq[Long], iters: Int = 3) =
    GraphOps.labelPropagation(
        edges.toDF("src", "dst"), nodes.toDF("id"), iters)
      .as[(Long, Long)].collect().toMap

  test("labelPropagation: star collapses to the smallest label, by hand") {
    // round 1: each leaf votes {center=10, self} -> tie -> own label wins
    // only for leaf 1 (smallest); center votes {1,2,3,10} -> 1.
    // round 2: leaves all see center=1 + self -> 1 (tie at leaf 1 keeps 1,
    // leaves 2/3 tie {1, self} -> 1). round 3: stable.
    val out = lpa(Seq((10L, 1L), (10L, 2L), (10L, 3L)), Seq(1L, 2L, 3L, 10L))
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 1L))
  }

  test("labelPropagation: disconnected cliques get their own min-id communities") {
    val k1 = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val k2 = Seq((7L, 8L), (8L, 9L), (7L, 9L))
    val out = lpa(k1 ++ k2, Seq(1L, 2L, 3L, 7L, 8L, 9L))
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      7L -> 7L, 8L -> 7L, 9L -> 7L))
  }

  test("labelPropagation: isolated node keeps its own label via the self-vote") {
    val out = lpa(Seq((1L, 2L)), Seq(1L, 2L, 99L))
    assert(out(99L) == 99L)
  }

  test("labelPropagation: orientation- and partitioning-independent") {
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 3L), (5L, 4L), (5L, 6L))
    val nodes = (1L to 6L)
    val a = lpa(edges, nodes)
    val b = lpa(edges.map(_.swap), nodes)
    val c = GraphOps.labelPropagation(
        edges.toDF("src", "dst").repartition(7), nodes.toDF("id").repartition(3), 3)
      .as[(Long, Long)].collect().toMap
    assert(a == b && a == c)
  }

  /** Brute-force triangle reference: enumerate all vertex triples over
    * the adjacency set — the literal definition the degree-ordered
    * node-iterator must match per node. */
  private def bruteTriangles(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = pairs.flatMap(p => Seq(p, p.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSet }
    val nodes = adj.keys.toSeq.sorted
    val counts = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for {
      i <- nodes; j <- nodes if j > i && adj(i)(j)
      k <- nodes if k > j && adj(i)(k) && adj(j)(k)
    } { counts(i) += 1; counts(j) += 1; counts(k) += 1 }
    counts.toMap
  }

  private def triCounts(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    GraphOps.triangleCounts(pairs.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap

  test("triangleCounts: hand fixtures — triangle, square, clique, star") {
    // K3: each node in 1 triangle
    assert(triCounts(Seq((1L, 2L), (1L, 3L), (2L, 3L))) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // C4 (square, no diagonal): zero triangles
    assert(triCounts(Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))).isEmpty)
    // K4: 4 triangles, each node in 3
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    assert(triCounts(k4) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // star: hub + leaves, no closing edges → zero
    assert(triCounts(Seq((1L, 10L), (2L, 10L), (3L, 10L))).isEmpty)
  }

  /** Literal sequential peel: repeatedly delete ANY node with degree < k
    * until none remains — order-independent result (the k-core is unique),
    * so this is a valid reference for the synchronous peel. */
  private def bruteKCore(pairs: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
    var edges = pairs.toSet
    var changed = true
    while (changed) {
      val deg = edges.toSeq.flatMap(p => Seq(p._1, p._2))
        .groupBy(identity).map { case (id, v) => id -> v.size }
      val drop = deg.filter(_._2 < k).keySet
      changed = drop.nonEmpty
      edges = edges.filterNot(p => drop(p._1) || drop(p._2))
    }
    edges.toSeq.flatMap(p => Seq(p._1, p._2))
      .groupBy(identity).map { case (id, v) => id -> v.size.toLong }
  }

  private def coreNodes(pairs: Seq[(Long, Long)], k: Int): Map[Long, Long] =
    GraphOps.kCore(pairs.toDF("a", "b"), k).nodes
      .as[(Long, Long)].collect().toMap

  test("kCore: hand fixtures — clique survives, tail peels, cascade empties") {
    // K4 plus a pendant chain 4-5-6: 3-core = exactly the K4
    val k4 = (for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)) ++
      Seq((4L, 5L), (5L, 6L))
    assert(coreNodes(k4, 3) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // C4: every node degree 2 → 2-core is the whole cycle, 3-core empty
    val c4 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))
    assert(coreNodes(c4, 2) == Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 2L))
    assert(coreNodes(c4, 3).isEmpty)
    // path 1-2-3-4: 2-core empty via a multi-round endpoint cascade
    assert(coreNodes(Seq((1L, 2L), (2L, 3L), (3L, 4L)), 2).isEmpty)
  }

  test("kCore: randomized agreement with the sequential reference peel") {
    val rnd = new scala.util.Random(29)
    for (trial <- 1 to 5) {
      val pairs = (for {
        i <- 1L to 14L; j <- (i + 1) to 14L if rnd.nextInt(3) == 0
      } yield (i, j)).toSeq
      for (k <- Seq(2, 3, 4)) {
        val res = GraphOps.kCore(pairs.toDF("a", "b"), k)
        assert(res.converged, s"trial $trial k=$k did not converge")
        val got = res.nodes.as[(Long, Long)].collect().toMap
        assert(got == bruteKCore(pairs, k), s"trial $trial k=$k")
        // the surviving edge set matches the node set exactly
        val edgeEnds = res.edges.as[(Long, Long)].collect()
          .flatMap(p => Seq(p._1, p._2)).toSet
        assert(edgeEnds == got.keySet)
      }
    }
  }

  test("triangleCounts: randomized agreement with the brute triple scan") {
    val rnd = new scala.util.Random(17)
    for (trial <- 1 to 5) {
      val pairs = (for {
        i <- 1L to 15L; j <- (i + 1) to 15L if rnd.nextInt(3) == 0
      } yield (i, j)).toSeq
      if (pairs.nonEmpty)
        assert(triCounts(pairs) == bruteTriangles(pairs), s"trial $trial")
    }
  }
}
