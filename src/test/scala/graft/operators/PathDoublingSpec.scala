package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PathDoubling semantics + the q81 three-way agreement: the pointer-
  * doubling walk, Spark's own WITH RECURSIVE surface (SURVEY §2.7 — kept
  * pinned here after q81's Spark side moved off it), and the hand-derived
  * expectation must all coincide. */
class PathDoublingSpec extends SparkSpec {
  import spark.implicits._

  test("walk enumerates every depth along a chain, capped at maxDepth") {
    // key 1: chain 10→11→12→13→14→15→16 (7 nodes, cap cuts at depth 6)
    // key 2: chain 20→21 (shorter than the cap)
    // key 3: isolated start 30 (no outgoing edge)
    val starts = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("key", "node")
    val edges = ((10L to 15L).map(n => (1L, n, n + 1)) :+ ((2L, 20L, 21L)))
      .toDF("key", "src", "dst")
    val got = PathDoubling.walk(starts, edges, maxDepth = 6)
      .as[(Long, Long, Int)].collect().toSet
    val want = (1 to 6).map(d => (1L, 9L + d, d)).toSet ++
      Set((2L, 20L, 1), (2L, 21L, 2), (3L, 30L, 1))
    assert(got === want)
  }

  test("maxDepth 1 returns exactly the start rows") {
    val starts = Seq((1L, 10L)).toDF("key", "node")
    val edges = Seq((1L, 10L, 11L)).toDF("key", "src", "dst")
    val got = PathDoubling.walk(starts, edges, maxDepth = 1)
      .as[(Long, Long, Int)].collect().toSet
    assert(got === Set((1L, 10L, 1)))
  }

  test("the walk plan runs ZERO driver actions until the sink consumes it") {
    // the whole point vs the recursive CTE: plan construction is free
    val jobsBefore = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val starts = Seq((1L, 10L)).toDF("key", "node")
    val edges = Seq((1L, 10L, 11L)).toDF("key", "src", "dst")
    val df = PathDoubling.walk(starts, edges, maxDepth = 8)
    df.queryExecution.executedPlan // force planning too
    val jobsAfter = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(jobsAfter === jobsBefore, "plan construction must not run jobs")
    assert(df.count() === 2L)
  }

  test("property: random functional forests ≡ driver-side sequential walk") {
    // deterministic pseudo-random forests: each key gets a chain-with-
    // tail shape built from a seeded RNG; the oracle is the obvious
    // sequential walk the doubling must reproduce exactly
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 10) {
      val nKeys = 1 + rnd.nextInt(4)
      val maxDepth = 1 + rnd.nextInt(9)
      val rows = (1 to nKeys).flatMap { k =>
        val n = 1 + rnd.nextInt(12)
        // nodes 0..n-1; functional next: node i -> i+1 for i < cut
        val cut = rnd.nextInt(n)
        (0 until cut).map(i => (k.toLong, i.toLong * 7, (i + 1).toLong * 7))
      }
      val startNode = 0L
      val starts = (1 to nKeys).map(k => (k.toLong, startNode)).toDF("key", "node")
      val edges = rows.toDF("key", "src", "dst")
      val got = PathDoubling.walk(starts, edges, maxDepth)
        .as[(Long, Long, Int)].collect().toSet
      // sequential oracle
      val nextOf = rows.groupBy(_._1).map { case (k, es) =>
        k -> es.map(e => e._2 -> e._3).toMap
      }
      val want = (1 to nKeys).flatMap { k =>
        val m = nextOf.getOrElse(k.toLong, Map.empty[Long, Long])
        Iterator.iterate(Option(startNode))(_.flatMap(m.get))
          .takeWhile(_.isDefined).take(maxDepth).zipWithIndex
          .map { case (n, d) => (k.toLong, n.get, d + 1) }.toSeq
      }.toSet
      assert(got === want, s"nKeys=$nKeys maxDepth=$maxDepth")
    }
  }

  test("q81: pointer doubling ≡ Spark's WITH RECURSIVE on the same data") {
    graft.core.Tables.registerAll(spark, sf)
    val cte = spark.sql(graft.queries.ExtendedQueries.q81Sql)
      .select(col("o_custkey"), col("o_orderkey"), col("depth").cast("int"))
      .as[(Long, Long, Int)].collect().toSet
    val doubled = graft.SparkEntry.queries("q81_recursive")(spark, sf)
      .as[(Long, Long, Int)].collect().toSet
    assert(doubled === cte)
    assert(doubled.nonEmpty)
  }
}
