package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-depth graph walk by POINTER DOUBLING — the O(log d) shuffle
  * alternative to step-at-a-time recursion (a recursive CTE or an
  * iterative-join loop runs one join + one driver scheduling round per
  * depth step; at depth d over a large cluster that is d sequential
  * shuffle barriers, and on a busy driver d stall opportunities — the
  * round-7 bench's dominant variance source).
  *
  * Semantics: identical to the depth-capped recursive walk
  * {{{
  *   walk(key, node, 1)  for every start row
  *   walk(key, next, depth+1)  for walk ⋈ edges, depth+1 ≤ maxDepth
  * }}}
  * Invariant: after the iteration with stride s, `paths` holds EVERY
  * (key, node, depth ≤ min(2s, maxDepth)) — each new depth d in (s, 2s]
  * is reached by extending the existing depth d−s ∈ [1, s] row with the
  * stride-s jump table, and jump_{2s} = jump_s ∘ jump_s. So ⌈log₂ d⌉
  * rounds replace d−1, and the whole walk is ONE declarative plan: the
  * loop below builds the plan driver-side without running a single job,
  * leaving Catalyst/AQE free to pick join strategies per level.
  *
  * Contract: `edges` must be FUNCTIONAL per (key, src) — at most one
  * outgoing edge, the linked-list/chain shape (order chains, session
  * successor walks). On a branching graph the same (key, node, depth) can
  * be produced through multiple paths; dedup downstream if that shape is
  * ever needed.
  */
object PathDoubling {

  /** @param starts depth-1 start rows `(key, node)`
    * @param edges  functional edge list `(key, src, dst)`
    * @param maxDepth inclusive depth cap (≥ 1)
    * @return `(key, node, depth)` — one row per visited position
    */
  def walk(starts: DataFrame, edges: DataFrame, maxDepth: Int): DataFrame = {
    require(maxDepth >= 1, s"maxDepth must be >= 1, got $maxDepth")
    var paths = starts.select(col("key"), col("node"), lit(1).as("depth"))
    var jump = edges.select(col("key"), col("src"), col("dst"), lit(1).as("stride"))
    var stride = 1
    while (stride < maxDepth) {
      val ext = paths
        .join(jump
            .select(col("key"), col("src").as("node"),
              col("dst").as("next"), col("stride")),
          Seq("key", "node"))
        .select(col("key"), col("next").as("node"),
          (col("depth") + col("stride")).as("depth"))
        .filter(col("depth") <= maxDepth)
      paths = paths.unionByName(ext)
      stride *= 2
      if (stride < maxDepth) {
        jump = jump.alias("a")
          .join(jump.select(col("key"), col("src").as("mid2"),
              col("dst").as("dst2"), col("stride").as("stride2")).alias("b"),
            col("a.key") === col("b.key") && col("a.dst") === col("b.mid2"))
          .select(col("a.key").as("key"), col("a.src").as("src"),
            col("b.dst2").as("dst"),
            (col("a.stride") + col("b.stride2")).as("stride"))
      }
    }
    paths
  }
}
