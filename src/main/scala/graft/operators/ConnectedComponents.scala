package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by min-label propagation with pointer
  * jumping (SURVEY §2.4 op 24: the set-based replacement for the reference's
  * sequential UPDATE/DELETE merge loop, assets/recent_history.py:413-447).
  *
  * Semantics contract (SURVEY §2.4): merged sessions = connected components
  * of the *initial* candidate-pair graph — exactly what the reference's loop
  * computes, because its pair list is materialized once, before any merge.
  *
  * Each iteration combines
  *  1. neighbor-min propagation (label ← min over adjacent labels), and
  *  2. pointer jumping (label ← label's label),
  * giving O(log n) convergence on chains instead of O(diameter).
  * Convergence is detected by the (monotonically decreasing) sum of labels.
  * Lineage is truncated every iteration via `localCheckpoint` — without it
  * the loop re-executes the whole upstream plan each pass and the lineage
  * grows unboundedly (a classic iterative-Spark failure at scale).
  */
object ConnectedComponents {

  /** @param edges undirected edge list; columns `src`, `dst` (long ids,
    *              globally unique across any partition keys — callers with
    *              per-user graphs encode the user into the id or use
    *              user-unique ids)
    * @param localThreshold edge count below which the components are
    *              computed by driver-side union-find instead of the
    *              iterative distributed loop. Adaptive small-input fast
    *              path (same spirit as broadcast-join selection): each
    *              distributed iteration costs several Spark jobs, which
    *              dwarfs the work for graphs that fit trivially in memory;
    *              at cluster scale the distributed path engages.
    * @return (`id`, `component`) — component = min id reachable
    */
  def components(edges: DataFrame, maxIter: Int = 50,
      localThreshold: Long = 1L << 20): DataFrame = {
    val spark = edges.sparkSession
    val e2 = edges.select(col("src"), col("dst")).cache()
    if (e2.count() <= localThreshold) return localComponents(e2)
    val bidir = e2
      .union(e2.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(true)

    var labels = bidir.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id"))
      .localCheckpoint(true)

    var iter = 0
    // Convergence = no label changed this pass, detected by an id-equi-join
    // of new vs previous labels (overflow-proof, unlike a Long label sum
    // which wraps at scale and reads any zero-summing graph as converged).
    var converged = labels.isEmpty // empty graph → no iterations
    while (iter < maxIter && !converged) {
      val prev = labels
      val neighborMin = bidir
        .join(labels.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), col("lbl"))
      val jump = labels.as("x")
        .join(labels.select(col("id").as("lbl"), col("lbl").as("lbl2")), "lbl")
        .select(col("id"), col("lbl2").as("lbl"))
      labels = labels.union(neighborMin).union(jump)
        .groupBy("id").agg(min("lbl").as("lbl"))
        .localCheckpoint(true)
      val changed = labels.as("n")
        .join(prev.select(col("id"), col("lbl").as("plbl")), "id")
        .where(col("lbl") =!= col("plbl"))
        .limit(1).count() // any single changed row proves non-convergence
      converged = changed == 0L
      iter += 1
    }
    labels.select(col("id"), col("lbl").as("component"))
  }

  /** Driver-side union-find for small graphs (min-id roots, identical
    * output contract to the distributed path). */
  private def localComponents(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val pairs = edges.as[(Long, Long)].collect()
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    pairs.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val ra = find(a); val rb = find(b)
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val out = parent.keys.toSeq.sorted.map(id => (id, find(id)))
    spark.createDataFrame(out).toDF("id", "component")
  }
}
