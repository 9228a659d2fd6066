package graft.cluster

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lloyd's k-means in pure integer fixed point — the trainable core under
  * the IVF/PQ index builds (sources/IvfIndex.scala, similarity/Pq.scala,
  * which train float k-means seeded deterministically), re-expressed so
  * the TRAINING LOOP itself is exactly verifiable across engines (the
  * q153 `hardLrTrain` pattern applied to clustering):
  *
  *   - vectors quantized once to the 1e-6 grid: x_j = round(e_j·1e6) as
  *     64-bit integers (half away from zero, the repo's oround primitive);
  *   - assignment: nearest centroid by INTEGER squared L2,
  *     d(v,c) = Σ_j (x_j − c_j)², ties toward the smaller centroid id;
  *   - update: c'_{k,j} = (Σ_{v∈k} x_{v,j}) divT |k| (truncating integer
  *     division); a centroid that loses every member keeps its previous
  *     coordinates;
  *   - seeding: the k smallest ids' vectors (the deterministic seeding
  *     discipline IvfIndex uses).
  *
  * Every sum is over integers, so the result is order-independent and
  * bit-reproducible across partitionings and engines — an iterative
  * float k-means can drift an assignment on a last-ulp distance tie,
  * which is precisely why the float builds oracle-check their SERVE side
  * only; this one oracle-checks the training iterations themselves.
  *
  * Scale shape per iteration: one broadcast of the k·dims centroid table
  * against the CACHED (vec, dim, x) long-format frame, a per-vector
  * argmin aggregate (map-side combinable min(struct)), and a
  * per-(centroid, dim) sum. The centroid state (k·dims rows, bounded by
  * config, data-independent) iterates DRIVER-side per step — the
  * IvfIndex seeding discipline — so the plan does not double per
  * iteration and only the tiny centroid table ever visits the driver;
  * assignment and the sums stay distributed.
  */
object KmeansPpm {

  private def i6(c: Column): Column = graft.functions.fixed_point(c, 1e6)

  /** Train `iters` Lloyd iterations over `df(idCol, vecCol)` (array of
    * float/double). Returns the final centroids in long format:
    * (k, j, c) — centroid id, dimension index, ppm-integer coordinate. */
  def train(df: DataFrame, idCol: String, vecCol: String,
      k: Int = 4, iters: Int = 2): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val qx = df.select(col(idCol).cast("long").as("vid"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("j", "e")))
      .select(col("vid"), col("j").cast("long").as("j"), i6(col("e")).as("x"))
      .cache()
    try {
      // DISTINCT before the limit: the q154 oracle seeds over DISTINCT vid,
      // and duplicate input ids would otherwise yield fewer distinct seed
      // vectors here than there (ADVICE r10)
      val seedIds = df.select(col(idCol).cast("long").as("vid"))
        .distinct().orderBy(col("vid")).limit(k)
      // k·dims rows, bounded by config — the IvfIndex-style driver seed
      var cent: Map[(Long, Long), Long] = qx.join(broadcast(seedIds), "vid")
        .as[(Long, Long, Long)].collect()
        .groupBy(_._1).toSeq.sortBy(_._1).zipWithIndex
        .flatMap { case ((_, rows), ki) =>
          rows.map { case (_, j, x) => (ki.toLong, j) -> x }
        }.toMap
      for (_ <- 1 to iters) {
        val centDf = cent.toSeq.map { case ((ki, j), c) => (ki, j, c) }
          .toDF("k", "j", "c")
        val assign = qx.join(broadcast(centDf), "j")
          .groupBy(col("vid"), col("k"))
          .agg(sum((col("x") - col("c")) * (col("x") - col("c"))).as("d"))
          .groupBy(col("vid"))
          .agg(min(struct(col("d"), col("k"))).as("m"))
          .select(col("vid"), col("m.k").as("k"))
        val sums = qx.join(assign, "vid")
          .groupBy(col("k"), col("j"))
          .agg(sum(col("x")).as("s"), count(lit(1)).cast("long").as("n"))
          .select(col("k"), col("j"),
            call_function("div", col("s"), col("n")).as("c2"))
          .as[(Long, Long, Long)].collect() // k·dims rows, bounded by config
          .map { case (ki, j, c2) => (ki, j) -> c2 }.toMap
        cent = cent.map { case (kj, old) => kj -> sums.getOrElse(kj, old) }
      }
      cent.toSeq.map { case ((ki, j), c) => (ki, j, c) }.sorted.toDF("k", "j", "c")
    } finally qx.unpersist()
  }
}
