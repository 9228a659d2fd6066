package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.cosine_similarity

/** Approximate-nearest-neighbor search over an embedding column
  * (required engine surface): brute-force cosine top-k as the exact
  * baseline, plus two scale paths — random-hyperplane LSH bucketing and
  * IVF-style coarse quantization.
  *
  * 100 TB design: the corpus never self-joins unpruned. Queries are the
  * small side (broadcast); candidates come from bucket equality (LSH) or
  * nearest-centroid assignment (IVF, nprobe>1 for recall); exact scoring
  * runs only within candidates, inside whole-stage codegen via the
  * CosineSimilarity expression.
  */
object Knn {

  /** Exact brute-force top-k: `queries` (small, broadcast) × `corpus`.
    * Both need (idCol, vecCol). Ranking uses a deterministic tie-break. */
  def bruteForce(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"))
    val c = corpus.select(col(idCol).as("nn"), col(vecCol).as("nvec"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nn"))
    broadcast(q).join(c, col("nn") =!= col("qid"))
      .select(col("qid"), col("nn"), cosine_similarity(col("qvec"), col("nvec")).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Exact top-1-later-neighbor (the reference's similarity-graph shape,
    * assets/recent_history.py:450-527): for every vector, its most-similar
    * vector with a LARGER id, ties broken toward the smallest id; similarity
    * rounded to 6 decimals BEFORE ranking (the oracle determinism contract).
    *
    * Computed as a block nested loop over a broadcast embedding matrix: the
    * per-pair work runs in a primitive loop per partition, and the ~n²
    * intermediate pair rows (each carrying BOTH embedding arrays — ~1 GB of
    * row copies at n=2000, d=64) are never materialized. The broadcast side
    * must fit in executor memory — the same constraint the equivalent
    * BroadcastNestedLoopJoin plan had, since it broadcast the entire build
    * side too. Beyond that, the pruned forms (label buckets / LSH / IVF)
    * are the scale path, with identical rank-1 semantics.
    *
    * Arithmetic parity with the declarative form is exact: double
    * accumulation over float elements in index order (= CosineSimilarity),
    * then signum(s)·floor(|s·1e6|+0.5)/1e6 rounding (= queries.oround).
    *
    * The broadcast-matrix plan collects the corpus to the driver, so it is
    * gated on `localThreshold` rows (mirroring
    * ConnectedComponents.components): beyond the gate the computation runs
    * fully distributed via [[top1LaterDistributed]] — identical output,
    * no driver materialization, no broadcast of the corpus.
    *
    * @return (src, dst, sim) — one row per id that has a later neighbor */
  def top1Later(emb: DataFrame, idCol: String, vecCol: String,
      localThreshold: Long = 1000000L, blocks: Int = 32): DataFrame = {
    val sel = emb.select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))
    if (sel.count() > localThreshold)
      return top1LaterDistributed(emb, idCol, vecCol, blocks)
    val spark = emb.sparkSession
    import spark.implicits._
    val data = sel.as[(Long, Array[Float])].collect().sortBy(_._1)
    val ids = data.map(_._1)
    // binarySearch picks an arbitrary element among equal ids, and duplicate
    // src rows would emit duplicate outputs — the declarative join+window
    // form this documents exact parity with assumes distinct ids, so enforce
    // that assumption instead of silently diverging.
    require(ids.distinct.length == ids.length,
      s"top1Later requires distinct $idCol values; found ${ids.length - ids.distinct.length} duplicates")
    val vecs = data.map(_._2)
    val bc = spark.sparkContext.broadcast((ids, vecs))
    emb.select(col(idCol).cast("long").as("src")).as[Long]
      .mapPartitions { it =>
        val (ids, vecs) = bc.value
        it.flatMap { src =>
          val i = java.util.Arrays.binarySearch(ids, src)
          if (i < 0 || i == ids.length - 1) Iterator.empty
          else {
            val a = vecs(i)
            var bestSim = Double.NegativeInfinity
            var bestDst = -1L
            var nullDst = -1L
            var j = i + 1
            while (j < ids.length) {
              val b = vecs(j)
              // null embeddings behave like the declarative form: cosine of
              // a null side is a null sim, not an executor NPE
              if (a == null || b == null) {
                if (nullDst < 0) nullDst = ids(j)
              } else {
                val n = math.min(a.length, b.length)
                var dot = 0.0; var na = 0.0; var nb = 0.0
                var d = 0
                while (d < n) {
                  val x = a(d).toDouble; val y = b(d).toDouble
                  dot += x * y; na += x * x; nb += y * y
                  d += 1
                }
                if (na == 0.0 || nb == 0.0) {
                  if (nullDst < 0) nullDst = ids(j) // null sim: smallest dst wins
                } else {
                  val raw = dot / (math.sqrt(na) * math.sqrt(nb))
                  val s = raw * 1e6
                  val sim = math.signum(s) * math.floor(math.abs(s) + 0.5) / 1e6
                  if (sim > bestSim) { bestSim = sim; bestDst = ids(j) }
                }
              }
              j += 1
            }
            if (bestDst >= 0) Iterator.single((src, bestDst, Option(bestSim)))
            else if (nullDst >= 0) Iterator.single((src, nullDst, Option.empty[Double]))
            else Iterator.empty
          }
        }
      }
      .toDF("src", "dst", "sim")
  }

  /** Distributed exact top-1-later: block-partitioned all-pairs. The src
    * side replicates into `blocks` partitions; the dst side hashes into one
    * — an EQUI-join on the block id (hash/sort-merge, spillable), never a
    * BroadcastNestedLoopJoin or a driver collect. The O(n²) pair stream
    * feeds a map-side-combinable `max(struct(sim, -dst))` per src, so the
    * only full shuffles are n·blocks join rows and n aggregate groups.
    * At 100 TB the O(n²) similarity work itself is the cost — this plan
    * spreads it over blocks² tasks; the pruned LSH/IVF forms remain the
    * sub-quadratic path.
    *
    * Output semantics are identical to the broadcast-matrix plan: rounded
    * sim ranked desc NULLS LAST, ties toward the smallest dst, and a
    * null-sim row (smallest dst) when every later similarity is null. */
  def top1LaterDistributed(emb: DataFrame, idCol: String, vecCol: String,
      blocks: Int = 32): DataFrame = {
    val sel = emb.select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))
    val dups = sel.groupBy(col(idCol)).count().filter(col("count") > 1).count()
    require(dups == 0,
      s"top1Later requires distinct $idCol values; found $dups duplicated ids")
    val a = sel.select(col(idCol).as("src"), col(vecCol).as("avec"))
      .withColumn("blk", explode(lit((0 until blocks).toArray)))
    val b = sel.select(col(idCol).as("dst"), col(vecCol).as("bvec"))
      .withColumn("blk", pmod(col("dst"), lit(blocks.toLong)).cast("int"))
    // oracle rounding BEFORE ranking: signum(s)·floor(|s·1e6|+0.5)/1e6,
    // the same double ops the local loop performs
    val s = cosine_similarity(col("avec"), col("bvec")) * lit(1e6)
    val rounded = signum(s) * floor(abs(s) + lit(0.5)) / lit(1e6)
    a.join(b, Seq("blk")).filter(col("dst") > col("src"))
      .select(col("src"), col("dst"), rounded.as("sim"))
      // struct ordering puts a null sim below every non-null sim, and on
      // sim ties the larger -dst (= smaller dst) wins — exactly the local
      // loop's strict-> best tracking + first-null-dst fallback
      .groupBy("src")
      .agg(max(struct(col("sim"), (-col("dst")).as("negdst"))).as("m"))
      .select(col("src"), (-col("m.negdst")).as("dst"), col("m.sim").as("sim"))
  }

  /** Sign-bit LSH bucket id (`nPlanes` ≤ 63): bit i = sign(v · plane_i),
    * planes deterministic from `seed`. Single Catalyst expression with a
    * tight per-row loop — a column-arithmetic formulation (dim × nPlanes
    * expression nodes) was 4× the cost of the rest of the query. */
  def lshBucket(vec: Column, dim: Int, nPlanes: Int, seed: Long): Column =
    graft.functions.hyperplane_lsh(vec, dim, nPlanes, seed)

  private def withLshBuckets(df: DataFrame, id: String, vec: String,
      dim: Int, nPlanes: Int, nTables: Int): DataFrame =
    df.select(col(id), col(vec),
      explode(array((0 until nTables).map(t =>
        struct(lit(t).as("table"),
          lshBucket(col(vec), dim, nPlanes, t.toLong).as("bucket"))): _*)).as("tb"))
      .select(col(id), col(vec), col("tb.table").as("table"), col("tb.bucket").as("bucket"))

  /** LSH top-k: candidates = same bucket in ANY of `nTables` tables,
    * then exact cosine + rank. Recall grows with tables; cost is
    * Σ bucket² instead of n². */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, dim: Int, k: Int,
      nPlanes: Int = 8, nTables: Int = 4): DataFrame = {
    val q = withLshBuckets(queries.select(col(idCol).as("qid"), col(vecCol).as("qvec")),
      "qid", "qvec", dim, nPlanes, nTables)
    val c = withLshBuckets(corpus.select(col(idCol).as("nn"), col(vecCol).as("nvec")),
      "nn", "nvec", dim, nPlanes, nTables)
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nn"))
    broadcast(q).join(c, Seq("table", "bucket"))
      .filter(col("nn") =!= col("qid"))
      .select(col("qid"), col("nn"), col("qvec"), col("nvec")).distinct()
      .select(col("qid"), col("nn"), cosine_similarity(col("qvec"), col("nvec")).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** The bucketing half of [[lshTopK]] alone: distinct (qid, nn) candidate
    * pairs sharing a bucket in any table. Split out so the exact-scoring
    * half can be value-checked from a scratch table (q34) independently of
    * the engine-pinned hyperplane hashing — the same mechanism that
    * upgraded the LSH/simhash dedup queries to full oracles. */
  def lshCandidates(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, dim: Int, nPlanes: Int = 8, nTables: Int = 4): DataFrame = {
    val q = withLshBuckets(queries.select(col(idCol).as("qid"), col(vecCol).as("qvec")),
      "qid", "qvec", dim, nPlanes, nTables)
    val c = withLshBuckets(corpus.select(col(idCol).as("nn"), col(vecCol).as("nvec")),
      "nn", "nvec", dim, nPlanes, nTables)
    broadcast(q).join(c, Seq("table", "bucket"))
      .filter(col("nn") =!= col("qid"))
      .select(col("qid"), col("nn")).distinct()
  }

  /** The probing half of [[ivfTopK]] alone: distinct (qid, nn) pairs whose
    * corpus member lives in one of the query's probed centroids (q35's
    * scratch-table frame). */
  def ivfCandidates(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, centroids: DataFrame, centroidIdCol: String,
      centroidVecCol: String, nprobe: Int): DataFrame = {
    val c = ivfAssign(corpus, idCol, vecCol, centroids, centroidIdCol, centroidVecCol, 1)
      .select(col("cid"), col(idCol).as("nn"))
    val q = ivfAssign(queries, idCol, vecCol, centroids, centroidIdCol, centroidVecCol, nprobe)
      .select(col("cid"), col(idCol).as("qid"))
    broadcast(q).join(c, "cid")
      .filter(col("nn") =!= col("qid"))
      .select(col("qid"), col("nn")).distinct()
  }

  /** Verification half shared by the scratch-oracled ANN queries: exact
    * cosine over candidate pairs re-joined to their vectors by id, rounded
    * to `decimals` BEFORE ranking (raw-double ranks can flip between
    * engines on last-bit differences — the q94 determinism contract),
    * top-k per query. Requires distinct ids in `vectors`. */
  def exactRerank(cand: DataFrame, vectors: DataFrame, idCol: String,
      vecCol: String, k: Int, decimals: Int): DataFrame = {
    val v = vectors.select(col(idCol), col(vecCol))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nn"))
    cand.select(col("qid"), col("nn"))
      .join(v.select(col(idCol).as("qid"), col(vecCol).as("qvec")), "qid")
      .join(v.select(col(idCol).as("nn"), col(vecCol).as("nvec")), "nn")
      .select(col("qid"), col("nn"),
        graft.queries.oround(
          cosine_similarity(col("qvec"), col("nvec")), decimals).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** IVF assignment: nearest `nprobe` centroids per vector (centroids is a
    * small broadcast frame (centroidId, vec)). Search joins query probes to
    * corpus assignments (nprobe=1) on centroid id. */
  def ivfAssign(df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, centroidIdCol: String, centroidVecCol: String,
      nprobe: Int = 1): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("csim").desc, col("cid"))
    df.select(col(idCol), col(vecCol))
      .join(broadcast(centroids.select(
        col(centroidIdCol).as("cid"), col(centroidVecCol).as("cvec"))))
      .select(col(idCol), col(vecCol), col("cid"),
        cosine_similarity(col(vecCol), col("cvec")).as("csim"))
      .withColumn("probe", row_number().over(w))
      .filter(col("probe") <= nprobe)
      .drop("csim")
  }

  /** IVF top-k with corpus pre-assigned to its single nearest centroid and
    * queries probing `nprobe` centroids. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, centroids: DataFrame, centroidIdCol: String,
      centroidVecCol: String, k: Int, nprobe: Int = 2): DataFrame = {
    val c = ivfAssign(corpus, idCol, vecCol, centroids, centroidIdCol, centroidVecCol, 1)
      .select(col("cid"), col(idCol).as("nn"), col(vecCol).as("nvec"))
    val q = ivfAssign(queries, idCol, vecCol, centroids, centroidIdCol, centroidVecCol, nprobe)
      .select(col("cid"), col(idCol).as("qid"), col(vecCol).as("qvec"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nn"))
    broadcast(q).join(c, "cid")
      .filter(col("nn") =!= col("qid"))
      .select(col("qid"), col("nn"), col("qvec"), col("nvec")).distinct()
      .select(col("qid"), col("nn"), cosine_similarity(col("qvec"), col("nvec")).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
