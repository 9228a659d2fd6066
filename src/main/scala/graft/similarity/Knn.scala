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

  /** Sign-bit LSH bucket id (`nPlanes` ≤ 63): bit i = sign(v · plane_i),
    * planes deterministic from `seed`. Single Catalyst expression with a
    * tight per-row loop — a column-arithmetic formulation (dim × nPlanes
    * expression nodes) was 4× the cost of the rest of the query. */
  def lshBucket(vec: Column, dim: Int, nPlanes: Int, seed: Long): Column =
    graft.functions.hyperplane_lsh(vec, dim, nPlanes, seed)

  /** LSH top-k: candidates = same bucket in ANY of `nTables` tables,
    * then exact cosine + rank. Recall grows with tables; cost is
    * Σ bucket² instead of n². */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, dim: Int, k: Int,
      nPlanes: Int = 8, nTables: Int = 4): DataFrame = {
    def withBuckets(df: DataFrame, id: String, vec: String): DataFrame =
      df.select(col(id), col(vec),
        explode(array((0 until nTables).map(t =>
          struct(lit(t).as("table"),
            lshBucket(col(vec), dim, nPlanes, t.toLong).as("bucket"))): _*)).as("tb"))
        .select(col(id), col(vec), col("tb.table").as("table"), col("tb.bucket").as("bucket"))
    val q = withBuckets(queries.select(col(idCol).as("qid"), col(vecCol).as("qvec")), "qid", "qvec")
    val c = withBuckets(corpus.select(col(idCol).as("nn"), col(vecCol).as("nvec")), "nn", "nvec")
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nn"))
    broadcast(q).join(c, Seq("table", "bucket"))
      .filter(col("nn") =!= col("qid"))
      .select(col("qid"), col("nn"), col("qvec"), col("nvec")).distinct()
      .select(col("qid"), col("nn"), cosine_similarity(col("qvec"), col("nvec")).as("sim"))
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
