package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.vec_dot

/** Product quantization (Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search") — the memory-compression ANN path that
  * complements the pruning paths (LSH buckets, IVF partitions): vectors
  * are cut into `m` contiguous subvectors, each subspace gets its own
  * `nCodes`-centroid codebook (independent per-subspace k-means), and a
  * vector is stored as `m` small code ids — 64 floats become 4 bytes at
  * m=4/nCodes≤256. Search is asymmetric distance computation (ADC): the
  * query stays exact, each subspace contributes `dot(q_sub, codeword)`
  * from a per-query lookup table, and the approximate inner product is
  * the sum over subspaces of table lookups — no corpus vector is ever
  * decoded.
  *
  * 100 TB shape: training is Lloyd iterations over the exploded
  * (id, sub, subvec) frame — ALL subspaces train in the same corpus
  * passes (one groupBy (sub, code) per iteration), against a broadcast
  * m·nCodes-row codebook. Encoding is one more pass. Serving scans only
  * the CODES table (m small ints per row — the point of PQ: the scan is
  * ~64× narrower than the raw vectors) against a broadcast per-query
  * lookup table, and only the re-rank candidates (factor·k per query)
  * ever touch the full-width vectors. Nothing is ever corpus × corpus.
  */
object Pq {

  /** Per-subspace codebooks: `(sub, code, cvec)` with `sub ∈ [0, m)`,
    * `code ∈ [1, nCodes]`. Seeding is deterministic (the IvfIndex trick:
    * first `nCodes` rows by `xxhash64(id, seed)` order seed EVERY
    * subspace with their subvectors); assignment is L2 (the PQ paper's
    * metric) via the −2·dot(s, c) + |c|² expansion (the |s|² term is
    * constant per row and drops out of the argmin); ties break toward the
    * smaller code. Like the IVF build, a code that loses every member
    * drops out of the codebook (k-means cluster death — harmless, lookups
    * are by surviving code). */
  def train(corpus: DataFrame, idCol: String, vecCol: String, dim: Int,
      m: Int = 4, nCodes: Int = 16, iters: Int = 3,
      seed: Long = 42L): DataFrame = {
    require(dim % m == 0, s"dim $dim must be divisible by m $m")
    val spark = corpus.sparkSession
    import spark.implicits._
    val subDim = dim / m
    val base = corpus.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<float>").as("vec"))
    val subs = base.select(col("id"), posexplode(expr(
      s"transform(sequence(0, ${m - 1}), s -> slice(vec, s * $subDim + 1, $subDim))")))
      .select(col("id"), col("pos").as("sub"), col("col").as("svec"))
    // driver-side seeding: nCodes rows (bounded small), every subspace
    // seeded from the same rows' subvectors
    val seedVecs = base.orderBy(xxhash64(col("id"), lit(seed)), col("id"))
      .limit(nCodes)
      .select(col("id"), col("vec")).as[(Long, Seq[Float])]
      .collect().sortBy(_._1).zipWithIndex
    var cb = spark.createDataset(for {
        ((_, v), i) <- seedVecs.toSeq
        s <- 0 until m
      } yield (s, i.toLong + 1, v.slice(s * subDim, (s + 1) * subDim)))
      .toDF("sub", "code", "cvec")
      .select(col("sub"), col("code"), col("cvec").cast("array<float>").as("cvec"))
    for (it <- 0 until iters) {
      val assigned = assign(subs, cb)
      val prev = cb
      // materialize per iteration (tiny m·nCodes frame) — same reason as
      // IvfIndex.build: lazy chaining turns Lloyd into O(iters²) scans
      cb = assigned.join(subs, Seq("id", "sub"))
        .groupBy(col("sub"), col("code"))
        .agg(graft.functions.vector_mean(col("svec")).as("cd"))
        .select(col("sub"), col("code"), col("cd").cast("array<float>").as("cvec"))
        .cache()
      cb.count()
      prev.unpersist()
    }
    cb
  }

  /** Nearest code per (id, sub): argmin of L2 over the broadcast codebook,
    * tie → smaller code. */
  private def assign(subs: DataFrame, cb: DataFrame): DataFrame =
    subs.join(broadcast(cb), "sub")
      .select(col("id"), col("sub"), col("code"),
        (vec_dot(col("cvec"), col("cvec"))
          - lit(2.0) * vec_dot(col("svec"), col("cvec"))).as("d2"))
      .groupBy(col("id"), col("sub"))
      .agg(min(struct(col("d2"), col("code"))).as("best"))
      .select(col("id"), col("sub"), col("best.code").as("code"))

  /** Encode the corpus against a trained codebook: `(id, codes)` with
    * `codes[s]` = the code of subspace s (an m-element array of small
    * ints — the compressed representation the serve path scans). */
  def encode(corpus: DataFrame, idCol: String, vecCol: String, dim: Int,
      codebook: DataFrame, m: Int = 4): DataFrame = {
    val subDim = dim / m
    val base = corpus.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<float>").as("vec"))
    val subs = base.select(col("id"), posexplode(expr(
      s"transform(sequence(0, ${m - 1}), s -> slice(vec, s * $subDim + 1, $subDim))")))
      .select(col("id"), col("pos").as("sub"), col("col").as("svec"))
    assign(subs, codebook)
      .groupBy(col("id"))
      .agg(expr("transform(array_sort(collect_list(struct(sub, code))), x -> x.code)")
        .as("codes"))
  }

  /** ADC approximate top-`n` inner-product candidates: per query, the
    * lookup table `w(sub, code) = dot(q_sub, codeword)` is m·nCodes rows
    * (broadcast), the codes table streams past it, and the approximate
    * score is the sum of the m lookups. Ranking is on the ROUND-6 score
    * (cross-engine determinism — the same contract as IvfIndex.topK's
    * simDecimals), ties toward the smaller id. Self-matches are dropped. */
  def adcCandidates(codes: DataFrame, codebook: DataFrame,
      queries: DataFrame, idCol: String, vecCol: String, dim: Int, n: Int,
      m: Int = 4): DataFrame = {
    val subDim = dim / m
    val q = queries.select(col(idCol).cast("long").as("qid"),
      col(vecCol).cast("array<float>").as("qvec"))
    val lut = q.join(broadcast(codebook))
      .select(col("qid"), col("sub"), col("code"),
        vec_dot(expr(s"slice(qvec, sub * $subDim + 1, $subDim)"), col("cvec"))
          .as("w"))
    val ex = codes.select(col("id"), posexplode(col("codes")))
      .select(col("id"), col("pos").as("sub"), col("col").as("code"))
    val rk = Window.partitionBy(col("qid"))
      .orderBy(col("ascore").desc, col("id"))
    ex.join(broadcast(lut), Seq("sub", "code"))
      .groupBy(col("qid"), col("id"))
      .agg(graft.queries.oround(sum(col("w")), 6).as("ascore"))
      .filter(col("id") =!= col("qid"))
      .withColumn("arank", row_number().over(rk))
      .filter(col("arank") <= n)
      .select(col("qid"), col("id").as("nn"), col("ascore"), col("arank"))
  }

  /** ADC scoring RESTRICTED to a candidate set — the in-partition half of
    * IVFADC (the FAISS coarse+fine architecture): a coarse quantizer (IVF
    * probing, LSH buckets, any pruning) proposes (qid, nn) candidates, and
    * only those pairs are ADC-scored — the LUT join ships one row per
    * candidate per subspace, never one per corpus row. Same round-6 rank
    * contract as [[adcCandidates]]. */
  def adcWithin(cand: DataFrame, codes: DataFrame, codebook: DataFrame,
      queries: DataFrame, idCol: String, vecCol: String, dim: Int, n: Int,
      m: Int = 4): DataFrame = {
    val subDim = dim / m
    val q = queries.select(col(idCol).cast("long").as("qid"),
      col(vecCol).cast("array<float>").as("qvec"))
    val lut = q.join(broadcast(codebook))
      .select(col("qid"), col("sub"), col("code"),
        vec_dot(expr(s"slice(qvec, sub * $subDim + 1, $subDim)"), col("cvec"))
          .as("w"))
    val ex = cand.select(col("qid"), col("nn"))
      .join(codes.select(col("id").as("nn"), col("codes")), "nn")
      .select(col("qid"), col("nn"), posexplode(col("codes")))
      .select(col("qid"), col("nn"), col("pos").as("sub"), col("col").as("code"))
    val rk = Window.partitionBy(col("qid"))
      .orderBy(col("ascore").desc, col("nn"))
    ex.join(broadcast(lut), Seq("qid", "sub", "code"))
      .groupBy(col("qid"), col("nn"))
      .agg(graft.queries.oround(sum(col("w")), 6).as("ascore"))
      .filter(col("nn") =!= col("qid"))
      .withColumn("arank", row_number().over(rk))
      .filter(col("arank") <= n)
      .select(col("qid"), col("nn"), col("ascore"), col("arank"))
  }

  /** The full PQ serve: ADC candidates (factor·k per query) re-ranked by
    * EXACT cosine over the original vectors — the standard
    * compress-then-verify operating point. Output matches the other ANN
    * serves: (qid, nn, sim, rank ≤ k). */
  def topK(codes: DataFrame, codebook: DataFrame, queries: DataFrame,
      vectors: DataFrame, idCol: String, vecCol: String, dim: Int, k: Int,
      factor: Int = 4, m: Int = 4, simDecimals: Int = 6): DataFrame = {
    val cand = adcCandidates(codes, codebook, queries, idCol, vecCol, dim,
        n = factor * k, m = m)
      .select(col("qid"), col("nn"))
    Knn.exactRerank(cand, vectors, idCol, vecCol, k, simDecimals)
  }
}
