package graft.similarity

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {

  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf)

  test("train/encode: m codes per vector, codes reference the codebook") {
    val cb = Pq.train(emb, "vec_id", "embedding", dim = 64,
      m = 4, nCodes = 8, iters = 1)
    val cbRows = cb.select("sub", "code").as[(Int, Long)].collect().toSet
    assert(cbRows.map(_._1) === Set(0, 1, 2, 3))
    val codes = Pq.encode(emb, "vec_id", "embedding", 64, cb)
      .select("id", "codes").as[(Long, Seq[Long])].collect()
    assert(codes.length === emb.count())
    codes.foreach { case (_, cs) =>
      assert(cs.length === 4)
      cs.zipWithIndex.foreach { case (c, s) => assert(cbRows.contains((s, c))) }
    }
    cb.unpersist()
  }

  test("degenerate exact: nCodes = n makes ADC the exact inner product") {
    // every vector seeds its own code, one Lloyd pass keeps centroids AT
    // the points -> reconstruction is exact and the ADC score equals the
    // true dot product
    val tiny = emb.filter(col("vec_id") < 8)
    val cb = Pq.train(tiny, "vec_id", "embedding", dim = 64,
      m = 4, nCodes = 8, iters = 1)
    val codes = Pq.encode(tiny, "vec_id", "embedding", 64, cb)
    val q = tiny.filter(col("vec_id") < 2)
    val adc = Pq.adcCandidates(codes, cb, q, "vec_id", "embedding",
        dim = 64, n = 7)
      .select("qid", "nn", "ascore").as[(Long, Long, Double)].collect()
    val exact = q.select(col("vec_id").as("qid"),
        col("embedding").cast("array<double>").as("qe"))
      .join(tiny.select(col("vec_id").as("nn"),
        col("embedding").cast("array<double>").as("ne")),
        col("nn") =!= col("qid"))
      .select(col("qid"), col("nn"),
        graft.functions.vec_dot(col("qe"), col("ne")).as("dot"))
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, s) => (a, b) -> s }.toMap
    assert(adc.nonEmpty)
    adc.foreach { case (qid, nn, s) =>
      assert(math.abs(s - exact((qid, nn))) < 2e-6) // round-6 on ascore
    }
    cb.unpersist()
  }

  test("topK serve: k per query, self excluded, deterministic") {
    val q = emb.filter(col("vec_id") < 5)
    val cb = Pq.train(emb, "vec_id", "embedding", dim = 64,
      m = 4, nCodes = 16, iters = 2)
    val codes = Pq.encode(emb, "vec_id", "embedding", 64, cb)
    val out = Pq.topK(codes, cb, q, emb, "vec_id", "embedding",
      dim = 64, k = 10, factor = 4)
    val rows = out.collect()
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    assert(byQ.size === 5)
    byQ.foreach { case (qid, rs) =>
      assert(rs.length === 10)
      assert(!rs.map(_.getAs[Long]("nn")).contains(qid))
      val sims = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("sim"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
    val again = Pq.topK(codes, cb, q, emb, "vec_id", "embedding",
      dim = 64, k = 10, factor = 4).collect()
    assert(rows.map(_.toSeq).toSet === again.map(_.toSeq).toSet)
    cb.unpersist()
  }

  test("adcWithin: scores exactly the candidate pairs, same values as full ADC") {
    val q = emb.filter(col("vec_id") < 3)
    val cb = Pq.train(emb, "vec_id", "embedding", dim = 64,
      m = 4, nCodes = 8, iters = 1)
    val codes = Pq.encode(emb, "vec_id", "embedding", 64, cb)
    // a deliberately sparse candidate set: 20 specific pairs per query
    val cand = q.select(col("vec_id").as("qid"))
      .crossJoin(emb.filter(col("vec_id") % 25 === 0)
        .select(col("vec_id").as("nn")))
    val within = Pq.adcWithin(cand, codes, cb, q, "vec_id", "embedding",
        dim = 64, n = 1000)
      .select("qid", "nn", "ascore").as[(Long, Long, Double)].collect()
      .map { case (a, b, s) => (a, b) -> s }.toMap
    val full = Pq.adcCandidates(codes, cb, q, "vec_id", "embedding",
        dim = 64, n = Int.MaxValue)
      .select("qid", "nn", "ascore").as[(Long, Long, Double)].collect()
      .map { case (a, b, s) => (a, b) -> s }.toMap
    val expected = cand.select("qid", "nn").as[(Long, Long)].collect()
      .filter { case (a, b) => a != b }.toSet
    assert(within.keySet === expected)
    within.foreach { case (k, s) => assert(s === full(k)) }
    // the candidate-restricted plan must be equi-join + broadcast, never
    // a nested-loop over the corpus (the LUT cross join is query-side only)
    val plan = Pq.adcWithin(cand, codes, cb, q, "vec_id", "embedding",
      dim = 64, n = 10).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    cb.unpersist()
  }

  test("recall against brute force is high at factor 4") {
    val q = emb.filter(col("vec_id") < 5)
    val cb = Pq.train(emb, "vec_id", "embedding", dim = 64,
      m = 4, nCodes = 16, iters = 2)
    val codes = Pq.encode(emb, "vec_id", "embedding", 64, cb)
    val pq = Pq.topK(codes, cb, q, emb, "vec_id", "embedding",
        dim = 64, k = 10, factor = 4)
      .select("qid", "nn").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (k2, v) => k2 -> v.map(_._2).toSet }
    val bf = Knn.bruteForce(emb, q, "vec_id", "embedding", k = 10)
      .select("qid", "nn").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (k2, v) => k2 -> v.map(_._2).toSet }
    val recalls = bf.map { case (qid, truth) =>
      pq.getOrElse(qid, Set.empty).intersect(truth).size.toDouble / truth.size }
    // compress-then-verify at 4x re-rank budget: hash-random embeddings
    // are PQ's WORST case (no cluster structure to quantize), so the bar
    // is a wide margin over the random-candidate straw man (40/n ≈ 8%),
    // not near-perfect recall
    assert(recalls.sum / recalls.size > 0.3,
      s"mean recall ${recalls.sum / recalls.size} too low")
    cb.unpersist()
  }
}
