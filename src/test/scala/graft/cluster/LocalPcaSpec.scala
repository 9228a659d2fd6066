package graft.cluster

import org.scalatest.funsuite.AnyFunSuite

class LocalPcaSpec extends AnyFunSuite {

  test("recovers the dominant direction of anisotropic data") {
    // points spread along (1, 1, 0) with tiny orthogonal noise
    val vecs = (0 until 40).map { i =>
      val t = (i - 20).toFloat
      Array(t, t, (i % 3 - 1) * 0.01f)
    }.toArray
    val reduced = LocalPca.reduce(vecs, 1)
    assert(reduced.length == 40)
    assert(reduced.forall(_.length == 1))
    // projection onto PC1 must preserve the spread ordering
    val flat = reduced.map(_(0))
    assert(flat.zip(flat.tail).forall { case (a, b) => a < b } ||
      flat.zip(flat.tail).forall { case (a, b) => a > b })
  }

  test("orthogonal components and deterministic output") {
    val vecs = (0 until 30).map { i =>
      Array(math.sin(i * 0.7).toFloat * 3, math.cos(i * 1.3).toFloat * 2, (i % 5).toFloat)
    }.toArray
    val a = LocalPca.reduce(vecs, 2)
    val b = LocalPca.reduce(vecs, 2)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    // variance along PC1 >= variance along PC2
    def variance(col: Int, m: Array[Array[Double]]) = {
      val xs = m.map(_(col)); val mu = xs.sum / xs.length
      xs.map(x => (x - mu) * (x - mu)).sum / xs.length
    }
    assert(variance(0, a) >= variance(1, a))
  }

  test("k capped at dim; empty input ok") {
    assert(LocalPca.reduce(Array.empty, 3).isEmpty)
    val one = LocalPca.reduce(Array(Array(1f, 2f)), 5)
    assert(one.head.length == 2)
  }

  test("clusterPerKey with reduceTo keeps cluster structure") {
    val spark = graft.SparkSpec.session
    import spark.implicits._
    // two clear groups in 8 dims, reduce to 2, cluster
    val rows = (0 until 12).map { i =>
      val base = if (i < 6) Array.fill(8)(1f) else Array(1f, -1f, 1f, -1f, 1f, -1f, 1f, -1f)
      (1L, s"item$i", base.zipWithIndex.map { case (v, j) => v + 0.001f * ((i + j) % 3) }.toSeq)
    }
    val df = rows.toDF("user_id", "interest", "embedding")
    val labels = LocalCluster.clusterPerKey(df, "user_id", "interest", "embedding",
        eps = 0.05, minClusterSize = 3, reduceTo = Some(2))
      .collect().map(r => r.getString(1) -> r.getInt(3)).toMap
    assert((0 until 6).map(i => labels(s"item$i")).distinct.size == 1)
    assert((6 until 12).map(i => labels(s"item$i")).distinct.size == 1)
    assert(labels("item0") != labels(s"item6"))
  }
}
