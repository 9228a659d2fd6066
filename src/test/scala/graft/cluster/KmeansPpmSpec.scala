package graft.cluster

import graft.SparkSpec

class KmeansPpmSpec extends SparkSpec {
  import spark.implicits._

  // two tight groups around (1,0,0) and (0,1,0); seeds are ids 0 and 1,
  // one from each group, so Lloyd must converge to the group means
  private val corpus = Seq(
    (0L, Seq(1.0f, 0.1f, 0.0f)), (1L, Seq(0.1f, 1.0f, 0.0f)),
    (2L, Seq(0.9f, 0.0f, 0.1f)), (3L, Seq(0.0f, 0.9f, 0.1f)),
    (4L, Seq(1.1f, 0.1f, -0.1f)), (5L, Seq(0.1f, 1.1f, -0.1f)))

  /** independent in-memory reimplementation of the ppm integer Lloyd loop */
  private def reference(k: Int, iters: Int): Map[(Long, Long), Long] = {
    def i6(d: Double): Long = {
      val s = d * 1e6
      (math.signum(s) * math.floor(math.abs(s) + 0.5)).toLong
    }
    val qx = corpus.map { case (id, v) => id -> v.map(f => i6(f.toDouble)) }.toMap
    var cent: Map[Long, Seq[Long]] =
      corpus.sortBy(_._1).take(k).zipWithIndex
        .map { case ((id, _), ki) => ki.toLong -> qx(id) }.toMap
    for (_ <- 1 to iters) {
      val assign = qx.map { case (vid, x) =>
        vid -> cent.toSeq.map { case (ki, c) =>
          (x.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum, ki)
        }.min._2
      }
      cent = cent.map { case (ki, old) =>
        val members = assign.collect { case (vid, a) if a == ki => qx(vid) }.toSeq
        ki -> (if (members.isEmpty) old
               else old.indices.map(j => members.map(_(j)).sum / members.size))
      }
    }
    cent.flatMap { case (ki, c) => c.zipWithIndex.map { case (v, j) => (ki, j.toLong) -> v } }
  }

  test("integer Lloyd iterations agree exactly with an independent reference") {
    val df = corpus.toDF("vec_id", "embedding")
    for (iters <- Seq(1, 2)) {
      val got = KmeansPpm.train(df, "vec_id", "embedding", k = 2, iters = iters)
        .as[(Long, Long, Long)].collect()
        .map { case (ki, j, c) => (ki, j) -> c }.toMap
      assert(got === reference(2, iters), s"iters=$iters")
    }
  }

  test("centroids land on the two group means") {
    val df = corpus.toDF("vec_id", "embedding")
    val c = KmeansPpm.train(df, "vec_id", "embedding", k = 2, iters = 2)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (ki, rows) =>
        ki -> rows.sortBy(_._2).map(_._3).toSeq
      }
    // cluster 0 = x-heavy group mean (1+0.9+1.1)/3 = 1.0, cluster 1 = y-heavy
    assert(c(0L)(0) == 1000000L && c(1L)(1) == 1000000L)
    assert(c(0L)(1) < 100000L && c(1L)(0) < 100000L)
  }

  test("partition-count invariant") {
    val df = corpus.toDF("vec_id", "embedding")
    def run(parts: Int) = KmeansPpm.train(df.repartition(parts),
      "vec_id", "embedding", k = 2, iters = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(run(1) == run(7))
  }
}
