package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ContrastiveSpec extends SparkSpec {
  import spark.implicits._

  // two tight clusters on orthogonal axes + one lone-label point
  private lazy val vecs = Seq(
    (1L, 0, Seq(1f, 0f, 0f)),
    (2L, 0, Seq(0.99f, 0.14f, 0f)), // closest to 1 within label 0
    (3L, 0, Seq(0.9f, 0.43f, 0f)),
    (4L, 1, Seq(0f, 1f, 0f)),
    (5L, 1, Seq(0f, 0.99f, 0.14f)),
    (9L, 7, Seq(0f, 0f, 1f)) // label with a single member: no positive
  ).toDF("vec_id", "label", "embedding")

  test("positives are the argmax same-label neighbor; lone labels emit none") {
    val pos = Contrastive.pairs(vecs, "vec_id", "embedding", "label")
      .filter(col("role") === "pos")
      .select("anchor_id", "partner_id").as[(Long, Long)].collect().toMap
    assert(pos(1L) == 2L && pos(2L) == 1L)
    assert(pos(4L) == 5L && pos(5L) == 4L)
    assert(!pos.contains(9L)) // single-member label: no same-label partner
    // anchor 3's best is 2 (closer than 1)
    assert(pos(3L) == 2L)
  }

  test("negatives: never same-label, never self, at most k, deterministic") {
    val negs = Contrastive.pairs(vecs, "vec_id", "embedding", "label", k = 2)
      .filter(col("role").startsWith("neg"))
      .select("anchor_id", "role", "partner_id")
      .as[(Long, String, Long)].collect()
    val labels = vecs.select("vec_id", "label").as[(Long, Int)].collect().toMap
    assert(negs.nonEmpty)
    negs.foreach { case (a, _, p) =>
      assert(a != p)
      assert(labels(a) != labels(p), s"anchor $a drew same-label $p")
    }
    // distinct partners per anchor (colliding draws collapse to one)
    negs.groupBy(_._1).foreach { case (a, rows) =>
      val ps = rows.map(_._3)
      assert(ps.distinct.size == ps.size, s"anchor $a drew duplicate negatives")
    }
    val perAnchor = negs.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    perAnchor.values.foreach(roles => assert(roles.size <= 2 &&
      roles == (1 to roles.size).map(i => s"neg_$i")))
    // deterministic across runs and input partitionings
    val again = Contrastive.pairs(vecs.repartition(7), "vec_id", "embedding",
        "label", k = 2)
      .filter(col("role").startsWith("neg"))
      .select("anchor_id", "role", "partner_id")
      .as[(Long, String, Long)].collect()
    assert(again.toSet == negs.toSet)
  }

  test("sim_ppb is the integer fixed point of the exact cosine") {
    val rows = Contrastive.pairs(vecs, "vec_id", "embedding", "label")
      .select("anchor_id", "partner_id", "sim_ppb")
      .as[(Long, Long, Long)].collect()
    val emb = vecs.select("vec_id", "embedding").as[(Long, Seq[Float])]
      .collect().toMap
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      dot / (na * nb)
    }
    rows.foreach { case (a, p, s) =>
      val expect = math.round(cos(emb(a), emb(p)) * 1e9)
      assert(math.abs(s - expect) <= 1, s"pair ($a,$p): $s vs $expect")
    }
  }
}
