package graft.cluster

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Farthest-point traversal contract. Independent reference: the literal
  * Gonzalez loop over in-memory quantized vectors — argmax of min
  * distance with id tie-break — which the incremental distributed
  * min-distance frame must reproduce exactly. */
class KCenterSpec extends SparkSpec {
  import spark.implicits._

  private def brute(vecs: Map[Long, Seq[Long]], k: Int)
      : (Seq[(Long, Long, Long)], Long) = {
    def d2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val first = vecs.keys.min
    var chosen = Vector(first)
    var sel = Vector((0L, first, 0L))
    var md = vecs.map { case (id, v) => id -> d2(v, vecs(first)) }
    for (t <- 1 until k) {
      val (bid, bd) = md.toSeq.maxBy { case (id, d) => (d, -id) }
      sel = sel :+ ((t.toLong, bid, bd))
      chosen = chosen :+ bid
      md = md.map { case (id, d) => id -> math.min(d, d2(vecs(id), vecs(bid))) }
    }
    (sel, md.values.max)
  }

  private def quant(v: Seq[Double]): Seq[Long] =
    v.map(x => math.round(x * 1e6))

  test("randomized agreement with the literal Gonzalez loop") {
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 5) {
      val vecs = (1L to 40L).map { id =>
        id -> Seq.fill(8)(rnd.nextDouble() * 2 - 1)
      }
      val df = vecs.toDF("vec_id", "embedding")
      val out = KCenter.farthestPoints(df, "vec_id", "embedding", k = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val (expSel, expRad) = brute(
        vecs.map { case (id, v) => id -> quant(v) }.toMap, 4)
      assert(out.map(t => (t._1, t._2, t._3)).toSeq == expSel, s"trial $trial")
      assert(out.forall(_._4 == expRad), s"trial $trial radius")
    }
  }

  test("hand fixture: collinear points pick the extremes") {
    // points at 0, 1, 10 on a line (ppm grid): anchor=id1(0), farthest=10,
    // then 1 (min-dist 1 vs 0 for chosen ones)
    val df = Seq(
      (1L, Seq(0.0)), (2L, Seq(0.000001)), (3L, Seq(0.00001))
    ).toDF("vec_id", "embedding")
    val out = KCenter.farthestPoints(df, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((0L, 1L, 0L, 0L), (1L, 3L, 100L, 0L), (2L, 2L, 1L, 0L)))
  }

  test("selected centers end with zero residual distance (self-coverage)") {
    val rnd = new scala.util.Random(29)
    val vecs = (1L to 20L).map(id => (id, Seq.fill(4)(rnd.nextDouble())))
    val df = vecs.toDF("vec_id", "embedding")
    val out = KCenter.farthestPoints(df, "vec_id", "embedding", k = 5).collect()
    // radius must be ≤ every selection distance of later rounds' bound:
    // the selection distances are non-increasing (farthest-first property)
    val selD = out.map(_.getLong(2)).drop(1)
    assert(selD.zip(selD.tail).forall { case (a, b) => a >= b })
    assert(out.map(_.getLong(3)).distinct.length == 1)
    assert(out.head.getLong(3) <= selD.last)
  }
}
