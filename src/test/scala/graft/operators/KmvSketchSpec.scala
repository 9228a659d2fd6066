package graft.operators

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  private def events = Tables.events(spark, sf)

  /** Brute-force truth: the k-th smallest distinct hash per group via a
    * full window over ALL distinct hashes (the shuffle-everything plan the
    * operator exists to avoid). */
  private def brute(k: Int): Map[String, (Long, Long)] = {
    val h = events.select(col("event_type").as("grp"),
        KmvSketch.hash48(col("user_id"), "kmv-v1").as("h")).distinct()
    val w = Window.partitionBy(col("grp")).orderBy(col("h"))
    h.withColumn("rn", row_number().over(w))
      .withColumn("nd", count(lit(1)).over(Window.partitionBy(col("grp"))))
      .filter(col("rn") === least(lit(k.toLong), col("nd")))
      .select(col("grp"), col("h"), col("nd"))
      .as[(String, Long, Long)].collect()
      .map { case (g, h2, nd) => g -> (h2, nd) }.toMap
  }

  test("estimateDistinct: thresholded k-th min equals the brute-force k-th min") {
    val k = 64
    val got = KmvSketch.estimateDistinct(events, "event_type", "user_id", k)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val truth = brute(k)
    assert(got.keySet === truth.keySet)
    got.foreach { case (g, (kth, est)) =>
      val (bKth, nd) = truth(g)
      assert(kth === bKth, s"group $g kth-min mismatch")
      val expect = if (nd < k) nd else (k - 1).toLong * KmvSketch.Space / bKth
      assert(est === expect, s"group $g estimate mismatch")
    }
  }

  test("fewer than k distinct values → the sketch is the exact count") {
    val small = events.filter(col("user_id") < 7) // ≪ k distinct users
    val got = KmvSketch.estimateDistinct(small, "event_type", "user_id", 1000)
      .select(col("event_type"), col("est_distinct"))
      .as[(String, Long)].collect().toMap
    val exact = small.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .as[(String, Long)].collect().toMap
    assert(got === exact)
  }

  test("estimate lands within the 1/√(k−2) error regime") {
    val k = 64
    val got = KmvSketch.estimateDistinct(events, "event_type", "user_id", k)
      .select(col("event_type"), col("est_distinct"))
      .as[(String, Long)].collect().toMap
    val exact = events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .as[(String, Long)].collect().toMap
    got.foreach { case (g, est) =>
      val n = exact(g).toDouble
      assert(math.abs(est - n) <= n / 2,
        s"group $g: est $est vs exact $n outside the 4σ bound")
    }
  }

  test("setOps: small sets ⇒ every estimate exact; combined cut = union sketch") {
    val k = 64
    // |A ∪ B| = 40 < k: the combined min-set IS the union, so union_est,
    // matches and inter_est are the exact set cardinalities
    val a = (1L to 25L).map(i => (1L, i)).toDF("g", "v")
    val b = (11L to 35L).map(i => (1L, i)).toDF("g", "v") // A∩B = 11..25
    val sa = KmvSketch.sketch(a, "g", "v", k)
    val sb = KmvSketch.sketch(b, "g", "v", k)
    val r = KmvSketch.setOpsEstimate(sa, sb, "g", k)
      .select("n_u", "matches", "union_est", "inter_est", "jac_est_ppm")
      .as[(Long, Long, Long, Long, Long)].collect()(0)
    assert(r == ((35L, 15L, 35L, 15L, 15L * 1000000L / 35L)))
    // the combined k-min cut equals the sketch of A ∪ B (the merge law)
    val u = KmvSketch.sketch(a.union(b), "g", "v", k)
      .select("mins").as[Seq[Long]].collect()(0)
    val cut = KmvSketch.merge(sa.union(sb), "g", k)
      .select("mins").as[Seq[Long]].collect()(0)
    assert(u == cut)
  }

  test("setOps on large sets: estimates land near truth, arithmetic replayable") {
    val k = 64
    val a = (1L to 3000L).map(i => (1L, i)).toDF("g", "v")
    val b = (2001L to 5000L).map(i => (1L, i)).toDF("g", "v") // inter 1000, union 5000
    val r = KmvSketch.setOpsEstimate(
        KmvSketch.sketch(a, "g", "v", k), KmvSketch.sketch(b, "g", "v", k),
        "g", k)
      .select("n_u", "kth_min", "matches", "union_est", "jac_est_ppm",
        "inter_est")
      .as[(Long, Long, Long, Long, Long, Long)].collect()(0)
    val (nU, kth, matches, uEst, jacPpm, iEst) = r
    assert(nU == k)
    // replay the estimator arithmetic
    assert(uEst == (k - 1).toLong * KmvSketch.Space / kth)
    assert(jacPpm == matches * 1000000L / nU)
    assert(iEst == matches * uEst / nU)
    // 1/√(k−2) ≈ 13%: stay inside a generous 4σ envelope
    assert(math.abs(uEst - 5000L) <= 2500, s"union_est $uEst")
    assert(math.abs(iEst - 1000L) <= 900, s"inter_est $iEst")
  }

  test("setOps: all-NULL group (empty min-sets) is dropped, not a runtime error") {
    val k = 8
    // hash48(NULL) is NULL, so a group whose values were all NULL carries
    // mins = [] in a persisted sketch frame; the estimator must drop the
    // group instead of erroring on element_at(u, 0) / dividing by n_u = 0
    val sa = KmvSketch.sketch((1L to 5L).map((1L, _)).toDF("g", "v"), "g", "v", k)
      .union(Seq((2L, Seq.empty[Long])).toDF("g", "mins"))
    val sb = KmvSketch.sketch((3L to 9L).map((1L, _)).toDF("g", "v"), "g", "v", k)
      .union(Seq((2L, Seq.empty[Long])).toDF("g", "mins"))
    val r = KmvSketch.setOpsEstimate(sa, sb, "g", k)
    val groups = r.select("g").as[Long].collect().toSet
    assert(groups == Set(1L), s"expected only group 1 to survive, got $groups")
  }

  test("containment: subset ⇒ exactly 1e6 at ANY k; disjoint ⇒ 0; small sets exact") {
    // A = 1..500 ⊂ B = 1..5000 with k = 16 ≪ |A|: every sampled A-hash
    // must match, so the estimate is exactly 1e6 regardless of sampling
    val k = 16
    val a = (1L to 500L).map((1L, _)).toDF("g", "v")
    val b = (1L to 5000L).map((1L, _)).toDF("g", "v")
    val sub = KmvSketch.containmentEstimate(
      KmvSketch.sketch(a, "g", "v", k), KmvSketch.sketch(b, "g", "v", k),
      "g", k).select("cont_est_ppm").as[Long].collect()(0)
    assert(sub == 1000000L, s"subset containment must be exactly 1e6, got $sub")
    // disjoint sets → 0 exactly
    val c = (10001L to 10500L).map((1L, _)).toDF("g", "v")
    val dis = KmvSketch.containmentEstimate(
      KmvSketch.sketch(a, "g", "v", k), KmvSketch.sketch(c, "g", "v", k),
      "g", k).select("cont_est_ppm").as[Long].collect()(0)
    assert(dis == 0L)
    // |A ∪ B| < k ⇒ the cut is the whole union and C is exact:
    // A = {1..10}, B = {6..20} → |A∩B| = 5, C = 500000 ppm
    val k2 = 64
    val sa = KmvSketch.sketch((1L to 10L).map((1L, _)).toDF("g", "v"), "g", "v", k2)
    val sb = KmvSketch.sketch((6L to 20L).map((1L, _)).toDF("g", "v"), "g", "v", k2)
    val r = KmvSketch.containmentEstimate(sa, sb, "g", k2)
      .select("n_u", "n_in_a", "matches", "cont_est_ppm")
      .as[(Long, Long, Long, Long)].collect()(0)
    assert(r == ((20L, 10L, 5L, 500000L)))
  }

  test("fracContainment: subset ⇒ exactly 1e6 at any scale; disjoint ⇒ 0; " +
      "sPpm = 1e6 ⇒ exact; estimate near truth at s = 1/4") {
    // A = 1..400 ⊂ B = 1..8000: FA ⊆ FB under the shared τ, so the
    // screen reads exactly 1e6 — no sampling noise on full containment
    val a = (1L to 400L).map((1L, _)).toDF("g", "v")
    val b = (1L to 8000L).map((1L, _)).toDF("g", "v")
    val sub = KmvSketch.fracContainment(
      KmvSketch.fracSketch(a, "g", "v", 250000L),
      KmvSketch.fracSketch(b, "g", "v", 250000L), "g")
      .select("cont_est_ppm").as[Long].collect()(0)
    assert(sub == 1000000L, s"subset containment must be exactly 1e6, got $sub")
    // disjoint → 0
    val c = (20001L to 20400L).map((1L, _)).toDF("g", "v")
    val dis = KmvSketch.fracContainment(
      KmvSketch.fracSketch(a, "g", "v", 250000L),
      KmvSketch.fracSketch(c, "g", "v", 250000L), "g")
      .select("cont_est_ppm").as[Long].collect()(0)
    assert(dis == 0L)
    // half-contained at sPpm = 1e6 (keep everything) → exact 500000
    val h = (201L to 600L).map((1L, _)).toDF("g", "v")
    val ex = KmvSketch.fracContainment(
      KmvSketch.fracSketch(a, "g", "v", 1000000L),
      KmvSketch.fracSketch(h, "g", "v", 1000000L), "g")
      .select("n_a_frac", "matches", "cont_est_ppm")
      .as[(Long, Long, Long)].collect()(0)
    assert(ex == ((400L, 200L, 500000L)))
    // half-contained at s = 1/4: estimate within 4σ of 500000
    val est = KmvSketch.fracContainment(
      KmvSketch.fracSketch(a, "g", "v", 250000L),
      KmvSketch.fracSketch(h, "g", "v", 250000L), "g")
      .select("n_a_frac", "cont_est_ppm").as[(Long, Long)].collect()(0)
    assert(math.abs(est._2 - 500000L) <= 4 * 500000L /
      math.sqrt(est._1.toDouble).toLong,
      s"containment estimate ${est._2} too far from 500000 (n=${est._1})")
  }

  test("fracMerge: shard sketches union to EXACTLY the global frac sketch, " +
      "and screens over merged shards equal whole-corpus screens") {
    // overlapping shards (the realistic case: a doc id in two shards)
    val g1 = (1L to 3000L).map((1L, _)).toDF("g", "v")
    val s1 = KmvSketch.fracSketch(g1.filter(col("v") <= 2000L), "g", "v", 250000L)
    val s2 = KmvSketch.fracSketch(g1.filter(col("v") >= 1500L), "g", "v", 250000L)
    val merged = KmvSketch.fracMerge(s1.union(s2), "g")
      .select("fmins").as[Seq[Long]].collect()(0)
    val global = KmvSketch.fracSketch(g1, "g", "v", 250000L)
      .select("fmins").as[Seq[Long]].collect()(0)
    // the τ cut commutes with union: EXACT hash-for-hash equality, not
    // an estimate — the property that lets shards sketch independently
    assert(merged === global)
    // and a containment screen over the merged artifact is identical to
    // one over a from-scratch whole-corpus sketch
    val probe = KmvSketch.fracSketch(
      (500L to 900L).map((1L, _)).toDF("g", "v"), "g", "v", 250000L)
    val viaMerged = KmvSketch.fracContainment(probe,
        KmvSketch.fracMerge(s1.union(s2), "g"), "g")
      .select("cont_est_ppm").as[Long].collect()(0)
    val viaGlobal = KmvSketch.fracContainment(probe,
        KmvSketch.fracSketch(g1, "g", "v", 250000L), "g")
      .select("cont_est_ppm").as[Long].collect()(0)
    assert(viaMerged == viaGlobal && viaMerged == 1000000L,
      s"probe ⊆ corpus must read 1e6 via either path: $viaMerged / $viaGlobal")
  }

  test("per-shard sketches merge to the global sketch (mergeability)") {
    val k = 32
    val a = events.filter(col("event_id") % 2 === 0)
    val b = events.filter(col("event_id") % 2 === 1)
    val shards = KmvSketch.sketch(a, "event_type", "user_id", k)
      .union(KmvSketch.sketch(b, "event_type", "user_id", k))
    val merged = KmvSketch.merge(shards, "event_type", k)
      .select(col("event_type"), col("mins"))
      .as[(String, Seq[Long])].collect().toMap
    val global = KmvSketch.sketch(events, "event_type", "user_id", k)
      .select(col("event_type"), col("mins"))
      .as[(String, Seq[Long])].collect().toMap
    assert(merged === global)
  }
}
