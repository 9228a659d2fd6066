package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BandJoinSpec extends SparkSpec {
  import spark.implicits._

  test("band join matches nested-loop semantics") {
    val left = Seq((1L, 10L), (1L, 50L), (1L, 100L), (2L, 10L))
      .toDF("k", "lv").select(col("k"), col("lv"), col("lv").as("a_id"))
    val right = Seq((1L, 12L), (1L, 49L), (1L, 200L), (2L, 11L))
      .toDF("k", "rv").select(col("k"), col("rv"), col("rv").as("b_id"))
    val got = BandJoin.bandJoin(left, right, Seq("k"),
        col("lv"), col("rv"), lo = -5L, hi = 10L)
      .select("k", "lv", "rv").as[(Long, Long, Long)].collect().toSet
    val expect = (for {
      (lk, lv) <- Seq((1L, 10L), (1L, 50L), (1L, 100L), (2L, 10L))
      (rk, rv) <- Seq((1L, 12L), (1L, 49L), (1L, 200L), (2L, 11L))
      if lk == rk && rv - lv >= -5 && rv - lv <= 10
    } yield (lk, lv, rv)).toSet
    assert(got == expect)
  }

  test("band join handles negative values and residual predicate") {
    val left = Seq((1L, -100L, 1L)).toDF("k", "lv", "a_id")
    val right = Seq((1L, -95L, 2L), (1L, -80L, 3L)).toDF("k", "rv", "b_id")
    val got = BandJoin.bandJoin(left, right, Seq("k"), col("lv"), col("rv"),
        lo = 0L, hi = 10L, residual = col("b_id") =!= 2L)
      .select("rv").as[Long].collect().toSeq
    assert(got.isEmpty) // -95 excluded by residual; -80 outside band
  }

  test("band join stays exact for long values beyond 2^53 (decimal buckets)") {
    // doubles round these values to multiples of 4 — the old double-divide
    // bucketing could place left and right in different buckets and DROP
    // genuinely matching pairs
    val base = (1L << 55) + 1L
    val left = (0 until 50).map(i => (1L, base + i * 3L)).toDF("k", "lv")
    val right = (0 until 50).map(i => (1L, base + i * 3L + 1L)).toDF("k", "rv")
    val got = BandJoin.bandJoin(left, right, Seq("k"),
        col("lv"), col("rv"), lo = 0L, hi = 4L)
      .select("lv", "rv").as[(Long, Long)].collect().toSet
    val expect = (for {
      i <- 0 until 50; j <- 0 until 50
      lv = base + i * 3L; rv = base + j * 3L + 1L
      if rv - lv >= 0 && rv - lv <= 4
    } yield (lv, rv)).toSet
    assert(got == expect)
    assert(expect.size >= 50) // at least the (i, i) and many (i, i+1) pairs
  }

  test("fractional band join accepts bounds beyond 1e15 (double path)") {
    // the 1e15 guard protects the decimal casts, which only the integral
    // path uses — a double-typed band join with huge bounds must still run
    val left = Seq((1L, 0.0), (1L, 1e15)).toDF("k", "lv")
    val right = Seq((1L, 5e14), (1L, 3e15)).toDF("k", "rv")
    val got = BandJoin.bandJoin(left, right, Seq("k"),
        col("lv"), col("rv"), lo = 0L, hi = 2_000_000_000_000_000L)
      .select("lv", "rv").as[(Double, Double)].collect().toSet
    assert(got == Set((0.0, 5e14), (1e15, 3e15)))
    // integral columns with the same bounds still throw (decimal overflow guard)
    val li = Seq((1L, 0L)).toDF("k", "lv")
    val ri = Seq((1L, 1L)).toDF("k", "rv")
    intercept[IllegalArgumentException] {
      BandJoin.bandJoin(li, ri, Seq("k"), col("lv"), col("rv"),
        lo = 0L, hi = 2_000_000_000_000_000L)
    }
  }

  test("fractional band join rejects bounds at/beyond 2^53 (double rounding)") {
    // v + shift in doubles: once ulp(v+shift) exceeds the distance to a
    // bucket boundary, the bucket drifts and a matching pair is silently
    // dropped (e.g. v = -0.5, hi = 2^60 → buckets {-1,1}, right row in
    // bucket 0 lost). The guard turns the silent false negative into an error.
    val left = Seq((1L, -0.5)).toDF("k", "lv")
    val right = Seq((1L, 0.25)).toDF("k", "rv")
    intercept[IllegalArgumentException] {
      BandJoin.bandJoin(left, right, Seq("k"), col("lv"), col("rv"),
        lo = 0L, hi = 1L << 53)
    }
    intercept[IllegalArgumentException] {
      BandJoin.bandJoin(left, right, Seq("k"), col("lv"), col("rv"),
        lo = -(1L << 60), hi = 0L)
    }
  }
}

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("chain, clique, and singleton components (both execution paths)") {
    // chain 1-2-3-4, clique 10-11-12, isolated edge 20-21
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L)).toDF("src", "dst")
    for (threshold <- Seq(Long.MaxValue, 0L)) { // local path / distributed path
      val comps = ConnectedComponents.components(edges, localThreshold = threshold)
        .as[(Long, Long)].collect().toMap
      assert(Seq(1L, 2L, 3L, 4L).map(comps) == Seq(1L, 1L, 1L, 1L))
      assert(Seq(10L, 11L, 12L).map(comps).distinct == Seq(10L))
      assert(Seq(20L, 21L).map(comps).distinct == Seq(20L))
    }
  }

  test("long chain converges (pointer jumping, distributed path)") {
    val n = 200
    val edges = (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("src", "dst")
    val comps = ConnectedComponents.components(edges, maxIter = 12, localThreshold = 0L)
      .as[(Long, Long)].collect()
    assert(comps.map(_._2).distinct.toSeq == Seq(1L))
  }

  test("local and distributed paths agree on a random graph") {
    val rnd = new scala.util.Random(7)
    val edges = (1 to 300).map(_ => (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter(e => e._1 != e._2).toDF("src", "dst")
    val local = ConnectedComponents.components(edges)
      .as[(Long, Long)].collect().toMap
    val dist = ConnectedComponents.components(edges, localThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    assert(local == dist)
  }

  test("star contraction == label propagation == union-find on random graphs") {
    for (seed <- Seq(1, 23, 99)) {
      val rnd = new scala.util.Random(seed)
      val edges = (1 to 200).map(_ => (rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
        .filter(e => e._1 != e._2).toDF("src", "dst")
      val local = ConnectedComponents.components(edges)
        .as[(Long, Long)].collect().toMap
      val star = ConnectedComponents.starContraction(edges)
        .as[(Long, Long)].collect().toMap
      val lp = ConnectedComponents.componentsLabelPropagation(edges)
        .as[(Long, Long)].collect().toMap
      assert(star == local, s"star vs union-find diverged at seed $seed")
      assert(lp == local, s"label-prop vs union-find diverged at seed $seed")
    }
  }
}

class RecencySplitSpec extends SparkSpec {
  import spark.implicits._

  test("split is data-relative per key and partitions rows exactly") {
    val df = Seq(
      (1L, "2024-01-01 00:00:00"), (1L, "2024-01-20 00:00:00"),
      (1L, "2024-01-31 00:00:00"),
      (2L, "2023-06-01 00:00:00"), (2L, "2023-06-10 00:00:00"))
      .toDF("user_id", "s")
      .select(col("user_id"), to_timestamp(col("s")).as("ts"))
    val (full, recent) = RecencySplit.split(df, col("ts"), col("user_id"), "-15d")
    assert(full.count() == 5)
    val rec = recent.select(col("user_id"), col("ts").cast("string"))
      .as[(Long, String)].collect().toSet
    // user 1: max Jan 31 → keep > Jan 16; user 2: max Jun 10 → keep > May 26
    assert(rec == Set(
      (1L, "2024-01-20 00:00:00"), (1L, "2024-01-31 00:00:00"),
      (2L, "2023-06-01 00:00:00"), (2L, "2023-06-10 00:00:00")))
  }
}

class SessionizeSpec extends SparkSpec {
  import spark.implicits._
  import graft.enrich.StubSessionsLLM

  private def activity(rows: (Long, String, String)*) =
    rows.toSeq.toDF("user_id", "s", "title")
      .select(col("user_id"), to_timestamp(col("s")).as("ts"), col("title"))

  test("stub LLM round trip produces one session per chunk") {
    val df = activity(
      (1L, "2024-01-01 09:00:00", "alpha beta"),
      (1L, "2024-01-01 09:30:00", "gamma delta"),
      (1L, "2024-01-02 11:00:00", "epsilon zeta"))
    val got = Sessionize.sessions(df, new StubSessionsLLM)
      .orderBy("date").collect()
    assert(got.length == 2) // one chunk per day
    val first = got(0)
    assert(first.getAs[String]("time_start") == "09:00")
    assert(first.getAs[String]("time_end") == "09:30")
    assert(first.getAs[scala.collection.Seq[String]]("interests") == Seq("beta", "delta"))
    assert(first.getAs[Int]("start_s") == 9 * 3600)
  }

  test("chunking splits days into chunkSize groups") {
    val rows = (0 until 40).map(i =>
      (1L, f"2024-01-01 10:${i % 60}%02d:00", s"title$i"))
    val got = Sessionize.sessions(activity(rows: _*), new StubSessionsLLM, chunkSize = 15)
    assert(got.count() == 3) // 15+15+10
  }

  test("invalid snippets are dropped (stub emits a wrong-key trailer)") {
    val df = activity((1L, "2024-01-01 09:00:00", "alpha beta"))
    val got = Sessionize.sessions(df, new StubSessionsLLM).collect()
    assert(got.length == 1) // the {"unrelated": true} trailer was filtered
  }

  test("observe counters surface as a queryable metrics frame") {
    // 2 chunks → 2 stub responses, each: 1 valid session + 1 wrong-key
    // trailer → n_snippets = 4, invalid_keys = 2, invalid_times = 0
    val df = activity(
      (1L, "2024-01-01 09:00:00", "alpha beta"),
      (1L, "2024-01-02 11:00:00", "gamma delta"))
    val m = ObservedMetrics.collect(Sessionize.sessions(df, new StubSessionsLLM))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(m(("sessionize", "n_snippets")) == 4.0)
    assert(m(("sessionize", "invalid_keys")) == 2.0)
    assert(m(("sessionize", "invalid_times")) == 0.0)
  }

  test("collectAll harvests several stages' counters from one pass") {
    import graft.enrich.StubInterestsLLM
    val df = activity(
      (1L, "2024-01-01 09:00:00", "alpha beta"),
      (1L, "2024-01-02 11:00:00", "gamma delta"))
    def asMap(m: org.apache.spark.sql.DataFrame) =
      m.collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val onePass = asMap(ObservedMetrics.collectAll(Seq(
      Sessionize.sessions(df, new StubSessionsLLM),
      InterestsExtract.interests(df, new StubInterestsLLM))))
    val twoPasses =
      asMap(ObservedMetrics.collect(Sessionize.sessions(df, new StubSessionsLLM))) ++
      asMap(ObservedMetrics.collect(InterestsExtract.interests(df, new StubInterestsLLM)))
    assert(onePass == twoPasses)
    assert(onePass.keys.map(_._1).toSet == Set("sessionize", "interests"))
  }
}

class SessionOpsSpec extends SparkSpec {
  import spark.implicits._

  /** Hand-built sessions with controlled embeddings (FIXTURES A5):
    * orthogonal vs parallel unit vectors give exact similarity 0 / 1. */
  private def sessionsDf(rows: (Long, String, Int, Int, String, Seq[Float])*) =
    rows.toSeq.toDF("user_id", "ds", "start_s", "end_s", "description", "embedding")
      .select(col("user_id"), to_date(col("ds")).as("date"),
        col("start_s"), col("end_s"), col("description"),
        lit(null).cast("array<string>").as("interests"),
        col("embedding"))

  private val e1 = Seq(1f, 0f, 0f)
  private val e2 = Seq(0f, 1f, 0f)

  test("merge: chain a-b, b-c collapses to one interval; isolated survives") {
    // gaps: a→b 600s, b→c 600s, d far away; all same embedding (sim 1)
    val sess = SessionOps.withIds(sessionsDf(
      (1L, "2024-01-01", 36000, 36600, "a", e1),
      (1L, "2024-01-01", 37200, 37800, "b", e1),
      (1L, "2024-01-01", 38400, 39000, "c", e1),
      (1L, "2024-01-01", 80000, 80600, "d", e2)))
    val thresholds = Seq((1L, 700.0, 0.9)).toDF("user_id", "time_threshold_s", "similarity_threshold")
    val pairs = SessionOps.candidatePairs(sess, thresholds)
    val merged = SessionOps.merge(sess, pairs).orderBy("start_s").collect()
    assert(merged.length == 2)
    assert(merged(0).getAs[String]("description") == "a") // earliest keeps identity
    assert(merged(0).getAs[Int]("start_s") == 36000)
    assert(merged(0).getAs[Int]("end_s") == 39000) // extended over the chain
    assert(merged(0).getAs[Long]("n_merged") == 3)
    assert(merged(1).getAs[String]("description") == "d")
  }

  test("merge respects similarity threshold") {
    // temporally adjacent but orthogonal embeddings → no merge
    val sess = SessionOps.withIds(sessionsDf(
      (1L, "2024-01-01", 36000, 36600, "a", e1),
      (1L, "2024-01-01", 37200, 37800, "b", e2)))
    val thresholds = Seq((1L, 700.0, 0.9)).toDF("user_id", "time_threshold_s", "similarity_threshold")
    val pairs = SessionOps.candidatePairs(sess, thresholds)
    assert(pairs.count() == 0)
    assert(SessionOps.merge(sess, pairs).count() == 2)
  }

  test("merge crosses days when gap is inside threshold") {
    val sess = SessionOps.withIds(sessionsDf(
      (1L, "2024-01-01", 86000, 86300, "a", e1), // ends 23:51:40
      (1L, "2024-01-02", 300, 600, "b", e1))) // starts 00:05 next day, gap 700s
    val thresholds = Seq((1L, 800.0, 0.9)).toDF("user_id", "time_threshold_s", "similarity_threshold")
    val merged = SessionOps.merge(sess, SessionOps.candidatePairs(sess, thresholds)).collect()
    assert(merged.length == 1)
    // reference GREATEST/LEAST on time-of-day: start = LEAST(86000, 300)!
    assert(merged(0).getAs[Int]("start_s") == 300)
    assert(merged(0).getAs[Int]("end_s") == 86300)
  }

  test("thresholds compute per-user gap/similarity percentiles") {
    val sess = SessionOps.withIds(sessionsDf(
      (1L, "2024-01-01", 36000, 36600, "a", e1),
      (1L, "2024-01-01", 37200, 37800, "b", e1),
      (1L, "2024-01-01", 39000, 39600, "c", e1)))
    val t = SessionOps.thresholds(sess).collect()
    assert(t.length == 1)
    // gaps 600 and 1200 → p10 = 660 (linear interpolation)
    assert(math.abs(t(0).getAs[Double]("time_threshold_s") - 660.0) < 1e-9)
    assert(math.abs(t(0).getAs[Double]("similarity_threshold") - 1.0) < 1e-9)
  }

  test("similarity graph: top-1 later edge above threshold, weight = 1 - sim") {
    val sess = SessionOps.withIds(sessionsDf(
      (1L, "2024-01-01", 36000, 36600, "a", e1),
      (1L, "2024-01-02", 36000, 36600, "b", e1), // parallel to a
      (1L, "2024-01-03", 36000, 36600, "c", e2))) // orthogonal
    val thresholds = Seq((1L, 0.0, 0.5)).toDF("user_id", "time_threshold_s", "similarity_threshold")
    val g = SessionOps.similarityGraph(sess, thresholds)
      .select("parent_id", "child_id", "weight").collect()
    // a→b (sim 1 > 0.5); b's only later is c (sim 0, filtered); c has none
    assert(g.length == 1)
    assert(math.abs(g(0).getAs[Double]("weight")) < 1e-9)
  }

  test("similarity graph: LSH-pruned path for big users matches all-pairs") {
    // 12 sessions per user cycling 3 orthogonal directions: every parent's
    // true top-1 is a later IDENTICAL vector (sim 1.0), and identical
    // vectors share every LSH bucket — the pruned candidate set provably
    // contains each argmax, so the outputs must be set-equal.
    val dirs = Seq(Seq(1f, 0f, 0f), Seq(0f, 1f, 0f), Seq(0f, 0f, 1f))
    val rows = for (u <- Seq(1L, 2L); i <- 0 until 12)
      yield (u, f"2024-01-${i + 1}%02d", 36000, 36600, s"s$u-$i", dirs(i % 3))
    val sess = SessionOps.withIds(sessionsDf(rows: _*))
    val thresholds = Seq((1L, 0.0, 0.5), (2L, 0.0, 0.5))
      .toDF("user_id", "time_threshold_s", "similarity_threshold")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("parent_id"),
        r.getAs[Long]("child_id"), math.round(r.getAs[Double]("weight") * 1e9))).toSet
    val exact = norm(SessionOps.similarityGraph(sess, thresholds,
      exactUserLimit = Long.MaxValue))
    val pruned = norm(SessionOps.similarityGraph(sess, thresholds,
      exactUserLimit = 0L))
    assert(exact.nonEmpty)
    assert(pruned == exact)
    // mixed routing: user 1 (12 sessions) above the limit → pruned branch,
    // a 3-session user below it → exact branch; union must still match
    val mixedRows = rows.filter(_._1 == 1L) ++
      (0 until 3).map(i => (9L, f"2024-02-${i + 1}%02d", 36000, 36600, s"t$i", dirs(0)))
    val mixedSess = SessionOps.withIds(sessionsDf(mixedRows: _*))
    val mixedT = Seq((1L, 0.0, 0.5), (9L, 0.0, 0.5))
      .toDF("user_id", "time_threshold_s", "similarity_threshold")
    assert(norm(SessionOps.similarityGraph(mixedSess, mixedT, exactUserLimit = 5L))
      == norm(SessionOps.similarityGraph(mixedSess, mixedT, exactUserLimit = Long.MaxValue)))
  }

  test("similarity graph: hot-bucket cap keeps the pruned branch linear, edges stay valid") {
    // all sessions of one direction → every LSH bucket of every table holds
    // the whole user (the degenerate hot bucket); bucketCap=2 forces the
    // star path for most members. Every emitted edge must still be a valid
    // (later, sim-above-threshold) pair, parents are a subset of the exact
    // run's parents, and identical vectors mean weight 0 everywhere.
    val rows = for (i <- 0 until 12)
      yield (1L, f"2024-01-${i + 1}%02d", 36000, 36600, s"s$i", Seq(1f, 0f, 0f))
    val sess = SessionOps.withIds(sessionsDf(rows: _*))
    val thresholds = Seq((1L, 0.0, 0.5)).toDF("user_id", "time_threshold_s", "similarity_threshold")
    val exact = SessionOps.similarityGraph(sess, thresholds,
        exactUserLimit = Long.MaxValue)
      .select("parent_id").as[Long].collect().toSet
    val cappedDf = SessionOps.similarityGraph(sess, thresholds,
      exactUserLimit = 0L, bucketCap = 2)
    val capped = cappedDf.select(col("parent_id"), col("weight")).collect()
    assert(capped.nonEmpty)
    capped.foreach { r =>
      assert(exact.contains(r.getLong(0)))
      assert(math.abs(r.getDouble(1)) < 1e-9)
    }
    // never silent: the cap reports its demotions through the observe
    // counter the plan carries
    val m = graft.operators.ObservedMetrics.collect(cappedDf).collect()
      .map(r => r.getString(1) -> r.getDouble(2)).toMap
    assert(m("demoted_members") > 0.0)
    assert(m("max_bucket_members") == 12.0)
    // a cap ABOVE the bucket size reproduces the uncapped pruned result
    def norm2(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("parent_id"), r.getAs[Long]("child_id"))).toSet
    assert(norm2(SessionOps.similarityGraph(sess, thresholds, exactUserLimit = 0L,
        bucketCap = 64))
      == norm2(SessionOps.similarityGraph(sess, thresholds, exactUserLimit = 0L)))
  }
}

class InterestsExtractSpec extends SparkSpec {
  import spark.implicits._
  import graft.enrich.StubInterestsLLM

  test("two-turn extraction yields distinct per-day interests") {
    val df = Seq(
      (1L, "2024-01-01 09:00:00", "reading about spark"),
      (1L, "2024-01-01 09:30:00", "learning about catalyst"),
      (1L, "2024-01-01 10:00:00", "more spark"))
      .toDF("user_id", "s", "title")
      .select(col("user_id"), to_timestamp(col("s")).as("ts"), col("title"))
    val got = InterestsExtract.interests(df, new StubInterestsLLM).collect()
    assert(got.length == 1)
    val r = got(0)
    assert(r.getAs[scala.collection.Seq[String]]("interests") == Seq("catalyst", "spark"))
    assert(r.getAs[Long]("count_invalid_responses") == 0)
    assert(r.getAs[scala.collection.Seq[scala.collection.Seq[String]]]("chunked_interests").length == 1)
  }
}

class LocalClusterSpec extends SparkSpec {
  import spark.implicits._
  import graft.cluster.LocalCluster

  test("kernel: two tight groups + noise") {
    def jitter(base: Array[Float], i: Int): Array[Float] =
      base.zipWithIndex.map { case (v, j) => v + (if (j == i % 3) 0.001f else 0f) }
    val g1 = (0 until 5).map(i => jitter(Array(1f, 0f, 0f), i))
    val g2 = (0 until 5).map(i => jitter(Array(0f, 1f, 0f), i))
    val noise = Array(Array(0.577f, 0.577f, 0.577f))
    val labels = LocalCluster.clusterVectors((g1 ++ g2 ++ noise).toArray, eps = 0.01, minClusterSize = 5)
    assert(labels.take(5).distinct.length == 1 && labels.take(5).head != -1)
    assert(labels.slice(5, 10).distinct.length == 1 && labels(5) != labels(0))
    assert(labels.last == -1)
  }

  test("per-key clustering is deterministic and keyed") {
    val rows = (0 until 12).map { i =>
      val key = (i % 2).toLong
      val vec = if (i < 6) Seq(1f, 0.001f * i, 0f) else Seq(0f, 1f, 0.001f * i)
      (key, s"item$i", vec)
    }
    val df = rows.toDF("user_id", "interest", "embedding")
    val a = LocalCluster.clusterPerKey(df, "user_id", "interest", "embedding",
      eps = 0.01, minClusterSize = 2).collect().map(r => (r.getLong(0), r.getString(1), r.getInt(3))).toSet
    val b = LocalCluster.clusterPerKey(df.repartition(7), "user_id", "interest", "embedding",
      eps = 0.01, minClusterSize = 2).collect().map(r => (r.getLong(0), r.getString(1), r.getInt(3))).toSet
    assert(a == b) // partitioning-independent
  }

  test("per-key clustering fails fast on a group over the row cap") {
    // the O(n²) local pass is only safe for bounded groups — an unbounded
    // group must die loudly at group entry, not OOM three stages later
    val big = (0 to LocalCluster.MaxGroupRows).map(i => (1L, s"i$i", Seq(1f, i.toFloat)))
    val e = intercept[Exception] {
      LocalCluster.clusterPerKey(big.toDF("user_id", "interest", "embedding"),
        "user_id", "interest", "embedding", eps = 0.01, minClusterSize = 2)
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains(s"${LocalCluster.MaxGroupRows}-row cap")), e.toString)
  }
}

class TakeoutIngestSpec extends SparkSpec {
  import graft.pipeline.TakeoutIngest

  test("golden: parse + derive + recency split over a fixture tree") {
    val root = java.nio.file.Files.createTempDirectory("takeout").toString
    def write(user: String, rows: Seq[String]): Unit = {
      val dir = java.nio.file.Paths.get(root, user)
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.writeString(dir.resolve("MyActivity.json"),
        "[" + rows.mkString(",") + "]")
    }
    def row(title: String, time: String): String =
      s"""{"header": "Search", "title": "$title", "titleUrl": "http://x",
         | "time": "$time", "products": ["Search"]}""".stripMargin
    write("alice", Seq(
      row("Searched for spark", "2024-01-01T10:00:00.000Z"),
      row("Searched for scala", "2024-01-20T11:30:00.000Z")))
    write("bob", Seq(
      row("Searched for ducks", "2024-02-01T09:15:00.000Z")))

    val (full, recent) = TakeoutIngest.parseAndSplit(spark, root)
    assert(full.count() == 3)
    val cols = full.columns.toSet
    assert(Set("user_id", "timestamp", "date", "hour", "month").subsetOf(cols))
    assert(!cols.contains("time"))
    val alice = full.filter(col("user_id") === "alice")
      .orderBy("timestamp").collect()
    assert(alice(0).getAs[String]("hour") == "10:00")
    assert(alice(0).getAs[String]("month") == "2024-01-01") // full date, sic
    // alice max=Jan 20 → only Jan 20 row is recent; bob's single row is recent
    val rec = recent.select("user_id").as[String](org.apache.spark.sql.Encoders.STRING)
      .collect().sorted.toSeq
    assert(rec == Seq("alice", "bob"))
  }
}
