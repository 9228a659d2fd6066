package graft.text

import org.apache.spark.sql.Row
import graft.SparkSpec

class CurationSpec extends SparkSpec {

  import spark.implicits._

  test("spanDedupStats: later occurrence of a shared span is the duplicate") {
    val df = Seq(
      (1L, "a b c d e"), // spans (w=2): "a b" | "c d" | "e"
      (2L, "c d x y") //    spans: "c d" (dup of doc1 pos1) | "x y"
    ).toDF("doc_id", "text")
    val out = Curation.spanDedupStats(df, "doc_id", "text", spanTokens = 2)
      .orderBy("doc_id").collect()
    assert(out.toSeq === Seq(Row(1L, 3L, 0L, 5L), Row(2L, 2L, 1L, 2L)))
  }

  test("spanDedupStats: a full copy keeps zero tokens") {
    val df = Seq((10L, "p q r s"), (20L, "p q r s")).toDF("doc_id", "text")
    val out = Curation.spanDedupStats(df, "doc_id", "text", spanTokens = 2)
      .orderBy("doc_id").collect()
    assert(out.toSeq === Seq(Row(10L, 2L, 0L, 4L), Row(20L, 2L, 2L, 0L)))
  }

  test("spanDedupStats: duplicate spans inside ONE document count too") {
    val df = Seq((1L, "a b a b a b")).toDF("doc_id", "text")
    val out = Curation.spanDedupStats(df, "doc_id", "text", spanTokens = 2)
      .collect()
    assert(out.toSeq === Seq(Row(1L, 3L, 2L, 2L)))
  }

  test("spanDedupStats: overlapping stride catches a shifted duplicate") {
    // doc 2 repeats doc 1's region misaligned with the non-overlap grid
    val df = Seq((1L, "p q r s t u"), (2L, "z z p q r s t u")).toDF("doc_id", "text")
    // stride = width (4): doc1 [p q r s][t u], doc2 [z z p q][r s t u] — miss
    val aligned = Curation.spanDedupStats(df, "doc_id", "text", spanTokens = 4)
      .orderBy("doc_id").collect()
    assert(aligned.map(_.getLong(2)).toSeq === Seq(0L, 0L))
    // stride 2: doc2's window at offset 2 = [p q r s] = doc1's first — caught
    val overlap = Curation.spanDedupStats(df, "doc_id", "text",
        spanTokens = 4, strideOpt = Some(2)).orderBy("doc_id").collect()
    assert(overlap.map(_.getLong(2)).toSeq === Seq(0L, 2L))
  }

  test("hashSplit: deterministic, seed-sensitive, growth-stable") {
    val a = Curation.hashSplit(spark.range(1000).toDF("id"), "id", "s1")
      .select("id", "split").as[(Long, String)].collect().toMap
    val b = Curation.hashSplit(spark.range(1000).toDF("id"), "id", "s1")
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(a === b)
    val c = Curation.hashSplit(spark.range(1000).toDF("id"), "id", "s2")
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(a !== c) // a different seed is an independent redraw
    // adding rows never reassigns an existing id
    val grown = Curation.hashSplit(spark.range(2000).toDF("id"), "id", "s1")
      .select("id", "split").as[(Long, String)].collect().toMap
    assert((0L until 1000L).forall(i => grown(i) == a(i)))
    // 250/3/3 out of 256 — all splits present, train dominates
    val frac = a.values.groupBy(identity).view.mapValues(_.size / 1000.0).toMap
    assert(frac.keySet === Set("train", "valid", "test"))
    assert(frac("train") > 0.9)
  }

  test("unigramLogprob: hand-computed corpus probabilities") {
    val df = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = Curation.unigramLogprob(df, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Double)].collect()
    // counts: a=2 b=2 c=1, N=5
    val d1 = math.log10(2.0 / 5) // every token of doc 1 has p = 0.4
    val d2 = (math.log10(2.0 / 5) + math.log10(1.0 / 5)) / 2
    assert(out(0)._2 === 3L && math.abs(out(0)._3 - d1) < 1e-12)
    assert(out(1)._2 === 2L && math.abs(out(1)._3 - d2) < 1e-12)
  }

  test("filterFunnel: first failing rule wins the attribution") {
    // doc 1 is BOTH too short and stopword-free: lands in 1_too_short
    val df = Seq(
      (1L, "x y z"),
      (2L, Seq.tabulate(50)(i => if (i % 5 == 0) "the" else s"v$i")
        .mkString(" ")), // 50 varied tokens, stopword-rich → kept
      (3L, Seq.tabulate(95)(i => s"t$i").mkString(" ") + " the"), // 96 > 90
      (4L, Seq.tabulate(40)(i => s"u$i").mkString(" ")), // no stopwords
      (5L, "the " + ("r s t " * 12).trim) // 37 tokens, repeated 3-grams
    ).toDF("doc_id", "text")
    val staged = df.select($"doc_id",
        Curation.funnelStage($"text", 20, 90, 0.02, 0.02,
          Seq("the", "a", "of", "and", "to")).as("stage"))
      .as[(Long, String)].collect().toMap
    assert(staged === Map(
      1L -> "1_too_short", 2L -> "5_kept", 3L -> "2_too_long",
      4L -> "3_low_stopword", 5L -> "4_repetitive"))
    val counts = Curation.filterFunnel(df, "text", 20, 90, 0.02, 0.02)
      .as[(String, Long)].collect().toMap
    assert(counts.values.sum === 5L && counts.size === 5)
  }

  test("bigramLogprob: hand-computed smoothed conditionals") {
    val df = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val out = Curation.bigramLogprob(df, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
    // transitions: "a b"×2, "b a"×1; V=2; c(a)=2, c(b)=1
    // p(a b) = 2.5/(2+1.5), p(b a) = 1.5/(1+1.5)
    val expected =
      (2 * math.log10(2.5 / 3.5) + math.log10(1.5 / 2.5)) / 3
    assert(out.length === 1)
    assert(out.head._2 === 3L)
    assert(math.abs(out.head._3 - expected) < 1e-12)
  }

  test("heldOutUnigramScore: hand-computed smoothing and OOV bucket") {
    val df = Seq(
      (1L, "a a b", "train"),
      (2L, "a c", "valid")
    ).toDF("doc_id", "text", "split")
    val out = Curation.heldOutUnigramScore(df, "doc_id", "text", "split")
      .as[(Long, String, Long, Long, Double)].collect()
    assert(out.length === 1)
    val (id, split, nTok, nOov, lp) = out.head
    assert(id === 2L && split === "valid" && nTok === 2L && nOov === 1L)
    // vocab {a:2, b:1}, N=3, V=2, denom = 3 + 0.5·3 = 4.5
    val expected = (math.log10(2.5 / 4.5) + math.log10(0.5 / 4.5)) / 2
    assert(math.abs(lp - expected) < 1e-12)
  }

  test("dsirWeights: agrees with an in-memory recount of the bucket LMs") {
    val rows = Seq(
      (1L, "the cat sat", true),
      (2L, "the dog ran far", true),
      (3L, "le chat noir", false),
      (4L, "der hund lief weg schnell", false),
      (5L, "the cat ran", false)) // source doc with target-like n-grams
    val df = rows.toDF("doc_id", "text", "tgt")
    val got = Curation.dsirWeights(df, "doc_id", "text", $"tgt")
      .orderBy("doc_id").collect()

    // independent recount: same features, same bucketing, plain Scala
    def feats(t: String): Seq[String] = {
      val w = t.split(" ").toSeq
      w ++ w.sliding(2).filter(_.size == 2).map(_.mkString(" "))
    }
    def bucket(f: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(f.getBytes("UTF-8"))
      f"${d(0) & 0xff}%02x"
    }
    val byDoc = rows.map { case (id, t, tg) =>
      (id, tg, feats(t).map(bucket).groupBy(identity).map { case (b, o) => b -> o.size })
    }
    val ct = byDoc.filter(_._2).flatMap(_._3).groupBy(_._1)
      .map { case (b, ks) => b -> ks.map(_._2).sum }
    val cs = byDoc.filter(!_._2).flatMap(_._3).groupBy(_._1)
      .map { case (b, ks) => b -> ks.map(_._2).sum }
    val (nt, ns) = (ct.values.sum, cs.values.sum)
    got.foreach { r =>
      val (id, tg) = (r.getLong(0), r.getBoolean(1))
      val buckets = byDoc.find(_._1 == id).get._3
      assert(r.getLong(2) === buckets.values.sum.toLong, s"doc $id n_feats")
      val expect = buckets.map { case (b, k) =>
        k * (math.log10((ct.getOrElse(b, 0) + 0.5) / (nt + 128.0)) -
          math.log10((cs.getOrElse(b, 0) + 0.5) / (ns + 128.0)))
      }.sum
      assert(math.abs(r.getDouble(3) - expect) < 1e-9, s"doc $id log_weight")
    }
    // the target-overlapping source doc outranks the disjoint source docs
    val w = got.map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(w(5L) > w(3L) && w(5L) > w(4L),
      s"doc 5 (target-like) should outweigh docs 3/4: $w")
  }

  test("q115 mixture apply: copies bounded by floor/ceil and mean ≈ oversample") {
    val rows = graft.SparkEntry.queries("q115_mixture_apply")(spark, sf)
      .select("lang", "oversample", "n_copies")
      .as[(String, Double, Long)].collect()
    assert(rows.forall { case (_, os, n) =>
      n == math.floor(os).toLong || n == math.ceil(os).toLong })
    // per-lang mean replication converges on the oversample factor
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val os = rs.head._2
      val mean = rs.map(_._3).sum.toDouble / rs.size
      assert(math.abs(mean - os) < 0.25, s"mean $mean vs oversample $os")
    }
  }

  test("q116 BPE merge step: agrees with an in-memory recount") {
    val spark2 = spark
    val out = graft.SparkEntry.queries("q116_bpe_merge_step")(spark2, sf)
      .as[(String, Long)].collect()
    val freqs = scala.collection.mutable.Map.empty[String, Long]
    spark2.read.parquet(s"$sf/documents.parquet")
      .select("text").as[String].collect()
      .flatMap(_.split(" "))
      .groupBy(identity).foreach { case (tok, occ) =>
        if (tok.length >= 2)
          tok.sliding(2).foreach(p => freqs(p) = freqs.getOrElse(p, 0L) + occ.size)
      }
    val expected = freqs.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    assert(out.toSeq === expected)
  }

  test("q117 semantic canonical: agrees with union-find over the q58 pairs") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    val pairs = graft.dedup.Dedup
      .embeddingNearDup(emb, "vec_id", "embedding", "label", threshold = 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val out = graft.SparkEntry.queries("q117_semantic_canonical")(spark, sf)
      .as[(Long, Long, Int)].collect()
    out.foreach { case (id, keep, isDup) =>
      assert(keep === find(id))
      assert(isDup === (if (keep != id) 1 else 0))
    }
  }

  test("perplexityBuckets: per-language thirds, most-probable docs head") {
    // lang x: doc i carries i copies of the common token t (p = 1/2) and
    // 5−i singletons (p = 1/30) — six strictly increasing scores, and both
    // interpolated cuts land strictly BETWEEN adjacent scores, so the
    // thirds are exact: {1,2} tail, {3,4} middle, {5,6} head
    val df = Seq(
      (1L, "a1 a2 a3 a4 a5", "x"), (2L, "t b1 b2 b3 b4", "x"),
      (3L, "t t c1 c2 c3", "x"), (4L, "t t t d1 d2", "x"),
      (5L, "t t t t e1", "x"), (6L, "t t t t t", "x"),
      // lang y: scored against y's OWN lm — all-singleton docs tie at
      // uniform p, both cuts equal the tied score, every y doc is head
      (7L, "q r s p", "y"), (8L, "m n o l", "y"), (9L, "g h i j", "y")
    ).toDF("doc_id", "text", "lang")
    val out = Curation.perplexityBuckets(df, "doc_id", "text", "lang")
      .select("doc_id", "bucket").as[(Long, String)].collect().toMap
    assert(out(1L) === "tail" && out(2L) === "tail")
    assert(out(3L) === "middle" && out(4L) === "middle")
    assert(out(5L) === "head" && out(6L) === "head")
    assert(Seq(7L, 8L, 9L).forall(out(_) === "head"))
  }

  test("linearClassifierScore: mean pooling against a known weight table") {
    def bkt(f: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(f.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(3)
    // the hashing trick is lossy BY DESIGN: "a" and "a b" collide at 3 hex
    // chars (both 0cc...), so they SHARE one weight — the table is keyed by
    // bucket, one row each
    assert(bkt("a") === bkt("a b"))
    assert(bkt("a") !== bkt("b"))
    val df = Seq((1L, "a b"), (2L, "a")).toDF("doc_id", "text")
    val wts = Seq(bkt("a") -> 1.0, bkt("b") -> -0.5).toDF("b", "w")
    val out = Curation.linearClassifierScore(df, "doc_id", "text", wts)
      .orderBy("doc_id")
      .select("doc_id", "n_feats", "logit", "prob", "label")
      .as[(Long, Long, Double, Double, Boolean)].collect()
    // doc 1 features a, b, "a b" → buckets (0cc k=2, 92e k=1):
    // logit = (2·1.0 − 0.5) / 3 = 0.5 → label true
    assert(out(0)._2 === 3L)
    assert(math.abs(out(0)._3 - 0.5) < 1e-12)
    assert(math.abs(out(0)._4 - 1.0 / (1.0 + math.exp(-0.5))) < 1e-12)
    assert(out(0)._5)
    // doc 2: single feature a → logit 1.0
    assert(out(1) === ((2L, 1L, 1.0, 1.0 / (1.0 + math.exp(-1.0)), true)))
  }

  test("linearClassifierScore: bias shifts the decision boundary") {
    val df = Seq((1L, "a")).toDF("doc_id", "text")
    val wts = Seq("a").toDF("f")
      .select(org.apache.spark.sql.functions.substring(
        org.apache.spark.sql.functions.md5($"f"), 1, 3).as("b"))
      .withColumn("w", org.apache.spark.sql.functions.lit(0.3))
    val neg = Curation.linearClassifierScore(df, "doc_id", "text", wts,
      bias = -0.5).select("logit", "label").as[(Double, Boolean)].head()
    assert(math.abs(neg._1 - (-0.2)) < 1e-12 && !neg._2)
  }

  test("hardLrTrain: exact agreement with an independent integer reference") {
    // independent in-memory reimplementation of the ppm integer GD loop —
    // any divergence (division rounding, clamp, join semantics) fails exact
    val corpus = Seq(
      (1L, "aaa aaa aaa bbb", "en"), (2L, "aaa aaa ccc", "en"),
      (3L, "bbb bbb bbb", "de"), (4L, "ccc bbb ddd ddd", "de"),
      (5L, "aaa ddd", "en"))
    def bucket(tok: String, buckets: Int): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(0, 2), 16) % buckets
    }
    def reference(buckets: Int, steps: Int, lrPpm: Long): Map[Long, Long] = {
      val feats = corpus.flatMap { case (id, text, _) =>
        text.split(" ").map(t => (id, bucket(t, buckets)))
      }.groupBy(identity).map { case ((id, b), g) => (id, b, g.size.toLong) }.toSeq
      val nd = feats.groupBy(_._1).map { case (id, fs) => id -> fs.map(_._3).sum }
      val lab = corpus.map { case (id, _, l) => id -> (if (l == "en") 1L else 0L) }.toMap
      val m = corpus.size.toLong
      var w = (0L until buckets).map(_ -> 0L).toMap
      for (_ <- 1 to steps) {
        val z = feats.groupBy(_._1).map { case (id, fs) =>
          id -> fs.map { case (_, b, x) => x * w(b) }.sum }
        val p = z.map { case (id, zz) =>
          id -> math.min(1000000L, math.max(0L, 500000L + zz / nd(id) / 4)) }
        val err = p.map { case (id, pp) => id -> (lab(id) * 1000000L - pp) }
        val g = feats.groupBy(_._2).map { case (b, fs) =>
          b -> fs.map { case (id, _, x) => err(id) * x / nd(id) }.sum }
        w = w.map { case (b, wv) =>
          b -> (wv + lrPpm * (g.getOrElse(b, 0L) / m) / 1000000L) }
      }
      w
    }
    val df = corpus.toDF("doc_id", "text", "lang")
    for (steps <- Seq(1, 3)) {
      val got = Curation.hardLrTrain(df, "doc_id", "text", $"lang" === "en",
          buckets = 8, steps = steps)
        .as[(Long, Long)].collect().toMap
      assert(got === reference(8, steps, 500000L), s"steps=$steps")
    }
    // direction: after training, the en-dominant token's bucket weight is
    // positive and the de-dominant token's is negative
    val w3 = Curation.hardLrTrain(df, "doc_id", "text", $"lang" === "en",
      buckets = 8, steps = 3).as[(Long, Long)].collect().toMap
    assert(w3(bucket("aaa", 8)) > 0, s"aaa weight ${w3(bucket("aaa", 8))}")
    assert(w3(bucket("bbb", 8)) < 0, s"bbb weight ${w3(bucket("bbb", 8))}")
  }

  test("bpeTrain: exact agreement with an independent reference, incl. overlap") {
    // "aaaa" forces the greedy-left overlap case: merging (a,a) must give
    // [aa, aa], not [a, aa, a] — leftmost non-overlapping application
    val texts = Seq("aaaa aaaa banana", "banana band aaaa", "band banana")
    def reference(merges: Int): Seq[(Long, String, String, String, Long)] = {
      val freqs = texts.flatMap(_.split(" ")).groupBy(identity)
        .map { case (w, g) => w -> g.size.toLong }
      var states: Map[Seq[String], Long] =
        freqs.map { case (w, f) => w.map(_.toString).toSeq -> f }
          .groupBy(_._1).map { case (s, g) => s -> g.values.sum }
      val rules = scala.collection.mutable.ArrayBuffer[(Long, String, String, String, Long)]()
      for (i <- 1 to merges) {
        val counts = scala.collection.mutable.Map[(String, String), Long]()
        for ((syms, f) <- states; k <- 0 until syms.length - 1)
          counts((syms(k), syms(k + 1))) = counts.getOrElse((syms(k), syms(k + 1)), 0L) + f
        val ((a, b), cnt) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        rules += ((i.toLong, a + b, a, b, cnt))
        def apply(s: Seq[String]): Seq[String] = {
          val out = scala.collection.mutable.ArrayBuffer[String]()
          var k = 0
          while (k < s.length) {
            if (k + 1 < s.length && s(k) == a && s(k + 1) == b) { out += a + b; k += 2 }
            else { out += s(k); k += 1 }
          }
          out.toSeq
        }
        states = states.toSeq.map { case (s, f) => apply(s) -> f }
          .groupBy(_._1).map { case (s, g) => s -> g.map(_._2).sum }
      }
      rules.toSeq
    }
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = Curation.bpeTrain(df, "text", merges = 4)
      .as[(Long, String, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got === reference(4))
    // the corpus has 5 'a'-adjacencies in "aaaa"×3 words... sanity: first
    // merge must be the lexicographically-least max-count pair and each
    // rule's count must be positive
    assert(got.forall(_._5 > 0))
  }

  test("bpeApply: tokenizations match an independent per-word fold of the rules") {
    // same greedy-left overlap pressure as the trainer test: applying
    // (a,a) to 'aaaa' must yield [aa, aa]; later rules see earlier merges
    val texts = Seq("aaaa aaaa banana", "banana band aaaa", "band banana")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val rules = Curation.bpeTrain(df, "text", merges = 3)
      .orderBy(org.apache.spark.sql.functions.col("step")).select("l_sym", "r_sym")
      .as[(String, String)].collect().toSeq
    def applyWord(w: String): Seq[String] = {
      var syms: Seq[String] = w.map(_.toString)
      for ((a, b) <- rules) {
        val out = scala.collection.mutable.ArrayBuffer[String]()
        var k = 0
        while (k < syms.length) {
          if (k + 1 < syms.length && syms(k) == a && syms(k + 1) == b) { out += a + b; k += 2 }
          else { out += syms(k); k += 1 }
        }
        syms = out.toSeq
      }
      syms
    }
    val expected = texts.zipWithIndex.map { case (t, i) =>
      val toks = t.split(" ").map(w => applyWord(w).mkString(" "))
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(toks.mkString("|").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      (i.toLong, toks.map(_.split(" ").length.toLong).sum, md5)
    }.toSet
    val got = Curation.bpeApply(df, "doc_id", "text", rules)
      .as[(Long, Long, String)].collect().toSet
    assert(got === expected)
    // empty rule set: tokenization is the pure char split
    val none = Curation.bpeApply(df, "doc_id", "text", Seq.empty)
      .as[(Long, Long, String)].collect()
    assert(none.find(_._1 == 0L).get._2 == "aaaa aaaa banana".count(_ != ' ').toLong)
  }

  test("dupRegions: a copied run becomes ONE merged region with exact bounds") {
    // doc 1 is the original; doc 2 embeds doc 1's tokens t0..t11 at
    // offset 4. With width 4 / stride 2, dup windows at starts 4,6,8,10,12
    // (ends start+4) merge into one region [4, 16).
    val orig = (0 until 12).map(i => s"t$i").mkString(" ")
    val df = Seq(
      (1L, orig),
      (2L, s"u0 u1 u2 u3 $orig u4 u5 u6")).toDF("doc_id", "text")
    val out = Curation.dupRegions(df, "doc_id", "text", spanTokens = 4, stride = 2)
      .orderBy("doc_id", "region_no")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((2L, 1L, 4L, 16L, 12L, 5L)))
  }

  test("dupRegions: disjoint duplicates stay separate regions; clean doc absent") {
    val df = Seq(
      (1L, "a b c d e f g h"),          // original
      (2L, "a b c d x1 x2 x3 x4 x5 x6 e f g h"), // two separated copies
      (3L, "z1 z2 z3 z4 z5 z6 z7 z8")   // clean
    ).toDF("doc_id", "text")
    val out = Curation.dupRegions(df, "doc_id", "text", spanTokens = 4, stride = 4)
      .orderBy("doc_id", "region_no")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    // doc2 grid windows: [0,4) = "a b c d" (dup), [4,8) x's, [8,12) "x5 x6 e f"
    // (not a doc-1 window), [12,14) "g h" ragged — only the aligned first
    // window duplicates under stride 4
    assert(out == Seq((2L, 1L, 0L, 4L, 4L, 1L)))
    assert(!out.exists(_._1 == 3L))
  }

  test("skipgramPairs: all-kept corpus matches the hand-enumerated window pairs") {
    // thresholdPpm = 1e6 -> keep_ppm = 1e6 for every token -> nothing drops
    val df = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val out = Curation.skipgramPairs(df, "doc_id", "text",
        window = 2, thresholdPpm = 1000000L, minCount = 1L)
      .as[(String, String, Long)].collect().toSet
    val expected = Set(
      ("a", "b"), ("a", "c"), ("b", "a"), ("b", "c"), ("b", "d"),
      ("c", "a"), ("c", "b"), ("c", "d"), ("d", "b"), ("d", "c"))
      .map { case (x, y) => (x, y, 1L) }
    assert(out == expected)
  }

  test("skipgramPairs: agrees with an independent Scala replay incl. subsampling") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val docsSeq = (1L to 6L).map { id =>
      // Zipfy: 'the' floods the corpus so its keep_ppm drops below 1e6
      id -> (0 until 40).map(j =>
        if (j % 2 == 0) "the" else s"w${(id + j) % 7}").mkString(" ")
    }
    val thr = 100000L
    // independent reference
    val toks = docsSeq.flatMap { case (id, t) =>
      t.split(" ").zipWithIndex.map { case (w, p) => (id, p.toLong, w) } }
    val n = toks.size.toLong
    val freq = toks.groupBy(_._3).map { case (w, xs) => w -> xs.size.toLong }
    val keepPpm = freq.map { case (w, f) =>
      val fppm = f * 1000000L / n
      w -> (if (fppm <= thr) 1000000L else thr * 1000000L / fppm)
    }
    val kept = toks.filter { case (id, p, w) =>
      java.lang.Long.parseLong(
        md5hex(s"$id|$p|sg-v1").substring(0, 12), 16) % 1000000L < keepPpm(w)
    }
    val pairs = kept.groupBy(_._1).values.flatMap { ds =>
      val seq = ds.sortBy(_._2).map(_._3).toIndexedSeq
      for {
        i <- seq.indices; j <- seq.indices
        if i != j && math.abs(i - j) <= 2
      } yield (seq(i), seq(j))
    }
    val expected = pairs.groupBy(identity).map { case (k, v) => (k._1, k._2, v.size.toLong) }
      .filter(_._3 >= 2L).toSet
    assert(kept.size < toks.size, "subsampling dropped nothing — fixture too tame")
    val out = Curation.skipgramPairs(docsSeq.toDF("doc_id", "text"),
        "doc_id", "text", window = 2, thresholdPpm = thr, minCount = 2L)
      .as[(String, String, Long)].collect().toSet
    assert(out == expected)
  }

  test("dupRegions: any stride-congruent planted run of >= width+stride-1 is covered") {
    // the guarantee holds when the two occurrences sit at offsets
    // congruent mod stride (here: original at 0, copy at a stride
    // multiple); stride 1 would catch every shift
    val rnd = new scala.util.Random(3)
    val width = 8; val stride = 4
    for (trial <- 1 to 5) {
      val runLen = width + stride - 1 + rnd.nextInt(10)
      val run = (0 until runLen).map(i => s"r${trial}_$i").mkString(" ")
      val fill = (0 until stride * rnd.nextInt(3)).map(i => s"f${trial}_$i")
      val df = Seq(
        (1L, run),
        (2L, (fill :+ run).mkString(" ") + s" tail$trial")).toDF("doc_id", "text")
      val out = Curation.dupRegions(df, "doc_id", "text", width, stride)
        .filter($"doc_id" === 2L)
        .as[(Long, Long, Long, Long, Long, Long)].collect()
      val runStart = fill.size.toLong
      // some region must overlap the planted run's grid-aligned core
      assert(out.exists(r => r._3 < runStart + runLen && r._4 > runStart),
        s"trial $trial: planted run [$runStart, ${runStart + runLen}) uncovered in ${out.toSeq}")
    }
  }

  /** The augmentation draw replayed with MessageDigest — independent of
    * the Spark md5/conv chain. */
  private def augDrawRef(id: Long, salt: String, pos: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$id|$salt|$pos".getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 12), 16) % 1000000L
  }

  test("augmentDropout matches an independent md5 replay; repartition-stable") {
    val corpus = Seq((1L, "a b c d e f g h i j k l"), (2L, "x y z"),
      (7L, "one two three four five six seven"))
    for (parts <- Seq(1, 5)) {
      val got = Curation.augmentDropout(
          corpus.toDF("doc_id", "text").repartition(parts),
          "doc_id", "text", 300000L)
        .as[(Long, String)].collect().toMap
      corpus.foreach { case (id, text) =>
        val kept = text.split(" ").zipWithIndex
          .filter { case (_, p) => augDrawRef(id, "aug-drop", p) >= 300000L }
          .map(_._1)
        assert(got(id) == kept.mkString(" "), s"id=$id parts=$parts")
      }
    }
  }

  test("augmentSwap: non-overlapping pair permutation with fixed unpaired tail") {
    val corpus = Seq((3L, "a b c d e"), (4L, "p q r s"))
    val got = Curation.augmentSwap(corpus.toDF("doc_id", "text"),
        "doc_id", "text", 500000L)
      .as[(Long, String)].collect().toMap
    corpus.foreach { case (id, text) =>
      val w = text.split(" ")
      val out = w.clone()
      for (i <- 0 until w.length / 2
           if augDrawRef(id, "aug-swap", i) < 500000L) {
        out(2 * i) = w(2 * i + 1); out(2 * i + 1) = w(2 * i)
      }
      assert(got(id) == out.mkString(" "), s"id=$id")
      // a permutation: same multiset of tokens, same length
      assert(got(id).split(" ").sorted.toSeq == w.sorted.toSeq)
    }
  }

  test("augmentDropout: a fully-dropped document yields an empty string row") {
    val got = Curation.augmentDropout(Seq((9L, "solo")).toDF("doc_id", "text"),
        "doc_id", "text", 1000000L) // p = 1.0 -> drop everything
      .as[(Long, String)].collect().toMap
    assert(got(9L) == "")
  }
}
