package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def sim(a: Seq[Double], b: Seq[Double]): Option[Double] = {
    val df = Seq((a, b)).toDF("a", "b")
    val r = df.select(cosine_similarity(col("a"), col("b"))).head()
    if (r.isNullAt(0)) None else Some(r.getDouble(0))
  }

  test("orthogonal vectors → 0") {
    assert(math.abs(sim(Seq(1.0, 0.0), Seq(0.0, 1.0)).get) < 1e-15)
  }

  test("parallel vectors → 1") {
    assert(math.abs(sim(Seq(1.0, 2.0, 3.0), Seq(2.0, 4.0, 6.0)).get - 1.0) < 1e-15)
  }

  test("antiparallel → -1") {
    assert(math.abs(sim(Seq(1.0, 0.0), Seq(-2.0, 0.0)).get + 1.0) < 1e-15)
  }

  test("known value matches hand computation") {
    // dot=8, |a|=sqrt(5), |b|=sqrt(13)
    val expect = 8.0 / (math.sqrt(5) * math.sqrt(13))
    assert(math.abs(sim(Seq(1.0, 2.0), Seq(2.0, 3.0)).get - expect) < 1e-15)
  }

  test("zero vector → null") {
    assert(sim(Seq(0.0, 0.0), Seq(1.0, 2.0)).isEmpty)
  }

  test("null input → null") {
    val df = Seq((Some(Seq(1.0)), Option.empty[Seq[Double]])).toDF("a", "b")
    assert(df.select(cosine_similarity(col("a"), col("b"))).head().isNullAt(0))
  }

  test("float arrays widen to double") {
    val df = Seq((Seq(1.0f, 2.0f), Seq(2.0f, 3.0f))).toDF("a", "b")
    val got = df.select(cosine_similarity(col("a"), col("b"))).head().getDouble(0)
    assert(math.abs(got - 8.0 / (math.sqrt(5) * math.sqrt(13))) < 1e-7)
  }

  test("interpreted eval matches codegen") {
    val df = Seq((Seq(0.3, -1.2, 4.5), Seq(2.2, 0.0, -3.3))).toDF("a", "b")
    val viaCodegen = df.select(cosine_similarity(col("a"), col("b"))).head().getDouble(0)
    val e = CosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.Literal.create(Seq(0.3, -1.2, 4.5),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(Seq(2.2, 0.0, -3.3),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)))
    val interpreted = e.eval(null).asInstanceOf[Double]
    assert(viaCodegen === interpreted)
  }

  test("vector_mean equals the posexplode+avg formulation") {
    import graft.core.Tables
    val e = Tables.embeddings(spark, sf)
    val viaAgg = e.groupBy(col("label"))
      .agg(vector_mean(col("embedding")).as("c"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val viaExplode = e
      .select(col("label"), posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy(col("label"), col("i")).agg(avg(col("x").cast("double")).as("c"))
      .collect().groupBy(_.getInt(0))
      .map { case (l, rows) =>
        l -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
      }
    assert(viaAgg.keySet == viaExplode.keySet)
    viaAgg.foreach { case (l, m) =>
      m.zip(viaExplode(l)).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    }
  }

  test("vector_mean: nulls skipped, all-null group → null") {
    val df = Seq(
      (1, Some(Seq(1.0f, 2.0f))), (1, Some(Seq(3.0f, 4.0f))), (1, None),
      (2, None))
      .toDF("k", "v")
    val got = df.groupBy(col("k")).agg(vector_mean(col("v")).as("m"))
      .collect().map(r => r.getInt(0) -> (if (r.isNullAt(1)) null else r.getSeq[Double](1))).toMap
    assert(got(1) == Seq(2.0, 3.0))
    assert(got(2) == null)
  }

  test("vec_dot and vec_norm") {
    val df = Seq((Seq(3.0, 4.0), Seq(1.0, 1.0))).toDF("a", "b")
    val r = df.select(vec_dot(col("a"), col("b")), vec_norm(col("a"))).head()
    assert(r.getDouble(0) === 7.0)
    assert(r.getDouble(1) === 5.0)
  }
}

class ExtractJsonObjectsSpec extends SparkSpec {
  import ExtractJsonObjects.scan

  test("single object") {
    assert(scan("""{"a": 1}""") == Seq("""{"a": 1}"""))
  }

  test("object embedded in prose") {
    assert(scan("""Sure! Here is the JSON: {"a": 1} hope it helps""") == Seq("""{"a": 1}"""))
  }

  test("multiple objects") {
    assert(scan("""{"a":1} and {"b":2}""") == Seq("""{"a":1}""", """{"b":2}"""))
  }

  test("nested objects emitted once") {
    assert(scan("""{"a": {"b": [1,2]}}""") == Seq("""{"a": {"b": [1,2]}}"""))
  }

  test("top-level array is one snippet") {
    assert(scan("""[{"a":1},{"b":2}]""") == Seq("""[{"a":1},{"b":2}]"""))
  }

  test("braces inside string literals ignored") {
    assert(scan("""{"a": "}{"}""") == Seq("""{"a": "}{"}"""))
  }

  test("escaped quotes inside strings") {
    assert(scan("""{"a": "x\"}y"}""") == Seq("""{"a": "x\"}y"}"""))
  }

  test("unbalanced tail dropped, never throws") {
    assert(scan("""{"a": 1""") == Seq.empty)
    assert(scan("") == Seq.empty)
    assert(scan("no json here") == Seq.empty)
  }

  test("column API + from_json round trip") {
    import spark.implicits._
    val df = Seq("noise {\"time_start\": \"09:15\", \"time_end\": \"10:00\"} trailing").toDF("raw")
    val got = df.select(explode(extract_json_objects(col("raw"))).as("j"))
      .select(get_json_object(col("j"), "$.time_start").as("ts"))
      .head().getString(0)
    assert(got == "09:15")
  }
}

class PolarsOffsetSpec extends SparkSpec {
  import PolarsOffset._

  test("simple units") {
    assert(parse("15d") == Offset(0, 15L * 86400 * 1000000L))
    assert(parse("-15d") == Offset(0, -15L * 86400 * 1000000L))
    assert(parse("3mo") == Offset(3, 0))
    assert(parse("-3mo") == Offset(-3, 0))
    assert(parse("1y") == Offset(12, 0))
    assert(parse("2q") == Offset(6, 0))
    assert(parse("1w") == Offset(0, 7L * 86400 * 1000000L))
  }

  test("compound offsets") {
    assert(parse("1h30m") == Offset(0, (3600L + 1800L) * 1000000L))
    assert(parse("-1mo15d") == Offset(-1, -15L * 86400 * 1000000L))
    assert(parse("1m30s") == Offset(0, 90L * 1000000L))
  }

  test("sub-second units") {
    assert(parse("5ms") == Offset(0, 5000L))
    assert(parse("5us") == Offset(0, 5L))
    assert(parse("5000ns") == Offset(0, 5L))
  }

  test("malformed rejected") {
    assertThrows[IllegalArgumentException](parse(""))
    assertThrows[IllegalArgumentException](parse("15"))
    assertThrows[IllegalArgumentException](parse("d15"))
    assertThrows[IllegalArgumentException](parse("15x"))
    assertThrows[IllegalArgumentException](parse("15d junk"))
  }

  test("calendar month clamping matches Spark interval semantics") {
    import spark.implicits._
    val df = Seq("2024-03-31 12:00:00").toDF("s")
      .select(to_timestamp(col("s")).as("ts"))
    val got = df.select(offset_by(col("ts"), "-1mo").cast("string")).head().getString(0)
    assert(got == "2024-02-29 12:00:00") // leap-year clamp
  }
}

class TimeOfDaySpec extends SparkSpec {
  import spark.implicits._

  test("seconds_of_day and hhmm_of_seconds round trip") {
    val df = Seq("09:15", "00:00", "23:59").toDF("hhmm")
    val rows = df.select(col("hhmm"), seconds_of_day(col("hhmm")).as("s"))
      .select(col("hhmm"), col("s"), hhmm_of_seconds(col("s")).as("back"))
      .collect()
    rows.foreach { r =>
      assert(r.getString(0) == r.getString(2))
    }
    assert(rows.map(_.getInt(1)).toSeq == Seq(9 * 3600 + 15 * 60, 0, 23 * 3600 + 59 * 60))
  }

  test("lexicographic HH:mm ordering matches numeric ordering") {
    val times = Seq("00:00", "09:15", "10:00", "23:59")
    assert(times.sorted == times.sortBy(t => t.take(2).toInt * 60 + t.drop(3).toInt))
  }
}

class TextHashSpec extends SparkSpec {
  import spark.implicits._

  test("simhash: identical token arrays → identical hash") {
    val df = Seq(Seq("a", "b", "c"), Seq("a", "b", "c")).toDF("t")
    val hs = df.select(simhash64(col("t"))).collect().map(_.getLong(0))
    assert(hs(0) == hs(1))
  }

  test("simhash: similar docs have small hamming distance vs dissimilar") {
    val base = (1 to 50).map(i => s"tok$i")
    val near = base.updated(3, "changed")
    val far = (1 to 50).map(i => s"other$i")
    val df = Seq(base, near, far).toDF("t")
    val hs = df.select(simhash64(col("t"))).collect().map(_.getLong(0))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hs(0), hs(1)) < ham(hs(0), hs(2)))
  }

  test("winnow fingerprint: copy shares most of its fingerprint") {
    val a = "the quick brown fox jumps over the lazy dog and keeps running far away"
    val b = a + " with an extra tail appended here"
    val c = "completely different content with no overlap whatsoever in any region"
    val df = Seq(a, b, c).toDF("t")
    val fps = df.select(winnow_fingerprint(col("t"))).collect()
      .map(_.getSeq[Long](0).toSet)
    val overlapNear = fps(0).intersect(fps(1)).size.toDouble / fps(0).size
    val overlapFar = fps(0).intersect(fps(2)).size.toDouble / fps(0).size
    assert(overlapNear > 0.5)
    assert(overlapFar < 0.2)
  }

  test("minhash_signature: one-pass minima match the naive per-salt form") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, StringType}
    val toks = Seq("the", "quick", "brown", "fox", "jumps", "over")
    val e = MinHashSignature(
      Literal.create(toks, ArrayType(StringType)), nSig = 4, shingleSize = 3)
    val got = e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq
    // naive recomputation
    def mix(h: Long, r: Int): Long = {
      var z = h + 0x9e3779b97f4a7c15L * (r + 1)
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val shingleHashes = toks.sliding(3).map(s => Fnv1a64.hashString(s.mkString(" "))).toSeq
    val expect = (0 until 4).map(r => shingleHashes.map(mix(_, r)).min)
    assert(got == expect)
  }

  test("minhash_signature: short docs → empty; identical docs → identical sig") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, StringType}
    val short = MinHashSignature(
      Literal.create(Seq("a", "b"), ArrayType(StringType)), 4, 3)
    assert(short.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .numElements() == 0)
  }

  test("word_shingles ≡ the declarative transform/concat_ws spelling (incl. null tokens)") {
    // the expression replaced this exact HOF formulation in Dedup.shingles
    // for speed; equality (including concat_ws's null-skipping and the
    // short-doc empty array) is the contract
    val df = Seq(
      Tuple1(Seq("the", "quick", "brown", "fox", "jumps")),
      Tuple1(Seq("a", "b")),                       // shorter than k
      Tuple1(Seq("x", null, "y", "z", "w", "v")),  // null token
      Tuple1(Seq.empty[String])
    ).toDF("tok")
    for (k <- Seq(1, 3, 5)) {
      val hof = when(size(col("tok")) >= k,
        transform(sequence(lit(0), size(col("tok")) - k),
          i => concat_ws(" ", (1 to k).map(j => element_at(col("tok"), i + j)): _*)))
        .otherwise(array())
      val rows = df.select(word_shingles(col("tok"), k).as("fast"), hof.as("slow"))
        .collect()
      rows.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1), s"k=$k"))
    }
  }

  test("char_shingles ≡ the declarative substring HOF spelling (incl. multi-byte)") {
    // the expression replaced this exact HOF formulation in q189's trigram
    // stream for speed; equality (code-point character semantics, the
    // short-string empty array) is the contract
    val df = Seq(
      "the quick brown fox",
      "ab",                    // shorter than k=3
      "",                      // empty
      "héllo wörld",           // 2-byte UTF-8 sequences
      "日本語のテキスト",        // 3-byte sequences
      "a😀b😀c",               // 4-byte (supplementary) code points
      "xyz"                    // exactly k
    ).toDF("text")
    for (k <- Seq(1, 3, 5)) {
      val rows = df.select(char_shingles(col("text"), k).as("fast"),
        when(length(col("text")) >= k,
          transform(sequence(lit(1), length(col("text")) - (k - 1)),
            i => col("text").substr(i, lit(k))))
          .otherwise(array().cast("array<string>")).as("slow")).collect()
      rows.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1), s"k=$k"))
    }
  }

  test("char_gram_clip ≡ the per-gram explode/clip spelling (incl. multi-byte)") {
    // the kernel replaced the (pair, n, gram) row stream in Eval.chrF:
    // match_n must equal Σ_gram min(c_cnt, r_cnt) over char k-grams of
    // the two sides, totals = chars − k + 1 (floored at 0), code-point
    // character semantics throughout
    val df = Seq(
      ("the quick brown fox", "the quick brown dog"),
      ("aaab", "aabb"),          // clipped duplicates: min counts matter
      ("ab", "abc"),             // candidate shorter than k=3
      ("", "xyz"),               // empty candidate
      ("héllo wörld", "héllo wörld"), // 2-byte UTF-8
      ("日本語のテキスト", "日本語テキスト"), // 3-byte
      ("a😀b😀c", "b😀a")        // 4-byte supplementary
    ).toDF("c", "r")
    for (k <- Seq(1, 2, 3)) {
      val rows = df.select(char_gram_clip(col("c"), col("r"), k).as("fast"),
          char_shingles(col("c"), k).as("cg"), char_shingles(col("r"), k).as("rg"))
        .collect()
      rows.foreach { row =>
        val s = row.getStruct(0)
        val cg = row.getSeq[String](1)
        val rg = row.getSeq[String](2)
        val rc = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
        rg.foreach(g => rc(g) += 1)
        val cc = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
        cg.foreach(g => cc(g) += 1)
        val expectMatch = cc.map { case (g, n) => math.min(n, rc(g)) }.sum.toLong
        assert(s.getLong(0) == expectMatch, s"match k=$k row=$row")
        assert(s.getLong(1) == cg.size.toLong && s.getLong(2) == rg.size.toLong,
          s"totals k=$k row=$row")
      }
    }
    // null propagation
    val n = Seq((Option("ab"), Option.empty[String])).toDF("c", "r")
      .select(char_gram_clip(col("c"), col("r"), 1)).head()
    assert(n.isNullAt(0))
  }

  test("word_gram_clip ≡ the word_shingles explode/clip spelling") {
    val df = Seq(
      ("the cat sat on the mat", "the cat lay on the mat"),
      ("a a a b", "a a b b"),       // duplicate windows clip by min
      ("a b", "a b c"),             // candidate shorter than k=3
      ("", "x y z"),                // empty candidate (split -> [""])
      ("x y", "x y")                // exact match
    ).toDF("c", "r").select(split(col("c"), " ").as("c"),
      split(col("r"), " ").as("r"))
    for (k <- Seq(1, 2, 3)) {
      val rows = df.select(word_gram_clip(col("c"), col("r"), k).as("fast"),
          word_shingles(col("c"), k).as("cg"), word_shingles(col("r"), k).as("rg"))
        .collect()
      rows.foreach { row =>
        val s = row.getStruct(0)
        val cg = row.getSeq[String](1)
        val rg = row.getSeq[String](2)
        val rc = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
        rg.foreach(g => rc(g) += 1)
        val cc = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
        cg.foreach(g => cc(g) += 1)
        val expectMatch = cc.map { case (g, n) => math.min(n, rc(g)) }.sum.toLong
        assert(s.getLong(0) == expectMatch, s"match k=$k row=$row")
        assert(s.getLong(1) == cg.size.toLong && s.getLong(2) == rg.size.toLong,
          s"totals k=$k row=$row")
      }
    }
  }

  test("fnv1a64 is pinned (golden values)") {
    // golden values computed from the FNV-1a reference parameters
    assert(Fnv1a64.hashString("") == 0xcbf29ce484222325L)
    assert(Fnv1a64.hashString("a") == 0xaf63dc4c8601ec8cL)
  }

  test("winnow: short-doc minimum uses unsigned ordering (containment property)") {
    // Find a short doc whose gram hashes include one with the top bit set:
    // the signed min and unsigned min then differ, and only unsigned ordering
    // keeps the short doc's fingerprint a subset of a containing doc's.
    val k = 8; val w = 16
    val short = (0 until 500).map(i => s"x${i}abcdefg").find { s =>
      val grams = (0 to s.length - k).map(j => Fnv1a64.hashString(s.substring(j, j + k)))
      grams.size <= w && grams.exists(_ < 0) && grams.exists(_ > 0) &&
        grams.min != grams.reduce((a, b) =>
          if (java.lang.Long.compareUnsigned(a, b) < 0) a else b)
    }.get
    val shortFp = WinnowFingerprint.fingerprint(short, k, w)
    assert(shortFp.size == 1)
    // the short-doc branch must pick the UNSIGNED min of its gram hashes —
    // with signed ordering this failed whenever a hash had the top bit set
    val grams = (0 to short.length - k).map(j => Fnv1a64.hashString(short.substring(j, j + k)))
    val unsignedMin = grams.reduce((a, b) =>
      if (java.lang.Long.compareUnsigned(a, b) < 0) a else b)
    assert(shortFp.head == unsignedMin)
  }

  test("custom hash expressions codegen (no CodegenFallback) and match eval") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types._
    import org.apache.spark.unsafe.types.UTF8String
    val toks = BoundReference(0, ArrayType(StringType), nullable = true)
    val txt = BoundReference(1, StringType, nullable = true)
    val vec = BoundReference(2, ArrayType(FloatType), nullable = true)
    val mh = MinHashSignature(toks, 4, 3)
    val sh = SimHash64(toks)
    val md = SaltedMd5Min(toks, "s1", 3)
    val wf = WinnowFingerprint(txt, 8, 16)
    val hp = HyperplaneLsh(vec, 2, 8, 42L)
    val ws = WordShingles(toks, 3)
    val exprs = Seq(mh, sh, md, wf, hp, ws)
    // generate compiled projection — throws on broken doGenCode
    val proj = GenerateUnsafeProjection.generate(exprs)
    val row = InternalRow(
      ArrayData.toArrayData(Array("the", "quick", "brown", "fox")
        .map(UTF8String.fromString)),
      UTF8String.fromString("abcdefghijklmnopqrstuvwxyz0123456789"),
      ArrayData.toArrayData(Array(0.5f, -0.25f)))
    val out = proj(row)
    assert(out.getArray(0).toLongArray.toSeq ==
      mh.eval(row).asInstanceOf[ArrayData].toLongArray.toSeq)
    assert(out.getLong(1) == sh.eval(row))
    assert(out.getUTF8String(2) == md.eval(row))
    assert(out.getArray(3).toLongArray.toSeq ==
      wf.eval(row).asInstanceOf[ArrayData].toLongArray.toSeq)
    assert(out.getLong(4) == hp.eval(row))
    assert(out.getArray(5).toSeq[UTF8String](StringType) ==
      ws.eval(row).asInstanceOf[ArrayData].toSeq[UTF8String](StringType))
    // null result path (too few tokens for a shingle) under codegen
    val rowShort = InternalRow(
      ArrayData.toArrayData(Array("a").map(UTF8String.fromString)),
      UTF8String.fromString("ab"), ArrayData.toArrayData(Array(0.1f, 0.2f)))
    val outShort = proj(rowShort)
    assert(outShort.isNullAt(2)) // SaltedMd5Min null contract survives codegen
    assert(outShort.getArray(0).numElements() == 0)
  }

  test("SQL registration paths expose the identical function list") {
    // both GraftExtensions and registerAll iterate graft.functions.sqlFunctions;
    // verify registerAll actually resolves each name in SQL
    graft.functions.registerAll(spark)
    import spark.implicits._
    Seq((Seq(1.0f, 0.0f), Seq(1.0f, 0.0f), Seq("a", "b", "c", "d")))
      .toDF("v1", "v2", "toks").createOrReplaceTempView("regcheck")
    val row = spark.sql(
      """SELECT cosine_similarity(v1, v2) cs, vec_dot(v1, v2) d,
        |       simhash64(toks) sh, minhash_signature(toks, 4, 3) mh,
        |       winnow_fingerprint('abcdefghijklmnop') wf,
        |       salted_md5_min(toks, 's1', 3) sm,
        |       hyperplane_lsh(v1, 2, 8, 42) hp,
        |       extract_json_objects('x {"a":1} y') ej
        |FROM regcheck""".stripMargin).head()
    assert(row.getDouble(0) == 1.0)
    val agg = spark.sql("SELECT vector_mean(v1) FROM regcheck").head()
    assert(agg.getSeq[Double](0).nonEmpty)
  }
}
