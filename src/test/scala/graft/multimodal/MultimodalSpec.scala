package graft.multimodal

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val media =
    Multimodal.syntheticMediaFromDocs(Tables.documents(spark, sf))

  test("resize plan: aspect preserved, box respected, never upscales") {
    val plan = Multimodal.resizePlan(media, maxW = 224, maxH = 224).collect()
    assert(plan.nonEmpty)
    plan.foreach { r =>
      val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      val (ow, oh) = (r.getAs[Long]("out_w"), r.getAs[Long]("out_h"))
      assert(ow <= 224 && oh <= 224, s"box violated: $ow x $oh")
      assert(ow <= w && oh <= h, s"upscaled: $w x $h -> $ow x $oh")
      // aspect ratio preserved within the 1-pixel floor quantization
      val scale = math.min(math.min(224.0 / w, 224.0 / h), 1.0)
      assert(ow == math.floor(w * scale).toLong)
      assert(oh == math.floor(h * scale).toLong)
    }
    // small images pass through untouched
    val small = plan.filter(r => r.getAs[Int]("width") <= 224 && r.getAs[Int]("height") <= 224)
    small.foreach { r =>
      assert(r.getAs[Long]("out_w") == r.getAs[Int]("width").toLong)
      assert(r.getAs[Long]("out_h") == r.getAs[Int]("height").toLong)
    }
  }

  test("synthetic media table has the typed schema and binary payloads") {
    assert(media.schema.fieldNames.toSet ==
      Multimodal.mediaSchema.fieldNames.toSet)
    val kinds = media.select("kind").distinct()
      .collect().map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
    val row = media.filter(col("kind") === "image").head()
    assert(row.getAs[Array[Byte]]("bytes").nonEmpty)
    assert(row.getAs[Int]("width") > 0)
  }

  test("feature extraction: fixed dim, deterministic across partitionings") {
    val codec = new Multimodal.StubCodec(32)
    val a = Multimodal.extractFeatures(media, codec).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    val b = Multimodal.extractFeatures(media.repartition(13), codec).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    assert(a.size == media.count())
    assert(a.values.forall(_.length == 32))
    assert(a == b)
  }

  test("feature extraction stays inside the Dataset plan (no RDD scan barrier)") {
    val out = Multimodal.extractFeatures(media, new Multimodal.StubCodec(8))
    val physical = out.queryExecution.executedPlan.toString
    assert(!physical.contains("ScanExistingRDD"),
      s"createDataFrame barrier found in plan:\n$physical")
    // the decode node sits inside a serialize/deserialize pair, not behind
    // an opaque RDD rescan of the input
    assert(physical.contains("MapPartitions"))
  }

  test("ImageHeaderCodec reads real image headers; degrades on junk bytes") {
    val codec = new Multimodal.ImageHeaderCodec
    for (fmt <- Seq("png", "gif", "bmp")) {
      val img = new java.awt.image.BufferedImage(17, 9,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val buf = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, buf), s"no $fmt writer")
      val bytes = buf.toByteArray
      assert(codec.features("image", fmt, bytes).toSeq ==
        Seq(17f, 9f, bytes.length.toFloat), s"format $fmt")
    }
    // poison blobs must degrade, not throw — a bad row can't kill the stage
    assert(codec.features("image", "png", Array[Byte](1, 2, 3)).toSeq ==
      Seq(-1f, -1f, 3f))
    assert(codec.features("audio", "wav", Array[Byte](1)).toSeq == Seq(-1f, -1f, 1f))
  }

  test("committed media fixture decodes to its recorded metadata") {
    val root = graft.core.Fixtures.resolve("media", "GRAFT_MEDIA_FIXTURES")
    val fixture = spark.read.parquet(s"$root/images.parquet")
    val decoded = Multimodal.extractFeatures(fixture, new Multimodal.ImageHeaderCodec)
      .select(col("media_id"), element_at(col("features"), 1).cast("int").as("w"),
        element_at(col("features"), 2).cast("int").as("h"))
    val mismatches = decoded.join(fixture.select(col("media_id"), col("width"), col("height")), "media_id")
      .filter(col("w") =!= col("width") || col("h") =!= col("height"))
    assert(fixture.count() == 48)
    assert(mismatches.isEmpty)
  }

  test("null ImageInputStream degrades instead of NPE-ing (SPI-less environment)") {
    // createImageInputStream is documented to return null when no stream
    // SPI is registered / the cache dir is unusable — the codec must treat
    // that like any undecodable blob, not throw from getImageReaders(null)
    val codec = new Multimodal.ImageHeaderCodec {
      override protected def openStream(bytes: Array[Byte]): javax.imageio.stream.ImageInputStream = null
    }
    assert(codec.features("image", "png", Array[Byte](1, 2, 3, 4)).toSeq ==
      Seq(-1f, -1f, 4f))
  }

  test("unknown plan stats fall back to input partitioning, not the 10000 cap") {
    // LogicalRDD reports spark.sql.defaultSizeInBytes (Long.MaxValue) when
    // no stats are attached (projections scale it by a width ratio, so it
    // stays astronomically large but inexact) — the old size heuristic read
    // that sentinel as a real size and scheduled 10000 near-empty tasks
    val rows = media.limit(6).collect()
    val noStats = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 3), media.schema)
    val est = noStats.queryExecution.optimizedPlan.stats.sizeInBytes
    assume(est > BigInt(1L << 50), "precondition: stats are the unknown sentinel")
    val out = Multimodal.extractFeatures(noStats, new Multimodal.StubCodec(8))
    assert(out.rdd.getNumPartitions == 3)
    assert(out.count() == 6)
  }

  test("ImageDecode: PNG round-trip through every filter type, pixel-exact") {
    val w = 23; val h = 11
    val rgb = Array.tabulate(3 * w * h)(i => ((i * 37 + 5) % 256).toByte)
    for (filter <- 0 to 4) {
      val bytes = ImageDecode.encodePng(w, h, rgb, _ => filter)
      val d = ImageDecode.decode(bytes)
        .getOrElse(fail(s"decode failed for filter $filter"))
      assert(d.width == w && d.height == h && d.channels == 3)
      assert(d.pixels.sameElements(rgb), s"pixel mismatch for filter $filter")
    }
    // mixed filters per row (the realistic adaptive-encoder shape)
    val mixed = ImageDecode.encodePng(w, h, rgb, y => y % 5)
    assert(ImageDecode.decode(mixed).get.pixels.sameElements(rgb))
  }

  test("ImageDecode: decodes ImageIO-written PNG and BMP pixel-exactly") {
    // independent writer: the JDK's own encoders produce the bytes, our
    // decoder must reproduce getRGB exactly (catches BGR swaps, row order,
    // padding, filter bugs)
    val w = 19; val h = 13
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, (x * 31 + y * 17 + 77) & 0xffffff)
    for (fmt <- Seq("png", "bmp")) {
      val buf = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, buf), s"no $fmt writer")
      val d = ImageDecode.decode(buf.toByteArray)
        .getOrElse(fail(s"decode failed for $fmt"))
      assert(d.width == w && d.height == h && d.channels == 3)
      for (x <- 0 until w; y <- 0 until h) {
        val v = img.getRGB(x, y)
        val o = 3 * (y * w + x)
        assert((d.pixels(o) & 0xff) == ((v >> 16) & 0xff), s"$fmt R at ($x,$y)")
        assert((d.pixels(o + 1) & 0xff) == ((v >> 8) & 0xff), s"$fmt G at ($x,$y)")
        assert((d.pixels(o + 2) & 0xff) == (v & 0xff), s"$fmt B at ($x,$y)")
      }
    }
  }

  test("ImageDecode: PPM round-trip, comment handling, gray PGM") {
    val w = 7; val h = 5
    val rgb = Array.tabulate(3 * w * h)(i => ((i * 13) % 256).toByte)
    val d = ImageDecode.decode(ImageDecode.encodePpm(w, h, rgb)).get
    assert(d.width == w && d.height == h && d.channels == 3)
    assert(d.pixels.sameElements(rgb))
    // header comments are legal PNM
    val commented = ("P6\n# a comment line\n7 5\n# another\n255\n").getBytes("US-ASCII") ++ rgb
    assert(ImageDecode.decode(commented).get.pixels.sameElements(rgb))
    val gray = Array.tabulate(w * h)(i => (i % 251).toByte)
    val pgm = s"P5\n$w $h\n255\n".getBytes("US-ASCII") ++ gray
    val g = ImageDecode.decode(pgm).get
    assert(g.channels == 1 && g.pixels.sameElements(gray))
  }

  test("ImageDecode: truncated/corrupt inputs degrade to None, never throw") {
    val good = ImageDecode.encodePng(9, 9, Array.fill(3 * 81)(7.toByte))
    for (cut <- Seq(0, 4, 10, 20, good.length / 2, good.length - 3))
      assert(ImageDecode.decode(good.take(cut)).isEmpty
        || cut == good.length, s"truncation at $cut must not decode")
    assert(ImageDecode.decode(Array[Byte](0x42, 0x4d, 1, 2, 3)).isEmpty) // bad BMP
    assert(ImageDecode.decode("P6\n0 0\n255\n".getBytes("US-ASCII")).isEmpty)
    assert(ImageDecode.decode(Array.fill(100)(0x55.toByte)).isEmpty)
  }

  test("PixelCodec: channel sums match a driver-side recompute on the fixture") {
    val root = graft.core.Fixtures.resolve("media", "GRAFT_MEDIA_FIXTURES")
    val rows = spark.read.parquet(s"$root/images.parquet")
      .filter(col("format").isin("png", "bmp")).collect()
    assert(rows.nonEmpty)
    val codec = new Multimodal.PixelCodec
    rows.foreach { r =>
      val i = r.getAs[Long]("media_id")
      val w = r.getAs[Int]("width"); val h = r.getAs[Int]("height")
      val f = codec.features("image", r.getAs[String]("format"),
        r.getAs[Array[Byte]]("bytes"))
      assert(f(0) == w.toFloat && f(1) == h.toFloat && f(2) == 3f)
      var rs = 0L; var gs = 0L; var bs = 0L
      for (x <- 0 until w; y <- 0 until h) {
        val v = (x * 31 + y * 17 + i * 131) & 0xffffff
        rs += (v >> 16) & 0xff; gs += (v >> 8) & 0xff; bs += v & 0xff
      }
      assert(f(3) == rs.toFloat && f(4) == gs.toFloat && f(5) == bs.toFloat,
        s"channel sums for media $i (${r.getAs[String]("format")})")
    }
  }

  test("resizeArea: hand-computed box means, clamping, surjective mapping") {
    // 4x2 RGB image downscaled to 2x1: each output cell is the truncating
    // mean of a 2x2 box — hand-computed goldens
    val px = Array.tabulate(4 * 2 * 3)(i => i.toByte) // values 0..23
    val d = ImageDecode.Decoded(4, 2, 3, px)
    val r = ImageDecode.resizeArea(d, 2, 1)
    assert(r.width == 2 && r.height == 1 && r.channels == 3)
    // cell 0 gathers (x,y) in {0,1}x{0,1}; cell 1 gathers {2,3}x{0,1}
    def mean(vals: Seq[Int]) = vals.sum / vals.size
    for (ch <- 0 until 3) {
      val left = mean(for (x <- 0 to 1; y <- 0 to 1) yield px((y * 4 + x) * 3 + ch) & 0xff)
      val right = mean(for (x <- 2 to 3; y <- 0 to 1) yield px((y * 4 + x) * 3 + ch) & 0xff)
      assert((r.pixels(ch) & 0xff) == left, s"left cell ch$ch")
      assert((r.pixels(3 + ch) & 0xff) == right, s"right cell ch$ch")
    }
    // clamping: a 3x2 image "resized" to 8x8 stays 3x2 (never upscales)
    val small = ImageDecode.Decoded(3, 2, 3, Array.fill(18)(5.toByte))
    val c = ImageDecode.resizeArea(small, 8, 8)
    assert(c.width == 3 && c.height == 2)
    assert(c.pixels.sameElements(small.pixels))
    // surjectivity at awkward ratios: 7x5 -> 3x2 leaves no empty cell
    val odd = ImageDecode.resizeArea(
      ImageDecode.Decoded(7, 5, 1, Array.fill(35)(9.toByte)), 3, 2)
    assert(odd.width == 3 && odd.height == 2)
    assert(odd.pixels.forall(p => (p & 0xff) == 9))
  }

  test("WAV round-trip; encoder bytes verified by the JDK's own reader") {
    val samples = Array.tabulate(480)(i => ((i * 997) % 65536 - 32768).toShort)
    for (ch <- Seq(1, 2)) {
      val bytes = AudioDecode.encodeWav(16000, ch, samples)
      val d = AudioDecode.decodeWav(bytes).getOrElse(fail(s"decode failed ch=$ch"))
      assert(d.sampleRate == 16000 && d.channels == ch)
      assert(d.samples.sameElements(samples))
      assert(d.nFrames == 480 / ch)
      assert(d.durationMs == (480 / ch).toLong * 1000 / 16000)
      // independent reference: javax.sound parses the same bytes
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      assert(fmt.getSampleRate == 16000f && fmt.getChannels == ch
        && fmt.getSampleSizeInBits == 16)
      val raw = ais.readAllBytes()
      assert(raw.length == samples.length * 2)
      // javax delivers little-endian PCM16 here; compare sample-exact
      for (i <- samples.indices) {
        val v = ((raw(2 * i) & 0xff) | (raw(2 * i + 1) << 8)).toShort
        assert(v == samples(i), s"sample $i (ch=$ch)")
      }
    }
  }

  test("transcodeToPpm: canonical bytes; gray and RGBA normalize; junk drops") {
    import spark.implicits._
    val (w, h) = (4, 3)
    val rgb = Array.tabulate(3 * w * h)(i => ((i * 29 + 7) % 256).toByte)
    val gray = Array.tabulate(w * h)(i => ((i * 41 + 3) % 256).toByte)
    val pgm = s"P5\n$w $h\n255\n".getBytes("US-ASCII") ++ gray
    // RGBA via the JDK's own writer (color type 6 → decodePng channels=4)
    val argb = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_ARGB)
    for (y <- 0 until h; x <- 0 until w)
      argb.setRGB(x, y, (0xaa << 24) | ((x * 50) << 16) | ((y * 70) << 8) | (x + y))
    val rgbaBaos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(argb, "png", rgbaBaos)
    val media = Seq(
      (1L, "image", ImageDecode.encodePng(w, h, rgb, _ => 3)), // avg filter
      (2L, "image", "not an image".getBytes),
      (3L, "image", pgm),
      (4L, "image", rgbaBaos.toByteArray)
    ).toDF("media_id", "kind", "bytes")
    val out = Multimodal.transcodeToPpm(media).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("bytes")).toMap
    assert(out.keySet == Set(1L, 3L, 4L)) // only junk drops
    // byte identity with the canonical encoder over the same raster
    assert(out(1L).toSeq == ImageDecode.encodePpm(w, h, rgb).toSeq)
    // gray expands by replication
    assert(out(3L).toSeq == ImageDecode.encodePpm(w, h,
      Array.tabulate(3 * w * h)(i => gray(i / 3))).toSeq)
    // RGBA keeps the RGB planes, drops alpha
    val expectedRgba = Array.tabulate(3 * w * h) { i =>
      val p = i / 3; val x = p % w; val y = p / w
      (i % 3 match {
        case 0 => x * 50
        case 1 => y * 70
        case 2 => x + y
      }).toByte
    }
    assert(out(4L).toSeq == ImageDecode.encodePpm(w, h, expectedRgba).toSeq)
  }

  test("pixelFingerprint: identical rasters match across formats and filter strategies") {
    import spark.implicits._
    val (w, h) = (3, 2)
    val rgb = Array.tabulate(3 * w * h)(i => ((i * 37 + 11) % 256).toByte)
    val other = rgb.clone(); other(5) = (other(5) + 1).toByte
    val media = Seq(
      (1L, "image", ImageDecode.encodePng(w, h, rgb)), // filter 0
      (2L, "image", ImageDecode.encodePng(w, h, rgb, _ => 2)), // up-filter: different bytes
      (3L, "image", ImageDecode.encodePpm(w, h, rgb)), // different format
      (4L, "image", ImageDecode.encodePng(w, h, other)), // one pixel off
      (5L, "image", "junk".getBytes)
    ).toDF("media_id", "kind", "bytes")
    // encodings 1 and 2 really are byte-different containers
    val blobs = media.collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("bytes")).toMap
    assert(!blobs(1L).sameElements(blobs(2L)))
    val fp = Multimodal.pixelFingerprint(media).collect()
      .map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(fp(1L) != null && fp(1L) == fp(2L) && fp(2L) == fp(3L))
    assert(fp(4L) != fp(1L))
    assert(fp(5L) == null) // undecodable: NULL, never grouped
  }

  test("mixdown truncates toward zero; decimation keeps even frames and halves the rate") {
    import AudioDecode._
    // stereo frames: (-3,0) → -1 (toward-zero, NOT floor's -2), (5,2) → 3,
    // (-7,-2) → -4, (1,0) → 0, (9,9) → 9
    val a = DecodedAudio(8000, 2,
      Array[Short](-3, 0, 5, 2, -7, -2, 1, 0, 9, 9))
    val mono = mixdownMono(a)
    assert(mono.channels == 1 && mono.sampleRate == 8000)
    assert(mono.samples.toSeq == Seq[Short](-1, 3, -4, 0, 9))
    // mono passes through untouched (same instance semantics not required,
    // same values are)
    assert(mixdownMono(mono).samples.toSeq == mono.samples.toSeq)
    val dec = decimate(mono, 2)
    assert(dec.sampleRate == 4000 && dec.channels == 1)
    assert(dec.samples.toSeq == Seq[Short](-1, -4, 9)) // frames 0,2,4 (ceil 5/2)
    // stereo decimation keeps whole frames
    val dec2 = decimate(a, 2)
    assert(dec2.channels == 2 && dec2.samples.toSeq == Seq[Short](-3, 0, -7, -2, 9, 9))
    intercept[IllegalArgumentException] { decimate(mono, 3) } // 8000 % 3 != 0
  }

  test("FIR low-pass: DC identity, exact Nyquist zero, toward-zero rounding, per-channel") {
    import AudioDecode._
    // THEOREM: taps sum to the scale → a constant (DC) signal is the
    // identity away from the zero-padded edges
    val dc = firLowpass(DecodedAudio(8000, 1, Array.fill[Short](9)(1000)))
    assert(dc.samples.slice(2, 7).forall(_ == 1000))
    // THEOREM: 1-4+6-4+1 = 0 → the Nyquist-rate alternating signal is
    // annihilated exactly (interior) — the anti-alias property
    val nyq = firLowpass(DecodedAudio(8000, 1,
      Array.tabulate[Short](10)(i => if (i % 2 == 0) 1000 else -1000)))
    assert(nyq.samples.slice(2, 8).forall(_ == 0))
    // hand-computed with negatives: y[0] = (6·-3 + 4·5 + 1·-7)/16 = -5/16
    // = 0 (toward zero — floor would give -1), y[2] = -25/16 = -1 (floor -2)
    val h = firLowpass(DecodedAudio(8000, 1, Array[Short](-3, 5, -7)))
    assert(h.samples.toSeq == Seq[Short](0, 0, -1))
    // channels filter independently: left constant, right alternating
    val st = firLowpass(DecodedAudio(8000, 2,
      Array.tabulate[Short](16)(i =>
        if (i % 2 == 0) 800 else if ((i / 2) % 2 == 0) 600 else -600)))
    assert(st.samples.grouped(2).map(_(0)).toSeq.slice(2, 6).forall(_ == 800))
    assert(st.samples.grouped(2).map(_(1)).toSeq.slice(2, 6).forall(_ == 0))
    // lowpassDecimate2 = firLowpass then decimate(2), rate halved
    val ld = lowpassDecimate2(DecodedAudio(8000, 1, Array.fill[Short](9)(1000)))
    assert(ld.sampleRate == 4000 && ld.nFrames == 5)
    intercept[IllegalArgumentException] {
      firLowpass(DecodedAudio(8000, 1, Array[Short](1)), Array(1, 1), 2)
    } // even tap count
  }

  test("WAV decode: 8-bit rescale, ancillary chunk skip, corrupt inputs -> None") {
    // 8-bit offset-binary WAV hand-built: values 0,128,255 -> -32768,0,32512
    val hdr = java.nio.ByteBuffer.allocate(44 + 3)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    hdr.put("RIFF".getBytes).putInt(36 + 3).put("WAVE".getBytes)
      .put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(8000).putInt(8000).putShort(1).putShort(8)
      .put("data".getBytes).putInt(3)
      .put(0.toByte).put(128.toByte).put(255.toByte)
    val d8 = AudioDecode.decodeWav(hdr.array()).get
    assert(d8.samples.toSeq == Seq(-32768, 0, 32512).map(_.toShort))
    // a LIST chunk before data must be skipped
    val samples = Array.tabulate(10)(i => (i * 100).toShort)
    val base = AudioDecode.encodeWav(8000, 1, samples)
    val withList = java.nio.ByteBuffer.allocate(base.length + 12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    withList.put(base, 0, 36) // RIFF..fmt chunk
      .put("LIST".getBytes).putInt(4).put("INFO".getBytes)
      .put(base, 36, base.length - 36) // data chunk
    val arr = withList.array()
    // fix RIFF size
    val bb = java.nio.ByteBuffer.wrap(arr).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, arr.length - 8)
    val dl = AudioDecode.decodeWav(arr).get
    assert(dl.samples.sameElements(samples))
    // corrupt/truncated inputs
    assert(AudioDecode.decodeWav(base.take(30)).isEmpty)
    assert(AudioDecode.decodeWav("RIFFxxxxWAVE".getBytes ++ Array.fill(40)(0.toByte)).isEmpty)
    assert(AudioDecode.decodeWav(Array.fill(100)(0x41.toByte)).isEmpty)
  }

  test("frame sampling: midpoint-spaced offsets within duration") {
    val plan = Multimodal.frameSamplePlan(media, framesPerVideo = 4)
    val joined = plan.join(media.select(col("media_id"), col("duration_ms")), "media_id")
    assert(plan.count() ==
      media.filter(col("kind") === "video" && col("duration_ms").isNotNull).count() * 4)
    assert(joined.filter(col("frame_ms") >= col("duration_ms")).count() == 0)
    // deterministic spacing for one known video
    val one = plan.orderBy("media_id", "frame_ms").limit(4)
      .collect().map(_.getLong(1)).toSeq
    val dur = joined.orderBy("media_id").head().getAs[Long]("duration_ms")
    assert(one == Seq(dur / 8, 3 * dur / 8, 5 * dur / 8, 7 * dur / 8))
  }

  test("withAncillaryChunk: byte-different container, identical decode") {
    val mono = Array.tabulate(33)(i => (i * 100 - 1600).toShort)
    val base = AudioDecode.encodeWav(8000, 1, mono)
    val spliced = AudioDecode.withAncillaryChunk(base, "JUNK",
      Array.tabulate(7)(_.toByte)) // odd payload -> word-aligned pad
    assert(!spliced.sameElements(base))
    val (a, b) = (AudioDecode.decodeWav(base).get, AudioDecode.decodeWav(spliced).get)
    assert(a.sampleRate == b.sampleRate && a.samples.toSeq == b.samples.toSeq)
  }

  test("audioFingerprint: stereo-dup and junk-chunk copies collapse; content diffs don't") {
    import spark.implicits._
    val mono = Array.tabulate(20)(i => (i * 7 - 70).toShort)
    val stereo = mono.flatMap(v => Seq(v, v))
    val offByOne = mono.clone(); offByOne(3) = (offByOne(3) + 1).toShort
    val base = AudioDecode.encodeWav(8000, 1, mono)
    val rows = Seq(
      (1L, "audio", base),
      (2L, "audio", AudioDecode.encodeWav(8000, 2, stereo)),
      (3L, "audio", AudioDecode.withAncillaryChunk(base, "LIST", Array[Byte](1, 2))),
      (4L, "audio", AudioDecode.encodeWav(8000, 1, offByOne)),
      (5L, "audio", AudioDecode.encodeWav(16000, 1, mono)), // rate differs
      (6L, "audio", Array[Byte](1, 2, 3, 4))) // junk
    val fp = Multimodal.audioFingerprint(rows.toDF("media_id", "kind", "bytes"))
      .select("media_id", "fingerprint")
      .as[(Long, Option[String])].collect().toMap
    assert(fp(1L).isDefined && fp(1L) == fp(2L) && fp(1L) == fp(3L))
    assert(fp(4L) != fp(1L) && fp(5L) != fp(1L))
    assert(fp(6L).isEmpty)
  }

  test("whtInPlace: butterfly equals the (-1)^popcount(k&n) definition") {
    val rnd = new scala.util.Random(5)
    for (n <- Seq(8, 16); _ <- 1 to 20) {
      val x = Array.fill(n)(rnd.nextInt(65536).toLong - 32768)
      val direct = Array.tabulate(n) { k =>
        (0 until n).map(i =>
          x(i) * (if (java.lang.Long.bitCount((k & i).toLong) % 2 == 0) 1L else -1L)).sum
      }
      assert(AudioDecode.whtInPlace(x.clone()).toSeq == direct.toSeq)
    }
  }

  test("whtInPlace: Parseval — sum c^2 == n * sum s^2") {
    val rnd = new scala.util.Random(9)
    val x = Array.fill(8)(rnd.nextInt(2000).toLong - 1000)
    val c = AudioDecode.whtInPlace(x.clone())
    assert(c.map(v => v * v).sum == 8L * x.map(v => v * v).sum)
  }

  test("whtBandEnergies: DC and Nyquist land in bands 0 and 1; tail drops") {
    // constant signal -> all energy in band 0; alternating -> band 1
    // (popcount(1&n) = n mod 2); 18 frames at block 8 -> 2 full blocks
    val const = AudioDecode.DecodedAudio(8000, 1, Array.fill(18)(5.toShort))
    val (nb1, e1) = AudioDecode.whtBandEnergies(const, 8)
    assert(nb1 == 2 && e1(0) == 2L * 40L * 40L && e1.drop(1).forall(_ == 0L))
    val alt = AudioDecode.DecodedAudio(8000, 1,
      Array.tabulate(16)(i => (if (i % 2 == 0) 7 else -7).toShort))
    val (nb2, e2) = AudioDecode.whtBandEnergies(alt, 8)
    assert(nb2 == 2 && e2(1) == 2L * 56L * 56L &&
      e2.zipWithIndex.filter(_._2 != 1).forall(_._1 == 0L))
  }
}
