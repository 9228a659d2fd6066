package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / frame-sample
  * operators shaped for batch execution.
  *
  * The Spark-side plumbing (schema, partitioning, batch shape) is real.
  * Behind the `MediaCodec` seam there are three implementations: a REAL
  * byte-level pixel decoder ([[PixelCodec]] over [[ImageDecode]] — a
  * hand-rolled PNG chunk-walk/inflate/unfilter + BMP + PPM reader,
  * value-checked end-to-end by q158's channel-sum oracle), a pure-JVM
  * image HEADER decoder ([[ImageHeaderCodec]], javax.imageio — the cheap
  * metadata pass, value-checked in q60), and a deterministic fake
  * ([[StubCodec]]) standing in for audio/video decode, whose libraries
  * are not in this container (at cluster scale that decode is a
  * vectorized native/Python stage anyway). Swapping codecs changes ONE
  * implementation, no plan shapes.
  *
  * Scale notes: media blobs dominate row size — operators repartition by
  * blob-count (not bytes-naive) before decode so a partition holds a
  * bounded number of blobs; decoded features are small and flow into the
  * vector operators (similarity/dedup) downstream.
  */
object Multimodal {

  /** Typed metadata carried alongside every media blob. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("format", StringType), // png, wav, mp4, ...
    StructField("width", IntegerType), // images/video
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType), // audio
    StructField("duration_ms", LongType), // audio/video
    StructField("bytes", BinaryType, nullable = false)))

  /** Decode seam. Implementations must be deterministic per input bytes. */
  trait MediaCodec extends Serializable {
    /** Fixed-length feature vector from a media blob. */
    def features(kind: String, format: String, bytes: Array[Byte]): Array[Float]
    /** Frame offsets (ms) to sample from a video of `durationMs`. */
    def sampleFrames(durationMs: Long, n: Int): Seq[Long] =
      if (durationMs <= 0 || n <= 0) Seq.empty
      else (0 until n).map(i => durationMs * (2L * i + 1) / (2L * n))
  }

  /** Deterministic stand-in codec: features = seeded hash stream over the
    * bytes — NOT a real decoder (???-equivalent, clearly marked); the rest
    * of the operator (schema, batching, partitioning) is production-shaped. */
  final class StubCodec(dim: Int = 32) extends MediaCodec {
    override def features(kind: String, format: String, bytes: Array[Byte]): Array[Float] = {
      val out = new Array[Float](dim)
      var h = graft.functions.Fnv1a64.hashBytes(bytes)
      var i = 0
      while (i < dim) {
        h = h * 0x100000001b3L + 0x9e3779b97f4a7c15L
        out(i) = (h.toDouble / Long.MaxValue).toFloat
        i += 1
      }
      out
    }
  }

  /** Real PIXEL codec: full byte-level decode via [[ImageDecode]]
    * (PNG/BMP/PPM, pure JVM). features = [width, height, channels,
    * sum_c0, sum_c1, sum_c2] where sum_cN is the EXACT per-channel sum of
    * unsigned pixel bytes — an integer, order-independent statistic a SQL
    * oracle can replay (float32 holds it exactly below 2^24, i.e. images
    * up to ~65k RGB pixels; beyond that use a wider feature type).
    * Channels absent from the raster (gray) report 0; non-images and
    * undecodable blobs degrade to [-1, -1, 0, 0, 0, 0] rather than
    * failing the batch. */
  final class PixelCodec extends MediaCodec {
    override def features(kind: String, format: String, bytes: Array[Byte]): Array[Float] = {
      val bad = Array(-1f, -1f, 0f, 0f, 0f, 0f)
      if (kind != "image") return bad
      ImageDecode.decode(bytes) match {
        case Some(d) =>
          def s(c: Int): Float = if (c < d.channels) d.channelSum(c).toFloat else 0f
          Array(d.width.toFloat, d.height.toFloat, d.channels.toFloat,
            s(0), s(1), s(2))
        case None => bad
      }
    }
  }

  /** Real pixel-RESAMPLE codec: decode ([[ImageDecode]]) then integer
    * area-average downscale ([[ImageDecode.resizeArea]]) into a `maxW`×
    * `maxH` box (clamped to the input — never upscales, the resizePlan
    * contract). features = [out_w, out_h, sum_c0, sum_c1, sum_c2, wsum]
    * over the RESIZED raster, where wsum = Σ (c0+c1+c2)·(position+1) — a
    * positional checksum that pins every resized pixel value, in integers
    * small enough to be float32-exact. q160 replays all of it in SQL from
    * the fixture generator formula. */
  final class ResizeCodec(maxW: Int = 8, maxH: Int = 8) extends MediaCodec {
    override def features(kind: String, format: String, bytes: Array[Byte]): Array[Float] = {
      val bad = Array(-1f, -1f, 0f, 0f, 0f, 0f)
      if (kind != "image") return bad
      ImageDecode.decode(bytes) match {
        case Some(d0) =>
          val d = ImageDecode.resizeArea(d0, maxW, maxH)
          def s(c: Int): Long = if (c < d.channels) d.channelSum(c) else 0L
          var wsum = 0L
          var i = 0
          while (i < d.width * d.height) {
            var tot = 0L
            var ch = 0
            while (ch < d.channels) { tot += d.pixels(i * d.channels + ch) & 0xff; ch += 1 }
            wsum += tot * (i + 1)
            i += 1
          }
          Array(d.width.toFloat, d.height.toFloat, s(0).toFloat, s(1).toFloat,
            s(2).toFloat, wsum.toFloat)
        case None => bad
      }
    }
  }

  /** Real AUDIO codec: WAV (RIFF PCM) chunk walk via [[AudioDecode]].
    * features = [sample_rate, channels, duration_ms]; non-audio and
    * non-PCM blobs degrade like every other codec. */
  final class WavCodec extends MediaCodec {
    override def features(kind: String, format: String, bytes: Array[Byte]): Array[Float] = {
      if (kind != "audio") return Array(-1f, -1f, -1f)
      AudioDecode.decodeWav(bytes) match {
        case Some(a) => Array(a.sampleRate.toFloat, a.channels.toFloat, a.durationMs.toFloat)
        case None => Array(-1f, -1f, -1f)
      }
    }
  }

  /** Real image codec (pure JVM, no new deps): header-only decode via
    * `javax.imageio` — the registered reader for the container format
    * (PNG/GIF/BMP/JPEG) parses just the header for `getWidth/getHeight(0)`,
    * never the pixel data, which is exactly the cheap metadata pass a
    * 100 TB media pipeline runs before deciding what to decode fully.
    * features = [width, height, n_bytes]; non-images and undecodable blobs
    * degrade to [-1, -1, n_bytes] rather than failing the batch (a poison
    * blob must not kill a 10^9-row decode stage). */
  class ImageHeaderCodec extends MediaCodec {
    /** Seam for the registry-dependent stream factory (overridden in tests
      * to simulate the documented null return without touching the global
      * IIORegistry). */
    protected def openStream(bytes: Array[Byte]): javax.imageio.stream.ImageInputStream =
      javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(bytes))

    override def features(kind: String, format: String, bytes: Array[Byte]): Array[Float] = {
      if (kind != "image") return Array(-1f, -1f, bytes.length.toFloat)
      val iis = openStream(bytes)
      // createImageInputStream is documented to return null (no registered
      // SPI / unusable cache dir) — degrade like any other undecodable blob
      if (iis == null) return Array(-1f, -1f, bytes.length.toFloat)
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) Array(-1f, -1f, bytes.length.toFloat)
        else {
          val r = readers.next()
          try {
            r.setInput(iis)
            Array(r.getWidth(0).toFloat, r.getHeight(0).toFloat, bytes.length.toFloat)
          } catch {
            case scala.util.control.NonFatal(_) => Array(-1f, -1f, bytes.length.toFloat)
          } finally r.dispose()
        }
      } finally iis.close()
    }
  }

  /** Synthesize a deterministic media table from the documents table (the
    * container has no real media files; blob bytes = utf8 text, metadata
    * derived). Gives the multimodal operators a real distributed input. */
  def syntheticMediaFromDocs(docs: DataFrame): DataFrame = {
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      lit("raw").as("format"),
      when(pmod(col("doc_id"), lit(3)) === 0, (pmod(col("doc_id"), lit(640)) + 16).cast("int"))
        .otherwise(lit(null).cast("int")).as("width"),
      when(pmod(col("doc_id"), lit(3)) === 0, (pmod(col("doc_id"), lit(480)) + 16).cast("int"))
        .otherwise(lit(null).cast("int")).as("height"),
      when(pmod(col("doc_id"), lit(3)) === 1, lit(16000).cast("int"))
        .otherwise(lit(null).cast("int")).as("sample_rate"),
      when(pmod(col("doc_id"), lit(3)) =!= 0, (col("n_chars") * 10).cast("long"))
        .otherwise(lit(null).cast("long")).as("duration_ms"),
      encode(col("text"), "UTF-8").as("bytes"))
  }

  /** Feature extraction over media blobs: bounded-bytes-per-partition
    * repartition, then per-partition decode (the mapInPandas batch shape,
    * Scala-side). Output keeps (media_id, kind, features).
    *
    * `Dataset.mapPartitions` with an explicit Row encoder, not a
    * `media.rdd` + `createDataFrame` hop: the decode stays one node inside
    * the Dataset plan (no ScanExistingRDD barrier), so upstream and
    * downstream stages keep Tungsten rows and whole-stage codegen — the
    * SessionOps.withEmbeddings pattern. Partition count comes from the
    * optimizer's size estimate (driver-side plan metadata, no count()
    * action inside the operator): blobs dominate row size, so a bytes
    * budget bounds blobs per partition. */
  def extractFeatures(media: DataFrame, codec: MediaCodec,
      targetPartitionBytes: Long = 64L << 20): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("kind", StringType),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    val projected = media.select(col("media_id"), col("kind"), col("format"), col("bytes"))
    batched(projected, targetPartitionBytes)
      .mapPartitions { it =>
        it.map { r =>
          val feats = codec.features(r.getAs[String]("kind"),
            r.getAs[String]("format"), r.getAs[Array[Byte]]("bytes"))
          Row(r.getAs[Long]("media_id"), r.getAs[String]("kind"), feats.toSeq)
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Bytes-budget batching for a decode stage. Batch queries get the
    * blob-count-bounded repartition; STREAMING frames pass through
    * unchanged — the per-micro-batch volume is already bounded by the
    * source's own trigger options (maxFilesPerTrigger /
    * maxBytesPerTrigger), and the stats/toRdd plan introspection below
    * is illegal on an unstarted stream. This is what lets the media
    * operators run unchanged under Structured Streaming (q172). */
  private def batched(projected: DataFrame, targetPartitionBytes: Long): DataFrame =
    if (projected.isStreaming) projected
    else projected.repartition(
      boundedBlobPartitions(projected, targetPartitionBytes), col("media_id"))

  /** Blob-count-bounded partition count for a decode stage: a bytes
    * budget over the optimizer's size estimate (driver-side plan
    * metadata, no count() action). */
  private def boundedBlobPartitions(projected: DataFrame,
      targetPartitionBytes: Long): Int = {
    val estBytes = projected.queryExecution.optimizedPlan.stats.sizeInBytes
    // Plans with no stats report spark.sql.defaultSizeInBytes (Long.MaxValue
    // unless overridden) at their LEAVES; projection visitors then SCALE the
    // top-level estimate by a column width ratio, so the sentinel can't be
    // matched on `estBytes` itself — a fixed "anything past a petabyte"
    // cutoff would also mis-read a genuine multi-PB media scan as unknown
    // and lose the blobs-per-partition bound. Detect unknownness where it is
    // exact: any leaf still reporting the unscaled conf sentinel. Treating
    // the sentinel as a size would pin `parts` to the 10000 cap and schedule
    // 10000 near-empty tasks; inherit the input's own partitioning instead
    // (driver-side metadata, no job — toRdd reads the physical partitioning
    // without instantiating the deserialized-row RDD that `.rdd` builds).
    val defaultSize = BigInt(projected.sparkSession.conf
      .get("spark.sql.defaultSizeInBytes", Long.MaxValue.toString))
    val statsUnknown = projected.queryExecution.optimizedPlan
      .collectLeaves().exists(_.stats.sizeInBytes == defaultSize)
    if (statsUnknown) {
      val p = projected.queryExecution.toRdd.getNumPartitions.max(1)
      org.slf4j.LoggerFactory.getLogger(getClass).info(
        s"decode stage: input has no size stats (leaf reports the " +
          s"$defaultSize-byte sentinel); keeping the input's own $p " +
          "partitions — cache() or write/re-read the input if the decode " +
          "stage needs the bytes-budget repartition")
      p
    }
    else (estBytes / math.max(1L, targetPartitionBytes) + 1)
      .min(10000).max(1).toInt
  }

  /** Shared scaffold for the video operators: kind filter, projection,
    * bounded-blob repartition, container decode, sentinel degradation —
    * so a fix to any of those lands in ONE place; only the per-frame row
    * body differs between [[videoFrameIndex]] and [[videoFrameFeatures]]. */
  private def decodedVideoRows(media: DataFrame, outSchema: StructType,
      targetPartitionBytes: Long)(
      onDecoded: (Long, Array[Byte], VideoContainer.AviIndex) => Iterator[Row],
      onBad: Long => Row): DataFrame = {
    val projected = media.filter(col("kind") === "video")
      .select(col("media_id"), col("bytes"))
    batched(projected, targetPartitionBytes)
      .mapPartitions { it =>
        it.flatMap { r =>
          val id = r.getAs[Long]("media_id")
          val bytes = r.getAs[Array[Byte]]("bytes")
          VideoContainer.decodeAvi(bytes) match {
            case Some(ix) => onDecoded(id, bytes, ix)
            case None => Iterator.single(onBad(id))
          }
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Container frame INDEX for videos: one row per frame with the chunk
    * offsets (both the idx1-convention `movi_offset` and the absolute
    * `data_offset` of the payload — the latter is what a ranged blob
    * read consumes directly), size, and keyframe flag from the AVI walk
    * ([[VideoContainer]]), plus an integer payload checksum computed
    * from the SLICED bytes — so a wrong offset or length changes
    * `byte_sum`, not just metadata. This is the stage that lets frame
    * sampling read exact byte ranges out of a blob store without
    * decoding; undecodable containers degrade to a single sentinel row
    * (frame_no = -1) rather than failing the batch. Same bounded-blobs
    * batch shape as [[extractFeatures]]. */
  def videoFrameIndex(media: DataFrame,
      targetPartitionBytes: Long = 64L << 20): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("us_per_frame", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("frame_no", IntegerType),
      StructField("movi_offset", LongType),
      StructField("data_offset", LongType),
      StructField("size", IntegerType),
      StructField("is_key", IntegerType),
      StructField("byte_sum", LongType)))
    decodedVideoRows(media, outSchema, targetPartitionBytes)(
      onDecoded = (id, bytes, ix) =>
        ix.frames.iterator.map { f =>
          val payload = VideoContainer.frameBytes(bytes, f)
          var s = 0L
          payload.foreach(b => s += (b & 0xff))
          Row(id, ix.width, ix.height, ix.usPerFrame, ix.nFrames,
            f.frameNo, f.moviOffset, f.dataOffset, f.size,
            if (f.keyframe) 1 else 0, s)
        },
      onBad = id => Row(id, -1, -1, -1, -1, -1, -1L, -1L, -1, 0, 0L))
  }

  /** Frame sampling against the REAL container index: the
    * [[frameSamplePlan]] midpoint-spacing semantics, but duration comes
    * from the decoded index (n_frames × µs/frame) and each sample time
    * resolves to the byte range of the frame whose display interval
    * contains it — the slice list a 100 TB frame-extraction stage feeds
    * to ranged blob reads. All arithmetic is integer (`DIV`, not the
    * double-valued `/`), so an oracle replays it exactly.
    *
    * Shape: the per-frame index is computed once and cached (it serves
    * both the per-video sample generator and the equi-join back to frame
    * entries; the round-2 cache convention — no unpersist hook because
    * the returned frame is consumed lazily, and dead entries fall to
    * Spark's LRU under memory pressure with MEMORY_AND_DISK so eviction
    * never recomputes mid-job); the join is keyed (media_id, frame_no) —
    * shuffle-friendly, no broadcast assumption about video count. */
  def frameSampleOffsets(media: DataFrame, samplesPerVideo: Int = 4,
      targetPartitionBytes: Long = 64L << 20): DataFrame = {
    require(samplesPerVideo > 0, "samplesPerVideo must be positive")
    val idx = videoFrameIndex(media, targetPartitionBytes)
      .filter(col("frame_no") >= 0).cache()
    val samples = idx.select("media_id", "n_frames", "us_per_frame").distinct()
      .withColumn("duration_ms",
        expr("CAST(n_frames AS BIGINT) * us_per_frame DIV 1000"))
      .select(col("media_id"), col("n_frames"), col("us_per_frame"),
        col("duration_ms"),
        explode(sequence(lit(0), lit(samplesPerVideo - 1))).as("sample_i"))
      .withColumn("sample_ms",
        expr(s"duration_ms * (2 * sample_i + 1) DIV ${2L * samplesPerVideo}"))
      .withColumn("frame_no",
        least(col("n_frames") - 1, expr("sample_ms * 1000 DIV us_per_frame"))
          .cast("int"))
    samples.join(idx, Seq("media_id", "frame_no"))
      .select(col("media_id"), col("sample_i").cast("int").as("sample_i"),
        col("sample_ms"), col("frame_no"), col("movi_offset"),
        col("data_offset"), col("size"), col("is_key"))
  }

  /** Frame-level feature extraction for videos: the container walk
    * ([[videoFrameIndex]]'s decode) composed with the IMAGE codec seam —
    * each indexed frame payload is sliced out of the blob and fed to
    * `frameCodec` as an image, so the full 100 TB media path (container →
    * frame ranges → per-frame decode) runs on real bytes end to end.
    * With [[PixelCodec]] and PNG frame payloads this is byte-exact and
    * SQL-replayable (q165); with baseline-JPEG payloads it is real MJPEG
    * decode — container walk, slice, Huffman entropy decode, IDCT, color
    * convert, all pure JVM (q176). Undecodable containers degrade to one
    * sentinel row (frame_no = -1, empty features). */
  def videoFrameFeatures(media: DataFrame, frameCodec: MediaCodec,
      frameFormat: String = "png",
      targetPartitionBytes: Long = 64L << 20): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_no", IntegerType),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    decodedVideoRows(media, outSchema, targetPartitionBytes)(
      onDecoded = (id, bytes, ix) =>
        ix.frames.iterator.map { f =>
          val feats = frameCodec.features("image", frameFormat,
            VideoContainer.frameBytes(bytes, f))
          Row(id, f.frameNo, feats.toSeq)
        },
      onBad = id => Row(id, -1, Seq.empty[Float]))
  }

  /** Content fingerprint over DECODED pixels: md5 of (width, height,
    * channels, raster bytes). Identical rasters fingerprint identically
    * regardless of container format or encoder choices — a PNG written
    * with a different per-row filter strategy, or the same image stored
    * as PPM vs PNG, byte-hashes differently but pixel-fingerprints the
    * same, which is the key exact MEDIA dedup needs one level deeper
    * than blob hashing (re-encoded copies defeat blob hashes; q169).
    * Output also carries the per-channel sums so the decode itself stays
    * value-pinned. Undecodable images degrade to a NULL fingerprint
    * (never grouped — NULL joins nothing) with sentinel dims. */
  def pixelFingerprint(media: DataFrame,
      targetPartitionBytes: Long = 64L << 20): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("channels", IntegerType),
      StructField("fingerprint", StringType),
      StructField("r_sum", LongType),
      StructField("g_sum", LongType),
      StructField("b_sum", LongType)))
    imageBlobRows(media, outSchema, targetPartitionBytes) { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { case (id, bytes) =>
        ImageDecode.decode(bytes) match {
          case Some(d) =>
            md.reset()
            md.update(java.nio.ByteBuffer.allocate(12)
              .putInt(d.width).putInt(d.height).putInt(d.channels).array())
            md.update(d.pixels)
            val hex = md.digest().map(b => f"${b & 0xff}%02x").mkString
            def s(c: Int): Long = if (c < d.channels) d.channelSum(c) else 0L
            Row(id, d.width, d.height, d.channels, hex, s(0), s(1), s(2))
          case None => Row(id, -1, -1, 0, null, 0L, 0L, 0L)
        }
      }
    }
  }

  /** CONTENT fingerprint of audio blobs — [[pixelFingerprint]]'s role
    * for sound: decode the RIFF container, MIXDOWN TO MONO, and md5 over
    * (sampleRate, mono samples). Two blobs fingerprint identically iff
    * they carry the same audible content at the same rate regardless of
    * container arrangement (ancillary chunks) or channel layout (a
    * stereo file with duplicated channels mixes down to exactly its mono
    * original — `(l+r) div 2 = l`), which is the dup class blob hashing
    * misses. `sum_samples` carries the mono sample sum so the decode
    * chain stays value-pinned; undecodable blobs get NULL fingerprints
    * (never grouped) with sentinel fields. */
  def audioFingerprint(media: DataFrame,
      targetPartitionBytes: Long = 64L << 20): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("sample_rate", IntegerType),
      StructField("n_frames", LongType),
      StructField("fingerprint", StringType),
      StructField("sum_samples", LongType)))
    val projected = media.filter(col("kind") === "audio")
      .select(col("media_id"), col("bytes"))
    batched(projected, targetPartitionBytes)
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { r =>
          val id = r.getAs[Long]("media_id")
          AudioDecode.decodeWav(r.getAs[Array[Byte]]("bytes")) match {
            case Some(a) =>
              val mono = AudioDecode.mixdownMono(a)
              md.reset()
              md.update(java.nio.ByteBuffer.allocate(4)
                .putInt(mono.sampleRate).array())
              val bb = java.nio.ByteBuffer.allocate(mono.samples.length * 2)
                .order(java.nio.ByteOrder.LITTLE_ENDIAN)
              mono.samples.foreach(bb.putShort)
              md.update(bb.array())
              val hex = md.digest().map(b => f"${b & 0xff}%02x").mkString
              var sum = 0L
              mono.samples.foreach(v => sum += v)
              Row(id, mono.sampleRate, mono.nFrames.toLong, hex, sum)
            case None => Row(id, -1, -1L, null, 0L)
          }
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Shared scaffold for the image operators (the [[decodedVideoRows]]
    * discipline): kind filter, projection, bounded-blob repartition —
    * one place to fix the batch shape. */
  private def imageBlobRows(media: DataFrame, outSchema: StructType,
      targetPartitionBytes: Long)(
      onPartition: Iterator[(Long, Array[Byte])] => Iterator[Row]): DataFrame = {
    val projected = media.filter(col("kind") === "image")
      .select(col("media_id"), col("bytes"))
    batched(projected, targetPartitionBytes)
      .mapPartitions { it =>
        onPartition(it.map(r =>
          (r.getAs[Long]("media_id"), r.getAs[Array[Byte]]("bytes"))))
      }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Storage normalization: decode each image and re-encode the raster
    * as canonical PPM — after [[pixelFingerprint]] dedup this gives every
    * kept image ONE deterministic byte representation (identical rasters
    * → identical bytes), which is what makes downstream shards
    * content-addressable and the whole layout replayable (q170's
    * curation chain). Every DECODABLE raster normalizes: gray expands to
    * RGB by replication, RGBA drops its alpha plane. Only undecodable
    * blobs are dropped — they carry no raster to normalize, and they
    * leave the curation chain earlier anyway (a NULL fingerprint never
    * matches the exact-dedup join, so audit undecodable media at the
    * [[pixelFingerprint]] stage, where the NULL rows are visible). */
  def transcodeToPpm(media: DataFrame,
      targetPartitionBytes: Long = 64L << 20): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("bytes", BinaryType)))
    imageBlobRows(media, outSchema, targetPartitionBytes) { it =>
      it.flatMap { case (id, bytes) =>
        ImageDecode.decode(bytes).map { d =>
          val n = d.width * d.height
          val rgb = d.channels match {
            case 3 => d.pixels
            case 1 => Array.tabulate(3 * n)(i => d.pixels(i / 3))
            case c => // RGBA and any wider layout: keep the RGB planes
              Array.tabulate(3 * n)(i => d.pixels((i / 3) * c + i % 3))
          }
          Row(id, ImageDecode.encodePpm(d.width, d.height, rgb))
        }.iterator
      }
    }
  }

  /** Resize plan for images: fit into a `maxW`×`maxH` box preserving
    * aspect ratio, never upscaling — (media_id, width, height, out_w,
    * out_h) is pure column arithmetic; the pixel resample itself belongs
    * to the codec seam (a real deployment's vectorized decode stage
    * consumes exactly this plan shape). */
  def resizePlan(media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    media
      .filter(col("kind") === "image" &&
        col("width").isNotNull && col("height").isNotNull)
      .select(col("media_id"), col("width"), col("height"),
        least(lit(maxW.toDouble) / col("width"),
          lit(maxH.toDouble) / col("height"), lit(1.0)).as("scale"))
      .select(col("media_id"), col("width"), col("height"),
        floor(col("width") * col("scale")).cast("long").as("out_w"),
        floor(col("height") * col("scale")).cast("long").as("out_h"))
  }

  /** Frame sampling plan for videos: (media_id, frame_ms) rows — the shape
    * a real frame decoder consumes; pure column arithmetic. */
  def frameSamplePlan(media: DataFrame, framesPerVideo: Int = 4): DataFrame = {
    media
      .filter(col("kind") === "video" && col("duration_ms").isNotNull)
      .select(col("media_id"), col("duration_ms"),
        explode(sequence(lit(0), lit(framesPerVideo - 1))).as("i"))
      .select(col("media_id"),
        (col("duration_ms") * (lit(2) * col("i") + 1) / lit(2L * framesPerVideo))
          .cast("long").as("frame_ms"))
  }
}
