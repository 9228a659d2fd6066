package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** AVI container walk: the decoder is checked against HAND-BUILT byte
  * buffers (an independent writer living in this spec, not
  * [[VideoContainer.encodeAvi]]) so a symmetric writer/reader bug cannot
  * hide — the q161 javax.sound discipline applied to video. */
class VideoContainerSpec extends SparkSpec {

  /** Independent AVI writer: same public layout, written longhand. */
  private def handBuiltAvi(absoluteIdx1: Boolean): Array[Byte] = {
    // two frames: 3 bytes (odd → pad) then 4 bytes; frame 0 keyframe
    val f0 = Array[Byte](10, 20, 30)
    val f1 = Array[Byte](1, 2, 3, 4)
    val hdrl = 4 + 64 + (8 + 4 + 64 + 48)
    val movi = 4 + (8 + 3 + 1) + (8 + 4)
    val idx1 = 32
    val total = 12 + 8 + hdrl + 8 + movi + 8 + idx1
    val b = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def cc(s: String): Unit = b.put(s.getBytes("US-ASCII"))
    cc("RIFF"); b.putInt(total - 8); cc("AVI ")
    cc("LIST"); b.putInt(hdrl); cc("hdrl")
    cc("avih"); b.putInt(56)
    b.putInt(40000).putInt(0).putInt(0).putInt(0x10).putInt(2).putInt(0)
      .putInt(1).putInt(4).putInt(320).putInt(240)
      .putInt(0).putInt(0).putInt(0).putInt(0)
    cc("LIST"); b.putInt(4 + 64 + 48); cc("strl")
    cc("strh"); b.putInt(56)
    cc("vids"); cc("MJPG")
    b.putInt(0).putInt(0).putInt(0).putInt(40000).putInt(1000000)
      .putInt(0).putInt(2).putInt(4).putInt(-1).putInt(0)
    b.putShort(0).putShort(0).putShort(320).putShort(240)
    cc("strf"); b.putInt(40)
    b.putInt(40).putInt(320).putInt(240).putShort(1).putShort(24)
    cc("MJPG"); b.putInt(320 * 240 * 3).putInt(0).putInt(0).putInt(0).putInt(0)
    cc("LIST"); b.putInt(movi); cc("movi")
    val moviPos = b.position() - 4
    cc("00dc"); b.putInt(3); b.put(f0); b.put(0.toByte) // pad to word
    cc("00dc"); b.putInt(4); b.put(f1)
    cc("idx1"); b.putInt(32)
    val base = if (absoluteIdx1) moviPos else 0
    cc("00dc"); b.putInt(0x10); b.putInt(base + 4); b.putInt(3)
    cc("00dc"); b.putInt(0); b.putInt(base + 4 + 8 + 3 + 1); b.putInt(4)
    b.array()
  }

  test("decodes a hand-built AVI: geometry, offsets, sizes, flags, slices") {
    for (absolute <- Seq(false, true)) {
      val bytes = handBuiltAvi(absolute)
      val ix = VideoContainer.decodeAvi(bytes)
        .getOrElse(fail(s"decode failed (absoluteIdx1=$absolute)"))
      assert(ix.width == 320 && ix.height == 240 && ix.usPerFrame == 40000)
      assert(ix.nFrames == 2 && ix.durationMs == 80)
      assert(ix.frames(0).moviOffset == 4 && ix.frames(0).size == 3)
      assert(ix.frames(0).keyframe && !ix.frames(1).keyframe)
      assert(ix.frames(1).moviOffset == 4 + 8 + 3 + 1 && ix.frames(1).size == 4)
      assert(VideoContainer.frameBytes(bytes, ix.frames(0)).toSeq == Seq[Byte](10, 20, 30))
      assert(VideoContainer.frameBytes(bytes, ix.frames(1)).toSeq == Seq[Byte](1, 2, 3, 4))
    }
  }

  test("encoder round-trip: frames, padding, keyframes, geometry survive") {
    val frames = Seq(
      (Array.tabulate(7)(_.toByte), true),
      (Array.tabulate(8)(i => (i * 3).toByte), false),
      (Array.tabulate(5)(i => (100 + i).toByte), false),
      (Array.tabulate(2)(i => (50 - i).toByte), true))
    val bytes = VideoContainer.encodeAvi(64, 48, 33333, frames)
    val ix = VideoContainer.decodeAvi(bytes).getOrElse(fail("decode failed"))
    assert(ix.width == 64 && ix.height == 48 && ix.usPerFrame == 33333)
    assert(ix.nFrames == 4)
    ix.frames.zip(frames).foreach { case (e, (payload, key)) =>
      assert(e.size == payload.length)
      assert(e.keyframe == key)
      assert(VideoContainer.frameBytes(bytes, e).toSeq == payload.toSeq)
    }
    // RIFF layout: running chunk offsets include 8-byte headers + word pads
    assert(ix.frames(0).moviOffset == 4)
    assert(ix.frames(1).moviOffset == 4 + 8 + 7 + 1)
    assert(ix.frames(2).moviOffset == 4 + 8 + 7 + 1 + 8 + 8)
    assert(ix.frames(3).moviOffset == 4 + 8 + 7 + 1 + 8 + 8 + 8 + 5 + 1)
  }

  test("malformed or inconsistent containers return None, never a guess") {
    val good = VideoContainer.encodeAvi(16, 16, 40000,
      Seq((Array[Byte](1, 2, 3), true), (Array[Byte](4, 5), false)))
    assert(VideoContainer.decodeAvi(good).isDefined)
    // truncation anywhere
    for (cut <- Seq(4, 20, good.length / 2, good.length - 3))
      assert(VideoContainer.decodeAvi(good.take(cut)).isEmpty, s"cut=$cut")
    // not RIFF / not AVI
    assert(VideoContainer.decodeAvi("JUNKJUNKJUNKJUNK".getBytes).isEmpty)
    val notAvi = good.clone(); notAvi(8) = 'W'.toByte
    assert(VideoContainer.decodeAvi(notAvi).isEmpty)
    // idx1 size disagrees with the movi walk → inconsistent index
    val badIdx = good.clone()
    val idxPos = {
      var p = -1
      for (i <- 0 until badIdx.length - 4)
        if (p < 0 && new String(badIdx, i, 4, "US-ASCII") == "idx1") p = i
      p
    }
    assert(idxPos > 0)
    badIdx(idxPos + 8 + 12) = 99.toByte // first entry's dwChunkSize
    assert(VideoContainer.decodeAvi(badIdx).isEmpty)
    // avih frame count disagrees with the walked movi chunks
    val badCount = good.clone()
    // avih body starts at 12 (RIFF) + 8 (LIST) + 4 (hdrl) + 8 (avih hdr) = 32
    badCount(32 + 16) = 9.toByte
    assert(VideoContainer.decodeAvi(badCount).isEmpty)
    // zero-geometry encode is rejected at the writer
    intercept[IllegalArgumentException] {
      VideoContainer.encodeAvi(0, 16, 40000, Seq.empty)
    }
  }

  test("videoFrameFeatures: sliced PNG frames pixel-decode through the codec seam") {
    import spark.implicits._
    // two 2×2 PNG frames with known pixels; frame 1 forces filter type 1
    val f0 = Array[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120)
    val f1 = f0.map(b => (b + 1).toByte)
    val avi = VideoContainer.encodeAvi(2, 2, 40000, Seq(
      (ImageDecode.encodePng(2, 2, f0), true),
      (ImageDecode.encodePng(2, 2, f1, _ => 1), false)))
    val media = Seq((7L, "video", avi)).toDF("media_id", "kind", "bytes")
    val out = Multimodal.videoFrameFeatures(media, new Multimodal.PixelCodec)
      .orderBy(col("frame_no")).collect()
    assert(out.length == 2)
    def sums(fr: Array[Byte], c: Int): Long =
      fr.indices.filter(_ % 3 == c).map(i => (fr(i) & 0xff).toLong).sum
    for ((row, fr) <- out.zip(Seq(f0, f1))) {
      val feats = row.getSeq[Float](2)
      assert(feats(0) == 2f && feats(1) == 2f && feats(2) == 3f)
      assert(feats(3) == sums(fr, 0).toFloat)
      assert(feats(4) == sums(fr, 1).toFloat)
      assert(feats(5) == sums(fr, 2).toFloat)
    }
  }

  test("frameSampleOffsets: midpoint samples resolve to containing-frame byte ranges") {
    import spark.implicits._
    val avi = VideoContainer.encodeAvi(16, 16, 33000, Seq(
      (Array[Byte](1, 2, 3), true),
      (Array[Byte](4, 5, 6, 7), false),
      (Array[Byte](8, 9, 10, 11, 12), true)))
    val media = Seq((5L, "video", avi)).toDF("media_id", "kind", "bytes")
    val out = Multimodal.frameSampleOffsets(media, samplesPerVideo = 4)
      .orderBy(col("sample_i")).collect()
    // duration = 3*33000/1000 = 99 ms; samples at 99*(2i+1)/8 = 12,37,61,86 ms
    // frame = ms*1000/33000 → 0,1,1,2; offsets: f0=4, f1=4+8+3+1=16, f2=16+8+4=28;
    // data_offset = movi fourcc (220) + movi_offset + 8
    val expected = Seq(
      (0, 12L, 0, 4L, 3, 1), (1, 37L, 1, 16L, 4, 0),
      (2, 61L, 1, 16L, 4, 0), (3, 86L, 2, 28L, 5, 1))
    assert(out.length == 4)
    out.zip(expected).foreach { case (r, (si, ms, fn, off, sz, key)) =>
      assert(r.getInt(1) == si && r.getLong(2) == ms && r.getInt(3) == fn)
      assert(r.getLong(4) == off && r.getLong(5) == off + 228 &&
        r.getInt(6) == sz && r.getInt(7) == key)
    }
  }

  test("videoFrameIndex: per-frame rows with slice checksums; junk degrades") {
    import spark.implicits._
    val frames = Seq(
      (Array.tabulate(3)(i => (i + 1).toByte), true),
      (Array.tabulate(4)(i => (10 * (i + 1)).toByte), false))
    val avi = VideoContainer.encodeAvi(32, 24, 50000, frames)
    val media = Seq(
      (1L, "video", avi),
      (2L, "video", "not an avi at all".getBytes),
      (3L, "image", avi) // wrong kind: filtered out entirely
    ).toDF("media_id", "kind", "bytes")
    val out = Multimodal.videoFrameIndex(media)
      .orderBy(col("media_id"), col("frame_no")).collect()
    val v1 = out.filter(_.getLong(0) == 1L)
    assert(v1.length == 2)
    assert(v1(0).getInt(1) == 32 && v1(0).getInt(2) == 24 && v1(0).getInt(3) == 50000)
    assert(v1(0).getInt(5) == 0 && v1(0).getInt(9) == 1 &&
      v1(0).getLong(10) == (1 + 2 + 3))
    assert(v1(1).getInt(5) == 1 && v1(1).getInt(9) == 0 &&
      v1(1).getLong(10) == (10 + 20 + 30 + 40))
    // data_offset is the absolute payload position: slicing the original
    // blob there reproduces the payload the checksum was computed from
    v1.foreach { r =>
      val off = r.getLong(7).toInt; val sz = r.getInt(8)
      val slice = avi.slice(off, off + sz)
      assert(slice.map(_ & 0xff).map(_.toLong).sum == r.getLong(10))
    }
    val v2 = out.filter(_.getLong(0) == 2L)
    assert(v2.length == 1 && v2(0).getInt(5) == -1) // sentinel row
    assert(!out.exists(_.getLong(0) == 3L))
  }

  test("zero frame rate and non-positive geometry are rejected, not guessed") {
    val good = VideoContainer.encodeAvi(16, 16, 40000,
      Seq((Array[Byte](1, 2, 3), true)))
    assert(VideoContainer.decodeAvi(good).isDefined)
    // avih body starts at byte 32: dwMicroSecPerFrame at +0, dwHeight at +36
    val zeroRate = good.clone()
    for (i <- 0 until 4) zeroRate(32 + i) = 0
    assert(VideoContainer.decodeAvi(zeroRate).isEmpty)
    val negHeight = good.clone()
    negHeight(32 + 36 + 3) = 0xff.toByte
    assert(VideoContainer.decodeAvi(negHeight).isEmpty)
    val zeroWidth = good.clone()
    for (i <- 0 until 4) zeroWidth(32 + 32 + i) = 0
    assert(VideoContainer.decodeAvi(zeroWidth).isEmpty)
  }
}
