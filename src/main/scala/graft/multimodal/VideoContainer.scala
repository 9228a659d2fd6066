package graft.multimodal

/** Real byte-level AVI (RIFF) video CONTAINER walk, pure JVM, zero
  * dependencies — the video third of the multimodal surface
  * ([[ImageDecode]] is the image third, [[AudioDecode]] the audio
  * third). Scope: what a training-data pipeline needs from a video
  * container BEFORE any codec runs — the frame INDEX (offsets, sizes,
  * keyframe flags) plus the stream geometry (width/height/frame rate),
  * so frame sampling can slice exact byte ranges out of a 100 TB blob
  * store without decoding. Frame PAYLOAD decode: MJPEG (JPEG payloads)
  * is REAL via [[JpegDecode]] through the codec seam (q176);
  * inter-frame codecs (H.264 etc.) stay behind the stub seam — those
  * genuinely need native codecs.
  *
  * This is extension surface (the multimodal mandate), not reference
  * surface — the reference pipeline has no media pass; the operator the
  * index feeds is [[Multimodal.frameSamplePlan]]'s sampling shape.
  *
  * Structure parsed (public AVI 1.0 spec, msdn AVIMAINHEADER et al.):
  * RIFF 'AVI ' → LIST 'hdrl' { 'avih' main header, LIST 'strl'
  * { 'strh' stream header, 'strf' format } } → LIST 'movi'
  * { '##dc'/'##db' frame chunks } → 'idx1' index. The decoder walks the
  * `movi` list chunk-by-chunk AND parses `idx1`, then REQUIRES the two
  * views to agree (count, per-frame offset, per-frame size) and the
  * `avih` frame count to match — a malformed or inconsistent container
  * returns None rather than a guessed index. idx1 offsets are accepted
  * in both public conventions (relative to the 'movi' fourcc — the
  * common one — or absolute file offsets, auto-detected from entry 0
  * the way players do).
  */
object VideoContainer {

  /** One frame in the container index. `moviOffset` is the chunk-header
    * offset relative to the 'movi' fourcc (the idx1 convention — frame 0
    * is always 4); `dataOffset` is the absolute file offset of the frame
    * PAYLOAD (slice-ready); `size` is the payload length in bytes. */
  final case class FrameEntry(frameNo: Int, moviOffset: Long, dataOffset: Long,
      size: Int, keyframe: Boolean)

  /** Decoded container index: stream geometry + per-frame entries. */
  final case class AviIndex(width: Int, height: Int, usPerFrame: Int,
      frames: Array[FrameEntry]) {
    def nFrames: Int = frames.length
    def durationMs: Long = nFrames.toLong * usPerFrame / 1000L
  }

  private val KeyframeFlag = 0x10 // AVIIF_KEYFRAME
  private val HasIndexFlag = 0x10 // AVIF_HASINDEX

  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def tag(b: Array[Byte], o: Int): String =
    if (o + 4 <= b.length) new String(b, o, 4, "US-ASCII") else ""
  private def isFrameId(id: String): Boolean =
    id.length == 4 && id.charAt(0).isDigit && id.charAt(1).isDigit &&
      (id.endsWith("dc") || id.endsWith("db")) // compressed / uncompressed video

  /** Container walk + index cross-check. None on anything malformed or
    * internally inconsistent — never a guessed index. */
  def decodeAvi(bytes: Array[Byte]): Option[AviIndex] = {
    try {
      if (bytes.length < 12 || tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "AVI ")
        return None
      var off = 12
      var width = -1; var height = -1; var usPerFrame = -1
      var avihFrames = -1; var vidsSeen = false
      var moviFourccPos = -1L
      val walked = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)] // (moviOffset, size)
      var idx1: Array[(String, Int, Long, Int)] = null // (ckid, flags, offset, size)

      while (off + 8 <= bytes.length) {
        val id = tag(bytes, off); val len = le32(bytes, off + 4)
        val body = off + 8
        if (len < 0 || body + len > bytes.length) return None
        id match {
          case "LIST" =>
            tag(bytes, body) match {
              case "hdrl" =>
                // walk hdrl sub-chunks: avih + nested strl lists
                var p = body + 4
                val end = body + len
                while (p + 8 <= end) {
                  val sid = tag(bytes, p); val slen = le32(bytes, p + 4)
                  val sbody = p + 8
                  if (slen < 0 || sbody + slen > end) return None
                  sid match {
                    case "avih" =>
                      if (slen < 40) return None
                      usPerFrame = le32(bytes, sbody)
                      avihFrames = le32(bytes, sbody + 16)
                      width = le32(bytes, sbody + 32)
                      height = le32(bytes, sbody + 36)
                    case "LIST" if tag(bytes, sbody) == "strl" =>
                      // first sub-chunk must be strh; we only need fccType
                      // (reading it needs 16 bytes: strl + strh hdr + fccType)
                      if (sbody + 16 <= end && tag(bytes, sbody + 4) == "strh" &&
                        tag(bytes, sbody + 12) == "vids") vidsSeen = true
                    case _ => ()
                  }
                  p = sbody + slen + (slen & 1)
                }
              case "movi" =>
                moviFourccPos = body
                var p = body + 4
                val end = body + len
                while (p + 8 <= end) {
                  val cid = tag(bytes, p); val clen = le32(bytes, p + 4)
                  val cbody = p + 8
                  if (clen < 0 || cbody + clen > end) return None
                  if (isFrameId(cid)) walked += ((p - moviFourccPos, clen))
                  p = cbody + clen + (clen & 1)
                }
              case _ => ()
            }
          case "idx1" =>
            if (len % 16 != 0) return None
            idx1 = Array.tabulate(len / 16) { i =>
              val e = body + i * 16
              (tag(bytes, e), le32(bytes, e + 4), le32(bytes, e + 8).toLong,
                le32(bytes, e + 12))
            }
          case _ => ()
        }
        off = body + len + (len & 1)
      }

      // geometry and frame rate must be strictly positive: a zero
      // dwMicroSecPerFrame would poison every downstream duration/DIV and
      // zero/negative dimensions are malformed, not decodable — degrade to
      // None like every other inconsistency (never a guessed index)
      if (width <= 0 || height <= 0 || usPerFrame <= 0 || !vidsSeen || moviFourccPos < 0 ||
        idx1 == null) return None
      val idxFrames = idx1.filter(e => isFrameId(e._1))
      if (idxFrames.length != walked.length || avihFrames != walked.length)
        return None
      // idx1 offsets: relative to the 'movi' fourcc (common) or absolute
      // (some writers) — detect from entry 0 the way players do.
      val base =
        if (idxFrames.nonEmpty && walked.nonEmpty &&
          idxFrames(0)._3 == moviFourccPos + walked(0)._1) moviFourccPos
        else 0L
      val frames = new Array[FrameEntry](walked.length)
      var i = 0
      while (i < walked.length) {
        val (mOff, mSize) = walked(i)
        val (_, flags, iOff, iSize) = idxFrames(i)
        if (iOff - base != mOff || iSize != mSize) return None // index disagrees
        frames(i) = FrameEntry(i, mOff, moviFourccPos + mOff + 8, mSize,
          (flags & KeyframeFlag) != 0)
        i += 1
      }
      Some(AviIndex(width, height, usPerFrame, frames))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Exact payload slice for one indexed frame. */
  def frameBytes(bytes: Array[Byte], e: FrameEntry): Array[Byte] =
    java.util.Arrays.copyOfRange(bytes, e.dataOffset.toInt, e.dataOffset.toInt + e.size)

  /** Minimal AVI 1.0 writer: one 'vids' stream, MJPG-tagged payloads
    * (the bytes are opaque to the container), word-aligned movi chunks,
    * idx1 with movi-relative offsets. Shares only the public layout
    * constants with the decoder; the spec additionally decodes hand-built
    * byte buffers so a symmetric writer/reader bug cannot hide. */
  def encodeAvi(width: Int, height: Int, usPerFrame: Int,
      frames: Seq[(Array[Byte], Boolean)]): Array[Byte] = {
    require(width > 0 && height > 0 && usPerFrame > 0, "positive geometry required")
    val n = frames.length
    val maxSize = if (n == 0) 0 else frames.iterator.map(_._1.length).max
    val moviBody = 4 + frames.iterator.map { case (f, _) => 8 + f.length + (f.length & 1) }.sum
    val hdrlBody = 4 + (8 + 56) + (8 + (4 + (8 + 56) + (8 + 40)))
    val idx1Body = 16 * n
    val total = 12 + (8 + hdrlBody) + (8 + moviBody) + (8 + idx1Body)
    val buf = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String): Unit = buf.put(s.getBytes("US-ASCII"))
    fourcc("RIFF"); buf.putInt(total - 8); fourcc("AVI ")
    // hdrl
    fourcc("LIST"); buf.putInt(hdrlBody); fourcc("hdrl")
    fourcc("avih"); buf.putInt(56)
    buf.putInt(usPerFrame).putInt(0).putInt(0).putInt(HasIndexFlag)
      .putInt(n).putInt(0).putInt(1).putInt(maxSize)
      .putInt(width).putInt(height).putInt(0).putInt(0).putInt(0).putInt(0)
    fourcc("LIST"); buf.putInt(4 + 64 + 48); fourcc("strl")
    fourcc("strh"); buf.putInt(56)
    fourcc("vids"); fourcc("MJPG")
    buf.putInt(0).putInt(0).putInt(0) // flags, prio/lang, initialFrames
      .putInt(usPerFrame).putInt(1000000) // scale, rate: rate/scale = fps
      .putInt(0).putInt(n).putInt(maxSize).putInt(-1).putInt(0) // start, length, bufsize, quality, samplesize
    buf.putShort(0).putShort(0).putShort(width.toShort).putShort(height.toShort) // rcFrame
    fourcc("strf"); buf.putInt(40)
    buf.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
    fourcc("MJPG")
    buf.putInt(width * height * 3).putInt(0).putInt(0).putInt(0).putInt(0)
    // movi
    fourcc("LIST"); buf.putInt(moviBody); fourcc("movi")
    val moviFourccPos = buf.position() - 4
    val offsets = new Array[Int](n)
    frames.zipWithIndex.foreach { case ((f, _), i) =>
      offsets(i) = buf.position() - moviFourccPos
      fourcc("00dc"); buf.putInt(f.length); buf.put(f)
      if ((f.length & 1) == 1) buf.put(0.toByte)
    }
    // idx1
    fourcc("idx1"); buf.putInt(idx1Body)
    frames.zipWithIndex.foreach { case ((f, key), i) =>
      fourcc("00dc")
      buf.putInt(if (key) KeyframeFlag else 0)
      buf.putInt(offsets(i)).putInt(f.length)
    }
    buf.array()
  }
}
