package graft.multimodal

/** Real byte-level image decoding, pure JVM, zero dependencies (VERDICT
  * r10 item 2): a PNG chunk-walk decoder (zlib inflate via
  * `java.util.zip.Inflater` + all five scanline filters), an uncompressed
  * 24/32-bit BMP reader, and a binary PPM/PGM reader. This replaces the
  * "decode is stubbed" caveat on the multimodal surface with an actual
  * pixel decode the q158 oracle value-checks end-to-end (channel sums over
  * committed blobs, replayed in DuckDB from the fixture's generator
  * formula).
  *
  * Baseline JPEG dispatches to [[JpegDecode]] (full T.81 sequential
  * Huffman decode, pure JVM).
  *
  * Deliberately NOT supported (returns None rather than guessing):
  * Adam7-interlaced PNG, bit depths other than 8, compressed BMP — the
  * callers degrade exactly like any undecodable blob, so a poison input
  * can never kill a batch. A matching minimal PNG ENCODER ([[encodePng]])
  * exists for specs and fixture generation; encoder and decoder share no
  * code beyond the constants, so a round-trip through real bytes tests
  * the decode path against an independent writer too.
  */
object ImageDecode {

  /** Decoded raster: `pixels` is row-major, `channels` interleaved bytes
    * per pixel (1 = gray, 3 = RGB, 4 = RGBA). */
  final case class Decoded(width: Int, height: Int, channels: Int,
      pixels: Array[Byte]) {
    /** Exact per-channel sum of unsigned byte values — the integer,
      * order-independent statistic the oracle replays. */
    def channelSum(c: Int): Long = {
      var s = 0L
      var i = c
      while (i < pixels.length) { s += pixels(i) & 0xff; i += channels }
      s
    }
  }

  def decode(bytes: Array[Byte]): Option[Decoded] = {
    if (bytes.length >= 8 &&
      (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G')
      decodePng(bytes)
    else if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M')
      decodeBmp(bytes)
    else if (bytes.length >= 2 && bytes(0) == 'P' &&
      (bytes(1) == '5' || bytes(1) == '6'))
      decodePnm(bytes)
    else if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8)
      JpegDecode.decodeJpeg(bytes)
    else None
  }

  // ---------------------------------------------------------------- PNG

  private def be32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
      ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)

  /** Chunk walk: IHDR → (PLTE) → IDAT* → IEND; inflate the concatenated
    * IDAT stream; undo the per-scanline filter. Supports bit depth 8,
    * color types 0 (gray), 2 (RGB), 3 (palette), 6 (RGBA),
    * non-interlaced. */
  def decodePng(bytes: Array[Byte]): Option[Decoded] = {
    try {
      var off = 8
      var w = 0; var h = 0; var bitDepth = 0; var colorType = -1
      var interlace = 0
      var palette: Array[Byte] = null
      val idat = new java.io.ByteArrayOutputStream()
      var done = false
      while (!done && off + 8 <= bytes.length) {
        val len = be32(bytes, off)
        val typ = new String(bytes, off + 4, 4, "US-ASCII")
        val dataOff = off + 8
        if (len < 0 || dataOff + len + 4 > bytes.length) return None
        typ match {
          case "IHDR" =>
            w = be32(bytes, dataOff); h = be32(bytes, dataOff + 4)
            bitDepth = bytes(dataOff + 8) & 0xff
            colorType = bytes(dataOff + 9) & 0xff
            interlace = bytes(dataOff + 12) & 0xff
          case "PLTE" =>
            palette = java.util.Arrays.copyOfRange(bytes, dataOff, dataOff + len)
          case "IDAT" => idat.write(bytes, dataOff, len)
          case "IEND" => done = true
          case _ => () // ancillary chunk: skip
        }
        off = dataOff + len + 4 // skip CRC
      }
      if (w <= 0 || h <= 0 || bitDepth != 8 || interlace != 0) return None
      val srcChannels = colorType match {
        case 0 => 1 // gray
        case 2 => 3 // RGB
        case 3 => 1 // palette index
        case 6 => 4 // RGBA
        case _ => return None
      }
      if (colorType == 3 && palette == null) return None
      // inflate. end() in finally — every early return/exception would
      // otherwise leak the native zlib buffer until finalization; and ANY
      // zero-progress inflate (truncated stream, preset-dictionary FDICT
      // flag → needsDictionary) returns None instead of spinning — a
      // poison blob must neither hang nor kill the batch.
      val raw = new Array[Byte]((srcChannels * w + 1) * h)
      val inf = new java.util.zip.Inflater()
      try {
        inf.setInput(idat.toByteArray)
        var filled = 0
        while (filled < raw.length && !inf.finished()) {
          val n = inf.inflate(raw, filled, raw.length - filled)
          if (n == 0) return None // stalled: truncated, FDICT, or junk
          filled += n
        }
        if (filled < raw.length) return None
      } finally inf.end()
      // unfilter, scanline by scanline
      val bpp = srcChannels // bytes per pixel at depth 8
      val stride = srcChannels * w
      val out = new Array[Byte](stride * h)
      var y = 0
      while (y < h) {
        val f = raw(y * (stride + 1)) & 0xff
        val src = y * (stride + 1) + 1
        val dst = y * stride
        var x = 0
        while (x < stride) {
          val cur = raw(src + x) & 0xff
          val left = if (x >= bpp) out(dst + x - bpp) & 0xff else 0
          val up = if (y > 0) out(dst - stride + x) & 0xff else 0
          val ul = if (x >= bpp && y > 0) out(dst - stride + x - bpp) & 0xff else 0
          val v = f match {
            case 0 => cur
            case 1 => cur + left
            case 2 => cur + up
            case 3 => cur + ((left + up) >> 1)
            case 4 => // Paeth predictor
              val p = left + up - ul
              val pa = math.abs(p - left); val pb = math.abs(p - up)
              val pc = math.abs(p - ul)
              cur + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
            case _ => return None
          }
          out(dst + x) = (v & 0xff).toByte
          x += 1
        }
        y += 1
      }
      if (colorType == 3) { // expand palette indices to RGB
        val rgb = new Array[Byte](3 * w * h)
        var i = 0
        while (i < w * h) {
          val pi = (out(i) & 0xff) * 3
          if (pi + 2 >= palette.length) return None
          rgb(3 * i) = palette(pi); rgb(3 * i + 1) = palette(pi + 1)
          rgb(3 * i + 2) = palette(pi + 2)
          i += 1
        }
        Some(Decoded(w, h, 3, rgb))
      } else Some(Decoded(w, h, srcChannels, out))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Minimal PNG encoder (specs + synthetic media): bit depth 8, color
    * type 2 (RGB), one IDAT, per-row filter selectable — forcing each of
    * the five filter types lets a spec drive every unfilter branch of the
    * decoder through real bytes. */
  def encodePng(width: Int, height: Int, rgb: Array[Byte],
      filterForRow: Int => Int = _ => 0): Array[Byte] = {
    require(rgb.length == 3 * width * height, "rgb must be 3*w*h bytes")
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      def w32(v: Int): Unit =
        out.write(Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte))
      w32(data.length)
      val tb = typ.getBytes("US-ASCII")
      out.write(tb); out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      w32(crc.getValue.toInt)
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(width).putInt(height)
      .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    chunk("IHDR", ihdr.array())
    // filter each scanline, then deflate
    val stride = 3 * width
    val filtered = new Array[Byte]((stride + 1) * height)
    var y = 0
    while (y < height) {
      val f = filterForRow(y) match { case t if t >= 0 && t <= 4 => t; case _ => 0 }
      filtered(y * (stride + 1)) = f.toByte
      var x = 0
      while (x < stride) {
        val cur = rgb(y * stride + x) & 0xff
        val left = if (x >= 3) rgb(y * stride + x - 3) & 0xff else 0
        val up = if (y > 0) rgb((y - 1) * stride + x) & 0xff else 0
        val ul = if (x >= 3 && y > 0) rgb((y - 1) * stride + x - 3) & 0xff else 0
        val v = f match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - ((left + up) >> 1)
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up)
            val pc = math.abs(p - ul)
            cur - (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
        }
        filtered(y * (stride + 1) + 1 + x) = (v & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val deflated = {
      val d = new java.util.zip.Deflater()
      d.setInput(filtered); d.finish()
      val buf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      while (!d.finished()) buf.write(tmp, 0, d.deflate(tmp))
      d.end()
      buf.toByteArray
    }
    chunk("IDAT", deflated)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  // ---------------------------------------------------------------- BMP

  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  /** Uncompressed (BI_RGB) 24/32-bit BMP: BITMAPINFOHEADER-or-later, rows
    * bottom-up (or top-down when height < 0), 4-byte row padding, BGR(A)
    * byte order normalized to RGB. */
  def decodeBmp(bytes: Array[Byte]): Option[Decoded] = {
    try {
      if (bytes.length < 54) return None
      val dataOff = le32(bytes, 10)
      val hdrSize = le32(bytes, 14)
      if (hdrSize < 40) return None // BITMAPCOREHEADER not supported
      val w = le32(bytes, 18)
      val hRaw = le32(bytes, 22)
      val bpp = le16(bytes, 28)
      val compression = le32(bytes, 30)
      if (w <= 0 || hRaw == 0 || compression != 0 || (bpp != 24 && bpp != 32))
        return None
      val h = math.abs(hRaw)
      val topDown = hRaw < 0
      val srcBpp = bpp / 8
      val rowSize = ((w * srcBpp + 3) / 4) * 4
      if (dataOff.toLong + rowSize.toLong * h > bytes.length) return None
      val out = new Array[Byte](3 * w * h)
      var y = 0
      while (y < h) {
        val srcRow = dataOff + (if (topDown) y else h - 1 - y) * rowSize
        var x = 0
        while (x < w) {
          val s = srcRow + x * srcBpp
          val d = 3 * (y * w + x)
          out(d) = bytes(s + 2) // R  (BMP stores BGR)
          out(d + 1) = bytes(s + 1) // G
          out(d + 2) = bytes(s) // B
          x += 1
        }
        y += 1
      }
      Some(Decoded(w, h, 3, out))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  // ---------------------------------------------------------------- PNM

  /** Binary PPM (P6, RGB) / PGM (P5, gray), maxval ≤ 255. Header is ASCII
    * tokens with `#` comments; pixel data follows the single whitespace
    * after maxval. */
  def decodePnm(bytes: Array[Byte]): Option[Decoded] = {
    try {
      val channels = if (bytes(1) == '6') 3 else 1
      var pos = 2
      def nextInt(): Int = {
        // skip whitespace and comments
        var inComment = false
        while (pos < bytes.length &&
          (inComment || bytes(pos).toChar.isWhitespace || bytes(pos) == '#')) {
          if (bytes(pos) == '#') inComment = true
          else if (bytes(pos) == '\n') inComment = false
          pos += 1
        }
        var v = 0
        while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
          v = v * 10 + (bytes(pos) - '0'); pos += 1
        }
        v
      }
      val w = nextInt(); val h = nextInt(); val maxVal = nextInt()
      pos += 1 // the single whitespace byte after maxval
      if (w <= 0 || h <= 0 || maxVal <= 0 || maxVal > 255) return None
      val n = channels * w * h
      if (pos + n > bytes.length) return None
      Some(Decoded(w, h, channels,
        java.util.Arrays.copyOfRange(bytes, pos, pos + n)))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Integer area-average DOWNSCALE — the pixel-resample kernel behind
    * [[Multimodal.resizePlan]]'s metadata planning. Output dims clamp to
    * the input (never upscales, matching the plan's contract); input
    * pixel (x, y) contributes to output cell (x·ow/w, y·oh/h) (floor),
    * and each cell is the TRUNCATING integer mean of its contributors —
    * all-integer arithmetic, so a SQL oracle replays it exactly (q160).
    * With ow ≤ w the floor mapping is surjective: every output cell has
    * at least one contributor. */
  def resizeArea(d: Decoded, maxW: Int, maxH: Int): Decoded = {
    require(maxW > 0 && maxH > 0, "resize dims must be positive")
    val ow = math.min(maxW, d.width); val oh = math.min(maxH, d.height)
    val c = d.channels
    val sums = new Array[Long](ow * oh * c)
    val counts = new Array[Long](ow * oh)
    var y = 0
    while (y < d.height) {
      val oy = y * oh / d.height
      var x = 0
      while (x < d.width) {
        val ox = x * ow / d.width
        val cell = oy * ow + ox
        counts(cell) += 1
        var ch = 0
        while (ch < c) {
          sums(cell * c + ch) += d.pixels((y * d.width + x) * c + ch) & 0xff
          ch += 1
        }
        x += 1
      }
      y += 1
    }
    val out = new Array[Byte](ow * oh * c)
    var i = 0
    while (i < ow * oh) {
      var ch = 0
      while (ch < c) {
        out(i * c + ch) = (sums(i * c + ch) / counts(i)).toByte
        ch += 1
      }
      i += 1
    }
    Decoded(ow, oh, c, out)
  }

  /** Binary PPM (P6) encoder — the spec-side independent writer. */
  def encodePpm(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == 3 * width * height, "rgb must be 3*w*h bytes")
    val header = s"P6\n$width $height\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(rgb, 0, out, header.length, rgb.length)
    out
  }
}
