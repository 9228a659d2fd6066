package graft.multimodal

import scala.collection.mutable.ArrayBuffer

/** Pure-JVM baseline JPEG (ITU-T T.81, public standard) decoder — the
  * compressed-codec step that used to sit behind the multimodal stub
  * seam. Supports SOF0/SOF1 (baseline/extended sequential, Huffman),
  * 8-bit precision, 1- or 3-component scans, arbitrary sampling factors
  * (4:4:4 / 4:2:2 / 4:2:0 via pixel-replication upsampling), interleaved
  * single-scan files, and restart markers. Progressive (SOF2),
  * arithmetic coding, 12-bit precision, and multi-scan files return
  * None — the callers degrade exactly like any undecodable blob.
  *
  * The IDCT is the textbook separable cosine transform over a
  * StrictMath-precomputed basis (deterministic on every JVM), with
  * `round + 128 + clamp` output. For a DC-ONLY block under the flat
  * quant value 8 the output is EXACTLY `dc + 128` (the basis product is
  * `dc · (1 + 2^-52)`-ish, far from any rounding boundary for |dc| ≤
  * 1024), which is what makes [[encodeJpegDcOnly]] fixtures exactly
  * replayable in SQL — and it agrees bit-for-bit with the integer
  * `(8·dc + 4) >> 3` descale a fixed-point decoder produces, so the
  * ImageIO cross-check in JpegSpec can assert EXACT equality there.
  *
  * YCbCr→RGB uses the JFIF fixed-point constants (91881/22554/46802/
  * 116130 over 2^16) with a non-negative-numerator floor division
  * (`(v + 32768 + (256<<16)) >> 16 − 256`), so the conversion is
  * integer-exact and the oracle replays it with DuckDB `//`.
  *
  * A decoder-independent MINIMAL ENCODER ([[encodeJpegDcOnly]]) emits
  * DC-only grayscale or 4:4:4 color files (flat quant 8, custom minimal
  * Huffman tables, optional restart markers) for fixtures whose decoded
  * pixels follow a closed formula; encoder and decoder share only the
  * public constants.
  */
object JpegDecode {
  import ImageDecode.Decoded

  // zigzag index -> natural (row-major) index, T.81 Figure A.6
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // c(u)·cos((2x+1)uπ/16) — deterministic across JVMs via StrictMath
  private val Basis: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val c = if (u == 0) StrictMath.sqrt(0.5) else 1.0
    c * StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 16.0)
  }

  /** Canonical Huffman table (T.81 F.2.2.3 decode procedure). */
  private final class HuffTable(bits: Array[Int], vals: Array[Byte]) {
    require(bits.length == 16 && vals.length == bits.sum,
      "malformed huffman table")
    private val mincode = new Array[Int](17)
    private val maxcode = new Array[Int](17)
    private val valptr = new Array[Int](17)
    locally {
      var code = 0; var k = 0; var l = 1
      while (l <= 16) {
        valptr(l) = k; mincode(l) = code
        code += bits(l - 1); k += bits(l - 1)
        maxcode(l) = code - 1 // empty length: mincode-1, range skipped
        code <<= 1; l += 1
      }
    }
    def decode(r: BitReader): Int = {
      var l = 1
      var code = r.readBit()
      while (code > maxcode(l)) {
        l += 1
        require(l <= 16, "invalid huffman code")
        code = (code << 1) | r.readBit()
      }
      vals(valptr(l) + code - mincode(l)) & 0xff
    }
  }

  /** MSB-first bit reader over entropy-coded data with 0xFF00 unstuffing;
    * refuses to run past an unstuffed marker. */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var n = 0
    def readBit(): Int = {
      if (n == 0) {
        require(pos < b.length, "EOF inside entropy-coded data")
        var v = b(pos) & 0xff; pos += 1
        if (v == 0xff) {
          require(pos < b.length, "EOF after 0xFF in entropy data")
          val m = b(pos) & 0xff
          require(m == 0x00, f"marker 0xFF$m%02X inside entropy data")
          pos += 1
        }
        acc = v; n = 8
      }
      n -= 1
      (acc >> n) & 1
    }
    def receive(bits: Int): Int = {
      var v = 0; var i = 0
      while (i < bits) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    def align(): Unit = n = 0
  }

  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  private def idctBlock(coef: Array[Int], out: Array[Int]): Unit = {
    val tmp = new Array[Double](64)
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0; var u = 0
        while (u < 8) { s += coef(v * 8 + u) * Basis(u)(x); u += 1 }
        tmp(v * 8 + x) = s; x += 1
      }
      v += 1
    }
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0; var vv = 0
        while (vv < 8) { s += tmp(vv * 8 + x) * Basis(vv)(y); vv += 1 }
        val p = Math.round(s / 4.0).toInt + 128
        out(y * 8 + x) = if (p < 0) 0 else if (p > 255) 255 else p
        x += 1
      }
      y += 1
    }
  }

  /** JFIF fixed-point chroma term: floor((v + 32768) / 65536), computed
    * with a non-negative numerator so `>> 16` (and the oracle's `//`)
    * are exact. Valid for |v| ≤ 256·65536 − 32768. */
  private def fix(v: Int): Int = ((v + 32768 + (256 << 16)) >> 16) - 256

  private def clamp8(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  private final case class Comp(id: Int, hs: Int, vs: Int, tq: Int)

  def decodeJpeg(bytes: Array[Byte]): Option[Decoded] = {
    try {
      require(bytes.length > 4 && (bytes(0) & 0xff) == 0xff &&
        (bytes(1) & 0xff) == 0xd8, "not a JPEG (no SOI)")
      val qt = new Array[Array[Int]](4)
      val dcTab = new Array[HuffTable](4)
      val acTab = new Array[HuffTable](4)
      var width = 0; var height = 0
      var comps: Array[Comp] = null
      var restartInterval = 0
      var pos = 2

      def u16(o: Int): Int = ((bytes(o) & 0xff) << 8) | (bytes(o + 1) & 0xff)

      var result: Option[Decoded] = None
      while (result.isEmpty) {
        require(pos + 1 < bytes.length, "EOF before SOS/EOI")
        require((bytes(pos) & 0xff) == 0xff, "expected marker")
        while (pos < bytes.length && (bytes(pos) & 0xff) == 0xff) pos += 1 // fill bytes
        val marker = bytes(pos) & 0xff; pos += 1
        marker match {
          case 0xd9 => // EOI before SOS
            throw new IllegalArgumentException("EOI before image data")
          case 0xdb => // DQT
            val len = u16(pos); val end = pos + len; pos += 2
            while (pos < end) {
              val pq = (bytes(pos) & 0xf0) >> 4; val tq = bytes(pos) & 0x0f
              require(pq == 0, "16-bit quant tables unsupported")
              require(tq < 4, "bad quant table id")
              pos += 1
              val t = new Array[Int](64)
              var k = 0
              while (k < 64) { t(Zigzag(k)) = bytes(pos + k) & 0xff; k += 1 }
              qt(tq) = t; pos += 64
            }
          case 0xc0 | 0xc1 => // SOF0/SOF1
            val prec = bytes(pos + 2) & 0xff
            require(prec == 8, s"unsupported precision $prec")
            height = u16(pos + 3); width = u16(pos + 5)
            require(width > 0 && height > 0, "empty frame")
            val nc = bytes(pos + 7) & 0xff
            require(nc == 1 || nc == 3, s"unsupported component count $nc")
            comps = Array.tabulate(nc) { i =>
              val o = pos + 8 + 3 * i
              val c = Comp(bytes(o) & 0xff, (bytes(o + 1) & 0xf0) >> 4,
                bytes(o + 1) & 0x0f, bytes(o + 2) & 0xff)
              require(c.hs >= 1 && c.hs <= 4 && c.vs >= 1 && c.vs <= 4 &&
                c.tq < 4, "bad component spec")
              c
            }
            pos += u16(pos)
          case 0xc2 =>
            throw new IllegalArgumentException("progressive JPEG unsupported")
          case m if m >= 0xc3 && m <= 0xcf && m != 0xc4 && m != 0xc8 =>
            throw new IllegalArgumentException(f"unsupported SOF 0x$m%02X")
          case 0xc4 => // DHT
            val len = u16(pos); val end = pos + len; pos += 2
            while (pos < end) {
              val tc = (bytes(pos) & 0xf0) >> 4; val th = bytes(pos) & 0x0f
              require(tc < 2 && th < 4, "bad huffman table spec")
              val bits = Array.tabulate(16)(i => bytes(pos + 1 + i) & 0xff)
              val total = bits.sum
              val vals = java.util.Arrays.copyOfRange(bytes, pos + 17, pos + 17 + total)
              val t = new HuffTable(bits, vals)
              if (tc == 0) dcTab(th) = t else acTab(th) = t
              pos += 17 + total
            }
          case 0xdd => // DRI
            restartInterval = u16(pos + 2); pos += u16(pos)
          case 0xda => // SOS — decode the (single, interleaved) scan
            require(comps != null, "SOS before SOF")
            val ns = bytes(pos + 2) & 0xff
            require(ns == comps.length, "multi-scan JPEG unsupported")
            val scanDc = new Array[HuffTable](ns)
            val scanAc = new Array[HuffTable](ns)
            var i = 0
            while (i < ns) {
              val cs = bytes(pos + 3 + 2 * i) & 0xff
              require(comps(i).id == cs, "scan component order mismatch")
              val td = (bytes(pos + 4 + 2 * i) & 0xf0) >> 4
              val ta = bytes(pos + 4 + 2 * i) & 0x0f
              scanDc(i) = dcTab(td); scanAc(i) = acTab(ta)
              require(scanDc(i) != null && scanAc(i) != null, "missing huffman table")
              require(qt(comps(i).tq) != null, "missing quant table")
              i += 1
            }
            pos += u16(pos)
            result = Some(decodeScan(bytes, pos, width, height, comps,
              scanDc, scanAc, qt, restartInterval))
          case m if (m >= 0xe0 && m <= 0xef) || m == 0xfe => // APPn/COM
            pos += u16(pos)
          case m =>
            throw new IllegalArgumentException(f"unexpected marker 0x$m%02X")
        }
      }
      result
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  private def decodeScan(bytes: Array[Byte], start: Int, width: Int,
      height: Int, comps0: Array[Comp], scanDc: Array[HuffTable],
      scanAc: Array[HuffTable], qt: Array[Array[Int]],
      restartInterval: Int): Decoded = {
    // a single-component scan is NON-interleaved (T.81 A.2.2): blocks
    // raster-scan the component's own ceil(w/8) × ceil(h/8) grid and the
    // declared sampling factors play no role — normalize them away
    val comps = if (comps0.length == 1) comps0.map(_.copy(hs = 1, vs = 1))
                else comps0
    val hmax = comps.map(_.hs).max
    val vmax = comps.map(_.vs).max
    val mcusX = (width + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (height + 8 * vmax - 1) / (8 * vmax)
    // per-component plane at its own resolution, MCU-padded
    val planeW = comps.map(c => mcusX * 8 * c.hs)
    val planeH = comps.map(c => mcusY * 8 * c.vs)
    val planes = Array.tabulate(comps.length)(i =>
      new Array[Byte](planeW(i) * planeH(i)))
    val preds = new Array[Int](comps.length)
    val coef = new Array[Int](64)
    val px = new Array[Int](64)
    val r = new BitReader(bytes, start)
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        r.align()
        require(r.pos + 1 < bytes.length && (bytes(r.pos) & 0xff) == 0xff,
          "expected restart marker")
        val m = bytes(r.pos + 1) & 0xff
        require(m >= 0xd0 && m <= 0xd7, f"expected RSTn, got 0x$m%02X")
        require(m - 0xd0 == (mcu / restartInterval - 1) % 8,
          "restart marker out of sequence")
        r.pos += 2
        java.util.Arrays.fill(preds, 0)
      }
      val my = mcu / mcusX
      val mx = mcu % mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        val q = qt(c.tq)
        var by = 0
        while (by < c.vs) {
          var bx = 0
          while (bx < c.hs) {
            java.util.Arrays.fill(coef, 0)
            // DC
            val t = scanDc(ci).decode(r)
            require(t <= 11, "bad DC category")
            preds(ci) += extend(r.receive(t), t)
            coef(0) = preds(ci) * q(0)
            // AC
            var k = 1
            var done = false
            while (!done && k < 64) {
              val rs = scanAc(ci).decode(r)
              val run = rs >> 4
              val size = rs & 0x0f
              if (size == 0) {
                if (run == 15) k += 16 // ZRL
                else done = true // EOB
              } else {
                k += run
                require(k < 64, "AC coefficient index overflow")
                coef(Zigzag(k)) = extend(r.receive(size), size) * q(Zigzag(k))
                k += 1
              }
            }
            idctBlock(coef, px)
            val ox = (mx * c.hs + bx) * 8
            val oy = (my * c.vs + by) * 8
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                planes(ci)((oy + yy) * planeW(ci) + ox + xx) =
                  px(yy * 8 + xx).toByte
                xx += 1
              }
              yy += 1
            }
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }
    // assemble: crop + replication-upsample + color convert
    if (comps.length == 1) {
      val out = new Array[Byte](width * height)
      var y = 0
      while (y < height) {
        System.arraycopy(planes(0), y * planeW(0), out, y * width, width)
        y += 1
      }
      Decoded(width, height, 1, out)
    } else {
      val out = new Array[Byte](width * height * 3)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          def sample(ci: Int): Int = {
            val c = comps(ci)
            val sx = x * c.hs / hmax
            val sy = y * c.vs / vmax
            planes(ci)(sy * planeW(ci) + sx) & 0xff
          }
          val yv = sample(0); val cb = sample(1) - 128; val cr = sample(2) - 128
          val o = (y * width + x) * 3
          out(o) = clamp8(yv + fix(91881 * cr)).toByte
          out(o + 1) = clamp8(yv + fix(-22554 * cb - 46802 * cr)).toByte
          out(o + 2) = clamp8(yv + fix(116130 * cb)).toByte
          x += 1
        }
        y += 1
      }
      Decoded(width, height, 3, out)
    }
  }

  // ------------------------------------------------------------ encoder

  /** MSB-first bit writer with 0xFF00 stuffing; flush pads with 1s. */
  private final class BitWriter(buf: ArrayBuffer[Byte]) {
    private var acc = 0
    private var n = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        n += 1
        if (n == 8) {
          buf += acc.toByte
          if ((acc & 0xff) == 0xff) buf += 0x00.toByte
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (n > 0) put((1 << (8 - n)) - 1, 8 - n)
  }

  /** Minimal DC-only baseline encoder for exact fixtures: `wB × hB`
    * blocks, flat quant table of 8s (so a decoded DC-only block is
    * exactly `dc + 128`), minimal custom Huffman tables (nine 4-bit DC
    * category codes, one 2-bit AC EOB code), grayscale (`dc` third
    * ignored... gray uses `_1`) or 4:4:4 YCbCr. `dc(bx, by)` returns the
    * per-block (Y, Cb, Cr) DC values, each in [-128, 127]. With
    * `restartInterval > 0`, RSTn markers are emitted every that many
    * MCUs (and DC predictors reset) — exercising the decoder's restart
    * path. Encoder and decoder share no code beyond public constants. */
  def encodeJpegDcOnly(wB: Int, hB: Int, gray: Boolean,
      dc: (Int, Int) => (Int, Int, Int),
      restartInterval: Int = 0): Array[Byte] = {
    require(wB > 0 && hB > 0, "block grid must be positive")
    val buf = new ArrayBuffer[Byte](1024)
    def b(v: Int): Unit = buf += v.toByte
    def w16(v: Int): Unit = { b(v >> 8); b(v & 0xff) }
    // SOI
    b(0xff); b(0xd8)
    // DQT: table 0, flat 8s
    b(0xff); b(0xdb); w16(2 + 1 + 64); b(0x00)
    (0 until 64).foreach(_ => b(8))
    // SOF0
    val nc = if (gray) 1 else 3
    b(0xff); b(0xc0); w16(8 + 3 * nc); b(8)
    w16(hB * 8); w16(wB * 8); b(nc)
    (1 to nc).foreach { id => b(id); b(0x11); b(0) }
    // DHT: DC table 0 = nine 4-bit codes for categories 0..8;
    //      AC table 0 = one 2-bit code for EOB (0x00)
    b(0xff); b(0xc4); w16(2 + (17 + 9) + (17 + 1))
    b(0x00); val dcBits = Array(0, 0, 0, 9, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    dcBits.foreach(b); (0 to 8).foreach(b)
    b(0x10); val acBits = Array(0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    acBits.foreach(b); b(0x00)
    // DRI
    if (restartInterval > 0) { b(0xff); b(0xdd); w16(4); w16(restartInterval) }
    // SOS
    b(0xff); b(0xda); w16(6 + 2 * nc); b(nc)
    (1 to nc).foreach { id => b(id); b(0x00) }
    b(0); b(63); b(0)
    // entropy: canonical codes — DC category c = code c (4 bits); EOB = 00
    val bw = new BitWriter(buf)
    val preds = new Array[Int](nc)
    var rst = 0
    var mcu = 0
    val nMcus = wB * hB
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        bw.flush()
        b(0xff); b(0xd0 + rst); rst = (rst + 1) % 8
        java.util.Arrays.fill(preds, 0)
      }
      val bx = mcu % wB
      val by = mcu / wB
      val vals = dc(bx, by)
      var ci = 0
      while (ci < nc) {
        val v = ci match {
          case 0 => vals._1
          case 1 => vals._2
          case _ => vals._3
        }
        require(v >= -128 && v <= 127, s"DC value $v out of fixture range")
        val diff = v - preds(ci)
        preds(ci) = v
        val cat = 32 - Integer.numberOfLeadingZeros(math.abs(diff))
        bw.put(cat, 4) // DC category code
        if (cat > 0)
          bw.put(if (diff > 0) diff else diff + (1 << cat) - 1, cat)
        bw.put(0, 2) // AC EOB
        ci += 1
      }
      mcu += 1
    }
    bw.flush()
    b(0xff); b(0xd9)
    buf.toArray
  }

  /** The closed-form decode of a DC-only fixture block: Y/Cb/Cr samples
    * are exactly `dc + 128`; RGB applies the fixed-point JFIF transform.
    * The q175 oracle replays exactly this in SQL. */
  def dcOnlyRgb(ydc: Int, cbdc: Int, crdc: Int): (Int, Int, Int) = {
    val yv = ydc + 128; val cb = cbdc; val cr = crdc
    (clamp8(yv + fix(91881 * cr)),
      clamp8(yv + fix(-22554 * cb - 46802 * cr)),
      clamp8(yv + fix(116130 * cb)))
  }
}
