package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import java.awt.image.BufferedImage
import javax.imageio.ImageIO

/** Baseline JPEG decoder contract. The independent reference is the
  * JDK's own (libjpeg-lineage) ImageIO codec, exercised BOTH ways:
  * ImageIO decodes OUR encoder's files (exact, DC-only closed form) and
  * WE decode ImageIO's files (tolerance-bounded — IDCT implementations
  * may legitimately differ by ±1-2 per sample, T.81 only bounds decoder
  * accuracy, it does not pin bit-exact output). */
class JpegSpec extends AnyFunSuite {

  private def imageIoPixels(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO failed to read the fixture")
    val (w, h) = (img.getWidth, img.getHeight)
    val out = new Array[Int](w * h * 3)
    val gray = img.getRaster.getNumBands == 1
    var i = 0
    for (y <- 0 until h; x <- 0 until w) {
      if (gray) {
        // getRGB on TYPE_BYTE_GRAY gamma-converts linear gray to sRGB —
        // read the decoded sample itself from the raster instead
        val v = img.getRaster.getSample(x, y, 0)
        out(i) = v; out(i + 1) = v; out(i + 2) = v
      } else {
        val rgb = img.getRGB(x, y)
        out(i) = (rgb >> 16) & 0xff; out(i + 1) = (rgb >> 8) & 0xff
        out(i + 2) = rgb & 0xff
      }
      i += 3
    }
    (w, h, out)
  }

  private def writeJpeg(img: BufferedImage, quality: Float): Array[Byte] = {
    val w = ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = w.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    val bos = new java.io.ByteArrayOutputStream()
    w.setOutput(ImageIO.createImageOutputStream(bos))
    w.write(null, new javax.imageio.IIOImage(img, null, null), p)
    w.dispose()
    bos.toByteArray
  }

  test("DC-only grayscale: closed form, exact ImageIO agreement, dispatch") {
    val dc = (bx: Int, by: Int) => ((bx * 37 + by * 53) % 256 - 128, 0, 0)
    val bytes = JpegDecode.encodeJpegDcOnly(3, 2, gray = true, dc)
    val d = ImageDecode.decode(bytes).get // via the magic-byte dispatch
    assert(d.width == 24 && d.height == 16 && d.channels == 1)
    for (by <- 0 until 2; bx <- 0 until 3) {
      val expect = math.max(0, math.min(255, dc(bx, by)._1 + 128))
      for (y <- 0 until 8; x <- 0 until 8)
        assert((d.pixels((by * 8 + y) * 24 + bx * 8 + x) & 0xff) == expect,
          s"block ($bx,$by) sample ($x,$y)")
    }
    // the JDK's independent decoder agrees EXACTLY on DC-only blocks
    // (integer descale (8·dc+4)>>3 == our rounded float IDCT here)
    val (w2, h2, ref) = imageIoPixels(bytes)
    assert(w2 == 24 && h2 == 16)
    for (y <- 0 until 16; x <- 0 until 24)
      assert(ref((y * 24 + x) * 3) == (d.pixels(y * 24 + x) & 0xff),
        s"ImageIO mismatch at ($x,$y)")
  }

  test("DC-only 4:4:4 color: closed-form RGB, ImageIO within tolerance") {
    val dc = (bx: Int, by: Int) =>
      ((bx * 31 + by * 17) % 200 - 100, (bx * 13) % 120 - 60, (by * 23) % 120 - 60)
    val bytes = JpegDecode.encodeJpegDcOnly(4, 3, gray = false, dc)
    val d = JpegDecode.decodeJpeg(bytes).get
    assert(d.width == 32 && d.height == 24 && d.channels == 3)
    for (by <- 0 until 3; bx <- 0 until 4) {
      val (yv, cb, cr) = dc(bx, by)
      val (r, g, b) = JpegDecode.dcOnlyRgb(yv, cb, cr)
      val o = ((by * 8) * 32 + bx * 8) * 3 // top-left sample of the block
      assert((d.pixels(o) & 0xff) == r && (d.pixels(o + 1) & 0xff) == g &&
        (d.pixels(o + 2) & 0xff) == b, s"block ($bx,$by)")
    }
    // ImageIO's color convert may round differently by a step
    val (_, _, ref) = imageIoPixels(bytes)
    for (i <- ref.indices)
      assert(math.abs(ref(i) - (d.pixels(i) & 0xff)) <= 2, s"sample $i")
  }

  test("restart markers: interval 2 round-trips exactly and resets predictors") {
    val dc = (bx: Int, by: Int) => ((bx * 41 + by * 29) % 250 - 125, 0, 0)
    val bytes = JpegDecode.encodeJpegDcOnly(3, 3, gray = true, dc, restartInterval = 2)
    assert(bytes.sliding(2).exists(s => (s(0) & 0xff) == 0xff &&
      (s(1) & 0xff) >= 0xd0 && (s(1) & 0xff) <= 0xd7)) // RSTn really present
    val d = JpegDecode.decodeJpeg(bytes).get
    for (by <- 0 until 3; bx <- 0 until 3)
      assert((d.pixels((by * 8) * 24 + bx * 8) & 0xff) ==
        math.max(0, math.min(255, dc(bx, by)._1 + 128)), s"block ($bx,$by)")
    // ImageIO agrees on the restart-marker file too
    val (_, _, ref) = imageIoPixels(bytes)
    for (y <- 0 until 24; x <- 0 until 24)
      assert(ref((y * 24 + x) * 3) == (d.pixels(y * 24 + x) & 0xff))
  }

  test("decode ImageIO-written grayscale (full AC path) within ±2") {
    val (w, h) = (40, 24)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 5 + y * 3 + ((x * y * 7) % 31)) % 256
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bytes = writeJpeg(img, 0.95f)
    val d = JpegDecode.decodeJpeg(bytes).get
    assert(d.width == w && d.height == h && d.channels == 1)
    val (_, _, ref) = imageIoPixels(bytes)
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w)
      maxDiff = math.max(maxDiff,
        math.abs(ref((y * w + x) * 3) - (d.pixels(y * w + x) & 0xff)))
    assert(maxDiff <= 2, s"max per-sample difference $maxDiff")
  }

  test("decode ImageIO-written RGB (4:2:0 subsampled, gray content) within ±2") {
    // gray content → constant chroma plane → chroma-upsampling strategy
    // differences (replication vs interpolation) cannot affect pixels;
    // the remaining difference is pure IDCT rounding
    val (w, h) = (36, 20) // NOT multiples of 16: exercises MCU crop
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 7 + y * 11 + ((x ^ y) % 13)) % 256
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bytes = writeJpeg(img, 0.9f)
    val d = JpegDecode.decodeJpeg(bytes).get
    assert(d.width == w && d.height == h && d.channels == 3)
    val (_, _, ref) = imageIoPixels(bytes)
    var maxDiff = 0
    for (i <- ref.indices)
      maxDiff = math.max(maxDiff, math.abs(ref(i) - (d.pixels(i) & 0xff)))
    assert(maxDiff <= 2, s"max per-sample difference $maxDiff")
  }

  test("unsupported and corrupt inputs return None, never throw") {
    assert(JpegDecode.decodeJpeg("junk".getBytes) == None)
    assert(JpegDecode.decodeJpeg(Array[Byte](0xff.toByte, 0xd8.toByte)) == None)
    val good = JpegDecode.encodeJpegDcOnly(2, 2, gray = true, (_, _) => (10, 0, 0))
    assert(JpegDecode.decodeJpeg(good).isDefined)
    val truncated = good.take(good.length - 8)
    assert(JpegDecode.decodeJpeg(truncated) == None ||
      JpegDecode.decodeJpeg(truncated).isDefined == false)
    // flip SOF0 -> SOF2 (progressive): refused loudly as None
    val prog = good.clone()
    val sof = prog.indices.find(i => (prog(i) & 0xff) == 0xff &&
      i + 1 < prog.length && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sof + 1) = 0xc2.toByte
    assert(JpegDecode.decodeJpeg(prog) == None)
  }
}
