package graft.multimodal

import graft.SparkSpec
import graft.multimodal.ImageDecode.Decoded
import org.apache.spark.sql.functions._

/** aHash contract. Independent references: hand-computed hashes on tiny
  * rasters (every step — gray, floor cell mapping, truncating means,
  * strict mean threshold — worked by hand), plus a brute hamming join as
  * the banding oracle. */
class PerceptualHashSpec extends SparkSpec {

  private def gray(w: Int, h: Int, vals: Seq[Int]): Decoded =
    Decoded(w, h, 1, vals.map(_.toByte).toArray)

  test("hand golden: 2x2 image, strict mean threshold") {
    // cells are the pixels themselves (w,h <= 8): values 10, 20, 30, 40
    // mean = 100 div 4 = 25 → bits at cells 2 (30) and 3 (40) = 0b1100
    val d = gray(2, 2, Seq(10, 20, 30, 40))
    assert(PerceptualHash.aHash64(d) == 12L)
  }

  test("flat image hashes to zero (strict >, no tie bits)") {
    assert(PerceptualHash.aHash64(gray(4, 4, Seq.fill(16)(77))) == 0L)
  }

  test("rgb gray conversion is the truncating channel mean") {
    // one pixel rgb (10, 20, 31) → gray (10+20+31) div 3 = 20; single
    // cell → mean = 20 → strict > fails → hash 0. Bump b to 35 in a
    // second pixel-pair image to force a set bit.
    val one = Decoded(1, 1, 3, Array[Byte](10, 20, 31))
    assert(PerceptualHash.aHash64(one) == 0L)
    val two = Decoded(2, 1, 3, Array[Byte](10, 20, 31, 40, 50, 60))
    // grays: 20, 50; mean = 35; bit 1 set → 0b10
    assert(PerceptualHash.aHash64(two) == 2L)
  }

  test("area mapping floors like resizeArea: 16 wide → 8 cells of 2") {
    // 16x1 gray ramp 0..15: cell k = pixels (2k, 2k+1) → mean = 2k (trunc)
    // total = 0+2+...+14 = 56, mean = 56 div 8 = 7 → bits at cells 4..7
    val d = gray(16, 1, 0 until 16)
    assert(PerceptualHash.aHash64(d) == 0xf0L)
  }

  test("aHashes drops undecodable blobs instead of failing the task") {
    import spark.implicits._
    val good = ImageDecode.encodePng(2, 2,
      Array[Byte](10, 10, 10, 20, 20, 20, 30, 30, 30, 40, 40, 40))
    val rows = Seq((1L, good), (2L, Array[Byte](1, 2, 3)))
      .toDF("media_id", "bytes")
    val out = PerceptualHash.aHashes(rows).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L))
    assert(out.head.getLong(1) == 12L) // same raster as the hand golden
  }

  test("nearDupPairs equals the brute hamming join (pigeonhole coverage)") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    // clustered hashes: a shared base per group of 4 ids, each member up
    // to 3 bits flipped — within-group pairs land at hamming ≤ 6, some
    // within the ≤ 3 gate, cross-group pairs far outside it
    val bases = (0 until 10).map(_ => rnd.nextLong())
    val hashes = (1L to 40L).map { i =>
      val base = bases(((i - 1) / 4).toInt)
      (i, base ^ (0 until rnd.nextInt(4))
        .map(_ => 1L << rnd.nextInt(64)).foldLeft(0L)(_ | _))
    }
    val df = hashes.toDF("id", "fp")
    val got = PerceptualHash.nearDupPairs(df, maxHamming = 3)
      .select(col("id_a"), col("id_b"), col("hamming"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = (for {
      (a, fa) <- hashes; (b, fb) <- hashes if a < b
      h = java.lang.Long.bitCount(fa ^ fb) if h <= 3
    } yield (a, b, h)).toSet
    assert(got == brute)
  }
}
