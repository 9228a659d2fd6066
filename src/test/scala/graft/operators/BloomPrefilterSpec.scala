package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BloomPrefilter contract: NO FALSE NEGATIVES (every build key passes its
  * own filter — the theorem the exact-composition equality stands on),
  * false positives occur on an adversarially tight filter AND are removed
  * by the exact semi join, and the whole construction is deterministic
  * under repartitioning. */
class BloomPrefilterSpec extends SparkSpec {
  import spark.implicits._

  private val mBits = 256 // deliberately tiny: forces false positives
  private val kH = 2

  test("no false negatives in BOTH hash backends: every build key passes its own filter") {
    val build = (1L to 200L).map(i => i * 3).toDF("k")
    for (h <- Seq(BloomPrefilter.HashXx, BloomPrefilter.HashMd5)) {
      val bits = BloomPrefilter.buildBits(build, "k", mBits, kH, "t-v1", h)
      val kept = BloomPrefilter.mightContainFilter(build, "k", bits, mBits,
        kH, "t-v1", h).count()
      assert(kept == 200L, s"$h: a Bloom filter must pass every inserted key")
    }
  }

  test("false positives occur on a tight filter and the exact join removes them (both backends)") {
    val build = (1L to 200L).map(i => i * 3).toDF("k")
    val probe = (1L to 3000L).toDF("k")
    val truth = (1L to 200L).map(_ * 3).toSet
    for (h <- Seq(BloomPrefilter.HashXx, BloomPrefilter.HashMd5)) {
      val bits = BloomPrefilter.buildBits(build, "k", mBits, kH, "t-v1", h)
      val passed = BloomPrefilter.mightContainFilter(probe, "k", bits, mBits,
          kH, "t-v1", h)
        .as[Long].collect().toSet
      assert(truth.subsetOf(passed), s"$h: prefilter dropped a true match")
      assert((passed -- truth).nonEmpty,
        s"$h: 256 bits / 200 keys must produce false positives — vacuous test")
      val exact = BloomPrefilter.semiJoin(probe, "k", build, "k", mBits, kH,
        "t-v1", h).as[Long].collect().toSet
      assert(exact == truth, s"$h: semiJoin must equal the plain semi join")
    }
  }

  test("bit array is layout-independent and the positions match the md5 formula") {
    val build = (1L to 97L).toDF("k")
    val b1 = BloomPrefilter.buildBits(build, "k", mBits, kH, "t-v2",
      BloomPrefilter.HashMd5)
    val b2 = BloomPrefilter.buildBits(build.repartition(13), "k", mBits, kH,
      "t-v2", BloomPrefilter.HashMd5)
    assert(b1.toSeq == b2.toSeq, "OR-fold must be partition-order-free")
    // independent reimplementation of the Kirsch–Mitzenmacher positions
    val md = java.security.MessageDigest.getInstance("MD5")
    def pos(key: Long, j: Int): Int = {
      val hex = md.digest(s"$key|t-v2".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val h1 = java.lang.Long.parseLong(hex.substring(0, 12), 16)
      val h2 = java.lang.Long.parseLong(hex.substring(12, 24), 16)
      ((h1 + j.toLong * h2) % mBits).toInt
    }
    val expect = new Array[Long](mBits / 64)
    for (key <- 1L to 97L; j <- 0 until kH) {
      val p = pos(key, j)
      expect(p / 64) |= (1L << (p % 64))
    }
    assert(b1.toSeq == expect.toSeq,
      "positions drifted from (h1 + j*h2) mod m over the md5 halves")
  }
}
