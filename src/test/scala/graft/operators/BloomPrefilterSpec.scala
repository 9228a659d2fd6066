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

  test("no false negatives: every build key passes its own filter") {
    val build = (1L to 200L).map(i => i * 3).toDF("k")
    val bits = BloomPrefilter.buildBits(build, "k", mBits, kH, "t-v1")
    val kept = BloomPrefilter.mightContainFilter(build, "k", bits, mBits,
      kH, "t-v1").count()
    assert(kept == 200L, "a Bloom filter must pass every inserted key")
  }

  test("false positives occur on a tight filter and the exact join removes them") {
    val build = (1L to 200L).map(i => i * 3).toDF("k")
    val probe = (1L to 3000L).toDF("k")
    val bits = BloomPrefilter.buildBits(build, "k", mBits, kH, "t-v1")
    val passed = BloomPrefilter.mightContainFilter(probe, "k", bits, mBits,
        kH, "t-v1")
      .as[Long].collect().toSet
    val truth = (1L to 200L).map(_ * 3).toSet
    assert(truth.subsetOf(passed), "prefilter dropped a true match")
    assert((passed -- truth).nonEmpty,
      "256 bits / 200 keys must produce false positives — the test is vacuous")
    val exact = BloomPrefilter.semiJoin(probe, "k", build, "k", mBits, kH,
      "t-v1").as[Long].collect().toSet
    assert(exact == truth, "semiJoin must equal the plain semi join")
  }

  test("bit array is layout-independent and the positions match the md5 formula") {
    val build = (1L to 97L).toDF("k")
    val b1 = BloomPrefilter.buildBits(build, "k", mBits, kH, "t-v2")
    val b2 = BloomPrefilter.buildBits(build.repartition(13), "k", mBits, kH,
      "t-v2")
    assert(b1.toSeq == b2.toSeq, "OR-fold must be partition-order-free")
    // independent reimplementation of the position arithmetic
    val md = java.security.MessageDigest.getInstance("MD5")
    def pos(key: Long, j: Int): Int = {
      val hex = md.digest(s"$key|bf$j|t-v2".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 12)
      (java.lang.Long.parseLong(hex, 16) % mBits).toInt
    }
    val expect = new Array[Long](mBits / 64)
    for (key <- 1L to 97L; j <- 0 until kH) {
      val p = pos(key, j)
      expect(p / 64) |= (1L << (p % 64))
    }
    assert(b1.toSeq == expect.toSeq, "positions drifted from md5₄₈ mod m")
  }
}
