package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Perceptual NEAR-duplicate hashing for images — the average-hash
  * (aHash) family: blob-level hashing (q169's pixelFingerprint) collapses
  * only byte-identical rasters, but re-encoded / lightly-retouched copies
  * differ in a few pixels while remaining the same PICTURE. aHash maps
  * every image to 64 bits of coarse luminance structure, so perceptual
  * duplicates land within a small hamming distance — the image-side twin
  * of SimHash over text (q57), and it reuses the exact same banded
  * candidate machinery (`Dedup.fingerprintCandidates`: 4×16-bit chunk
  * pigeonhole, hot-bucket star cap, hamming verify).
  *
  * Definition (every step integer, replayable in SQL):
  *  1. gray(x, y) = (r + g + b) div 3 per ORIGINAL pixel (1-channel
  *     images use the value, RGBA ignores alpha);
  *  2. area-resize the gray raster to ≤8×8 cells: cell value =
  *     Σ grays div count (the `ImageDecode.resizeArea` floor mapping
  *     `ox = x·ow div w`);
  *  3. mean = Σ cell values div (ow·oh) — truncating;
  *  4. bit (oy·ow + ox) = 1 iff cell > mean (STRICT: a flat image
  *     hashes to 0, and ties never depend on float rounding).
  *
  * Scale shape: one decode pass per blob on bounded-blob partitions
  * (the Multimodal batch contract), a 64-bit long per image after that —
  * candidate generation and verification never touch pixels again. */
object PerceptualHash {

  /** aHash of a decoded raster. Bit i = cell (i div ow, i mod ow). */
  def aHash64(d: ImageDecode.Decoded): Long = {
    val ow = math.min(8, d.width); val oh = math.min(8, d.height)
    val sums = new Array[Long](ow * oh)
    val counts = new Array[Long](ow * oh)
    val c = d.channels
    var y = 0
    while (y < d.height) {
      val oy = y * oh / d.height
      var x = 0
      while (x < d.width) {
        val ox = x * ow / d.width
        val p = (y * d.width + x) * c
        val gray =
          if (c >= 3)
            ((d.pixels(p) & 0xff) + (d.pixels(p + 1) & 0xff) +
              (d.pixels(p + 2) & 0xff)) / 3
          else d.pixels(p) & 0xff
        sums(oy * ow + ox) += gray
        counts(oy * ow + ox) += 1
        x += 1
      }
      y += 1
    }
    val cells = new Array[Long](ow * oh)
    var i = 0
    var total = 0L
    while (i < cells.length) {
      cells(i) = sums(i) / counts(i)
      total += cells(i)
      i += 1
    }
    val mean = total / cells.length
    var hash = 0L
    i = 0
    while (i < cells.length) {
      if (cells(i) > mean) hash |= 1L << i
      i += 1
    }
    hash
  }

  private val outSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("fp", LongType)))

  /** (media_id, bytes) → (id, fp): decode through the real codec walk,
    * undecodable blobs drop (the sentinel-row convention — a near-dup
    * pass has nothing to say about bytes it cannot read). */
  def aHashes(media: DataFrame, idCol: String = "media_id",
      bytesCol: String = "bytes"): DataFrame =
    media.select(col(idCol).cast("long").as("__id"), col(bytesCol).as("__b"))
      // NULL ids/blobs drop here, not NPE inside decode — the same
      // degradation the doc promises for undecodable bytes
      .filter(col("__id").isNotNull && col("__b").isNotNull)
      .mapPartitions { it =>
        it.flatMap { r =>
          ImageDecode.decode(r.getAs[Array[Byte]]("__b"))
            .map(d => Row(r.getLong(0), aHash64(d)))
        }
      }(Encoders.row(outSchema))

  /** Perceptual near-dup pairs: banded candidates (hamming ≤ 3 pigeonhole
    * over 4×16-bit chunks) + exact popcount verify — `(id_a, id_b,
    * hamming)` for pairs within `maxHamming`. */
  def nearDupPairs(hashes: DataFrame, maxHamming: Int = 3,
      bucketCap: Int = graft.dedup.Dedup.DefaultBucketCap): DataFrame =
    graft.dedup.Dedup.hammingVerify(
      graft.dedup.Dedup.fingerprintCandidates(hashes, bucketCap), maxHamming)
}
