package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic BLOOM-FILTER SEMI-JOIN PREFILTER — the runtime-filter
  * pattern (Bloom CACM 1970; the join-pruning use is the classic
  * sideways-information-passing move Spark's own
  * `spark.sql.optimizer.runtime.bloomFilter` applies) built exactly-once
  * by hand so BOTH engines can replay every bit: when the build side of a
  * semi join is too large to broadcast as ROWS but its BLOOM fits in a
  * few KB, shipping the filter to the probe scan drops non-matching rows
  * BEFORE the shuffle — at 100 TB the shuffle volume saved is the whole
  * game, and the exact join afterwards removes the false positives, so
  * the composition is EXACT BY THEOREM (a Bloom filter has no false
  * negatives: every build key sets its k bits, so a probe key equal to a
  * build key finds all k bits set).
  *
  * Determinism: bit positions are `md5₄₈(key ∥ "|bf<j>|" ∥ salt) mod m`
  * for j = 0..k−1 — no RNG, no partition-order dependence (the bit array
  * is an OR-fold, commutative) — so a SQL oracle replays the build, the
  * probe pass/fail per key, and the false-positive census.
  *
  * Scale shape: the build is one linear pass collapsing to ≤ m/64
  * (word, bits) rows via partial-aggregated `bit_or` — the collect is
  * bounded by the FILTER SIZE (m ≤ 2^22 ⇒ ≤ 512 KB), never the build
  * cardinality. The probe side evaluates k md5s + k bit tests per row,
  * all codegen'd column ops against one array literal — a scan-level
  * filter, no shuffle, no state.
  */
object BloomPrefilter {

  /** Bit position j of a key on the m-bit array. */
  private[operators] def position(key: Column, j: Int, mBits: Int,
      salt: String): Column =
    conv(substring(md5(concat(key.cast("string"), lit(s"|bf$j|$salt"))),
      1, 12), 16, 10).cast("long") % lit(mBits.toLong)

  /** Build the m-bit filter over `keys`: returns the packed word array
    * (little-endian bit i of word w = bit 64·w+i). Distributed OR-fold:
    * positions → (word, mask) → `bit_or` per word; the collect is ≤ m/64
    * rows by construction. */
  def buildBits(keys: DataFrame, keyCol: String, mBits: Int, kHashes: Int,
      salt: String): Array[Long] = {
    require(mBits >= 64 && mBits % 64 == 0 && mBits <= (1 << 22),
      s"mBits must be a multiple of 64 in [64, 4194304], got $mBits")
    require(kHashes >= 1 && kHashes <= 8, s"kHashes out of [1,8]: $kHashes")
    val words = keys
      .select(explode(array((0 until kHashes).map(j =>
        position(col(keyCol), j, mBits, salt)): _*)).as("p"))
      .select(expr("shiftright(p, 6)").as("w"),
        expr("shiftleft(1L, cast(p & 63 as int))").as("m"))
      .groupBy(col("w")).agg(expr("bit_or(m)").as("bits"))
      .collect()
    val arr = new Array[Long](mBits / 64)
    words.foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
    arr
  }

  /** Rows of `df` whose key MIGHT be in the filter (all k bits set) —
    * guaranteed to keep every true match. `bits` ships as ONE array
    * literal into the plan (a task-constant few KB, the broadcast-scalar
    * analogue), so the filter runs inside the probe scan's codegen. */
  def mightContainFilter(df: DataFrame, keyCol: String, bits: Array[Long],
      mBits: Int, kHashes: Int, salt: String): DataFrame = {
    require(bits.length == mBits / 64,
      s"bits length ${bits.length} != mBits/64 = ${mBits / 64}")
    var cur = df.withColumn("__bf_bits", typedLit(bits.toSeq))
    var pred: Column = lit(true)
    for (j <- 0 until kHashes) {
      cur = cur.withColumn(s"__bf_p$j", position(col(keyCol), j, mBits, salt))
      pred = pred && expr(
        s"(element_at(__bf_bits, cast(shiftright(__bf_p$j, 6) as int) + 1)" +
          s" & shiftleft(1L, cast(__bf_p$j & 63 as int))) != 0")
    }
    cur.filter(pred)
      .drop(("__bf_bits" +: (0 until kHashes).map("__bf_p" + _)): _*)
  }

  /** EXACT semi join with the Bloom prefilter in front: prefilter the
    * probe (drops most non-matching rows at the scan), then the exact
    * `left_semi` removes false positives. Output ≡
    * `probe.join(build, probeKey === buildKey, "left_semi")` by the
    * no-false-negatives theorem (spec-pinned on an adversarially tiny
    * filter where false positives provably occur). */
  def semiJoin(probe: DataFrame, probeKey: String, build: DataFrame,
      buildKey: String, mBits: Int, kHashes: Int,
      salt: String): DataFrame = {
    val keys = build.select(col(buildKey).as("__bf_k")).distinct()
    val bits = buildBits(keys, "__bf_k", mBits, kHashes, salt)
    mightContainFilter(probe, probeKey, bits, mBits, kHashes, salt)
      .join(keys.withColumnRenamed("__bf_k", probeKey), Seq(probeKey),
        "left_semi")
  }
}
