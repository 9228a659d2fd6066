package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic BLOOM-FILTER SEMI-JOIN PREFILTER — the runtime-filter
  * pattern (Bloom CACM 1970; the join-pruning use is the classic
  * sideways-information-passing move Spark's own
  * `spark.sql.optimizer.runtime.bloomFilter` applies) built exactly-once
  * by hand: when the build side of a semi join is too large to broadcast
  * as ROWS but its BLOOM fits in a few KB, shipping the filter to the
  * probe scan drops non-matching rows BEFORE the shuffle — at 100 TB the
  * shuffle volume saved is the whole game, and the exact join afterwards
  * removes the false positives, so the composition is EXACT BY THEOREM
  * (a Bloom filter has no false negatives: every build key sets its k
  * bits, so a probe key equal to a build key finds all k bits set).
  *
  * Positions are Kirsch–Mitzenmacher double hashing (ESA 2006: position
  * j = `(h₁ + j·h₂) mod m` keeps the k-independent-hash false-positive
  * guarantee from two hashes), with TWO pluggable hash backends — the
  * theorem and every guard are hash-agnostic, both spec-pinned:
  *
  *  - `HashXx` (PRODUCTION): h₁/h₂ = `xxhash64(key, salt·)` — the
  *    codegen'd long-mix Spark's own runtime filters use; nanoseconds
  *    per row, the right choice where the probe scan is the hot path.
  *  - `HashMd5` (ORACLE-REPLAYABLE): one md5 per key split into two
  *    48-bit halves — an order of magnitude slower per row, but a SQL
  *    oracle replays the build, the per-key pass/fail, and the
  *    false-positive census bit for bit (q241's hash gate). The
  *    ScaleSmoke pair `bloom_prefiltered_semi` / `bloom_md5_prefiltered`
  *    prices exactly this tax.
  *
  * Both are deterministic and partition-order-free (the bit array is a
  * commutative OR-fold).
  *
  * Scale shape: the build is one linear pass collapsing to ≤ m/64
  * (word, bits) rows via partial-aggregated `bit_or` — the collect is
  * bounded by the FILTER SIZE (m ≤ 2^22 ⇒ ≤ 512 KB), never the build
  * cardinality. The probe side evaluates one hash pair + k bit tests per
  * row, all codegen'd column ops against one array literal — a
  * scan-level filter, no shuffle, no state. On wide fact rows the
  * prefilter keeps the shuffle-hash semi join's exchange bytes
  * match-bounded while the plain join's grow with the probe
  * (ScaleSmoke `bloom_prefiltered_semi` vs `bloom_plain_semi`).
  */
object BloomPrefilter {

  sealed trait Hash
  /** Codegen'd xxhash64 pair — the production hot path. */
  case object HashXx extends Hash
  /** One md5 split into 48-bit halves — SQL-oracle-replayable. */
  case object HashMd5 extends Hash

  /** The (h₁, h₂) pair Kirsch–Mitzenmacher positions derive from. */
  private def halves(key: Column, salt: String, hash: Hash): (Column, Column) =
    hash match {
      case HashMd5 =>
        val h = md5(concat(key.cast("string"), lit(s"|$salt")))
        (conv(substring(h, 1, 12), 16, 10).cast("long"),
          conv(substring(h, 13, 12), 16, 10).cast("long"))
      case HashXx =>
        (xxhash64(key, lit(s"|bf1|$salt")), xxhash64(key, lit(s"|bf2|$salt")))
    }

  /** Bit position j of a key on the m-bit array:
    * `(h₁ mod m + j·(h₂ mod m)) mod m` — each hash is reduced BEFORE the
    * combine (mod distributes over +/·, so this IS Kirsch–Mitzenmacher's
    * `(h₁ + j·h₂) mod m`), keeping every intermediate ≤ 8·2^22 and the
    * arithmetic ANSI-safe for the full-range xx backend. */
  private[operators] def position(key: Column, j: Int, mBits: Int,
      salt: String, hash: Hash): Column = {
    val (h1, h2) = halves(key, salt, hash)
    val m = lit(mBits.toLong)
    pmod(pmod(h1, m) + lit(j.toLong) * pmod(h2, m), m)
  }

  /** Build the m-bit filter over `keys`: returns the packed word array
    * (little-endian bit i of word w = bit 64·w+i). Distributed OR-fold:
    * positions → (word, mask) → `bit_or` per word; the collect is ≤ m/64
    * rows by construction. */
  def buildBits(keys: DataFrame, keyCol: String, mBits: Int, kHashes: Int,
      salt: String, hash: Hash = HashXx): Array[Long] = {
    require(mBits >= 64 && mBits % 64 == 0 && mBits <= (1 << 22),
      s"mBits must be a multiple of 64 in [64, 4194304], got $mBits")
    require(kHashes >= 1 && kHashes <= 8, s"kHashes out of [1,8]: $kHashes")
    // NULL keys never equal anything in a semi join, so dropping them is
    // the correct semantics — and keeping them would NPE the word loop
    // under HashMd5 (md5(concat(NULL, …)) is NULL all the way down)
    val words = keys.filter(col(keyCol).isNotNull)
      .select(explode(array((0 until kHashes).map(j =>
        position(col(keyCol), j, mBits, salt, hash)): _*)).as("p"))
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
    * analogue), so the filter runs inside the probe scan's codegen; the
    * hash pair is materialized ONCE per row and every position is two
    * integer ops on it. */
  def mightContainFilter(df: DataFrame, keyCol: String, bits: Array[Long],
      mBits: Int, kHashes: Int, salt: String,
      hash: Hash = HashXx): DataFrame = {
    require(bits.length == mBits / 64,
      s"bits length ${bits.length} != mBits/64 = ${mBits / 64}")
    require(!df.columns.exists(_.startsWith("__bf_")),
      "input already carries __bf_-prefixed columns — the filter's temp " +
        "names would silently overwrite and drop them")
    val (h1, h2) = halves(col(keyCol), salt, hash)
    val m = lit(mBits.toLong)
    var cur = df.withColumn("__bf_bits", typedLit(bits.toSeq))
      .withColumn("__bf_h1", pmod(h1, m)).withColumn("__bf_h2", pmod(h2, m))
    var pred: Column = lit(true)
    for (j <- 0 until kHashes) {
      cur = cur.withColumn(s"__bf_p$j",
        pmod(col("__bf_h1") + lit(j.toLong) * col("__bf_h2"), m))
      pred = pred && expr(
        s"(element_at(__bf_bits, cast(shiftright(__bf_p$j, 6) as int) + 1)" +
          s" & shiftleft(1L, cast(__bf_p$j & 63 as int))) != 0")
    }
    cur.filter(pred)
      .drop(("__bf_bits" +: "__bf_h1" +: "__bf_h2" +:
        (0 until kHashes).map("__bf_p" + _)): _*)
  }

  /** EXACT semi join with the Bloom prefilter in front: prefilter the
    * probe (drops most non-matching rows at the scan), then the exact
    * `left_semi` removes false positives. Output ≡
    * `probe.join(build, probeKey === buildKey, "left_semi")` by the
    * no-false-negatives theorem — for EITHER hash backend (spec-pinned
    * on an adversarially tiny filter where false positives provably
    * occur). */
  def semiJoin(probe: DataFrame, probeKey: String, build: DataFrame,
      buildKey: String, mBits: Int, kHashes: Int, salt: String,
      hash: Hash = HashXx): DataFrame = {
    val keys = build.select(col(buildKey).as("__bf_k")).distinct()
    val bits = buildBits(keys, "__bf_k", mBits, kHashes, salt, hash)
    mightContainFilter(probe, probeKey, bits, mBits, kHashes, salt, hash)
      .join(keys.withColumnRenamed("__bf_k", probeKey), Seq(probeKey),
        "left_semi")
  }
}
