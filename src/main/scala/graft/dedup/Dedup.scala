package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{cosine_similarity, simhash64}

/** Deduplication operator family for training-data pipelines (required
  * engine surface beyond the reference): exact, MinHash+LSH, SimHash,
  * n-gram Jaccard, embedding near-dup.
  *
  * Scale design, common to all: never materialize all pairs. Every
  * algorithm reduces to (1) per-row signature computation (codegen'd column
  * expressions), (2) a groupBy/equi-join on a bucket key, (3) exact
  * verification only within buckets. The only shuffles are on signature
  * keys. Skew has TWO layers of defense: AQE skew splits repartition an
  * oversized shuffle partition (a physical fix), and [[capBucketMembers]]
  * bounds the MEMBER COUNT of any single bucket (an algorithmic fix) —
  * without the latter, a boilerplate-heavy corpus putting B near-identical
  * docs into one band bucket emits B² candidate pairs no matter how AQE
  * splits the partitions.
  */
object Dedup {

  /** Default per-bucket member cap for every LSH/banded candidate
    * generator. 4096 members → ≤ ~8.4M intra-bucket pairs, the same
    * executor-memory rationale as `LocalCluster.MaxGroupRows`; the
    * synthetic corpora (and any non-degenerate real bucket) sit orders of
    * magnitude below it, so results are exact unless a bucket is
    * genuinely pathological. */
  val DefaultBucketCap: Int = 4096

  /** Hybrid per-bucket cap — the guard that keeps one degenerate LSH
    * bucket (B near-identical members → B² candidate pairs) from going
    * quadratic regardless of AQE partition splitting.
    *
    * Members of each bucket (the group of `bucketCols`) are ranked by
    * (xxhash64(`idCol`), `idCol`) — hash-ordered, so the split is not
    * biased toward low ids and is identical across runs for the same id
    * set. The first `cap` members return in `kept` and flow into the
    * caller's standard intra-bucket self-join (≤ cap² pairs per bucket,
    * EXACT semantics for every bucket at or below the cap); every member
    * BEYOND the cap returns in `star` as ONE pair with the bucket's
    * rank-1 representative (ids normalized `id_a < id_b`; the payload
    * structs `pay_a`/`pay_b` swap to match), so an oversized bucket costs
    * O(B) star pairs instead of B². Because same-bucket members share the
    * band signature by construction, a boilerplate bucket of identical
    * docs still verifies member-by-member against the representative and
    * collapses to ONE canonical cluster — nothing is dropped, only
    * non-representative pairings among the tail are skipped (pairs the
    * verification stage would mostly confirm as copies of the kept ones).
    *
    * NEVER silent: the aggregated per-bucket counts carry a
    * `Dataset.observe` counter `metricName` with `demoted_members`
    * (members moved from all-pairs to star linkage) and
    * `max_bucket_members` (the pre-cap maximum), harvestable via
    * [[graft.operators.ObservedMetrics]].
    *
    * Caching: `base` (the bucketed rows) and `hot` (the oversized keys)
    * are cached — base is scanned by the count, the two split joins, and
    * the caller's self-join; there is no unpersist hook because the
    * returned frames are consumed lazily (the round-2 `banded.cache()`
    * convention: dead entries fall to Spark's LRU under memory pressure,
    * MEMORY_AND_DISK so eviction never recomputes mid-job).
    *
    * @return (kept, star): kept = (`bucketCols`*, `idCol`, `payloadCols`*);
    *         star = (`bucketCols`*, id_a, id_b, pay_a, pay_b) with
    *         pay_a/pay_b structs of `payloadCols` (a dummy field when
    *         empty — callers select only the ids). */
  def capBucketsStar(df: DataFrame, bucketCols: Seq[String], idCol: String,
      payloadCols: Seq[String], cap: Int, metricName: String)
      : (DataFrame, DataFrame) = {
    require(cap > 0, s"bucket cap must be positive, got $cap")
    val pay = if (payloadCols.nonEmpty) struct(payloadCols.map(col): _*)
              else struct(lit(0L).as("__none"))
    // Two-phase shape so the COMMON case (no bucket over the cap) pays no
    // per-row window sort: a map-side-combined count finds the oversized
    // bucket KEYS (≤ N/cap of them by pigeonhole — usually zero), and only
    // rows in those buckets go through the ranked split. The observe
    // counters ride on the aggregated counts — one row per bucket, exact.
    val base = df
      .select(bucketCols.map(col) ++ Seq(col(idCol).as("__id"), pay.as("__pay")): _*)
      .cache()
    val hot = base.groupBy(bucketCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .observe(metricName,
        sum(when(col("__n") > cap, col("__n") - cap).otherwise(0L))
          .as("demoted_members"),
        max(col("__n")).as("max_bucket_members"))
      .filter(col("__n") > cap)
      .select(bucketCols.map(col): _*)
      .cache()
    val w = Window.partitionBy(bucketCols.map(col): _*)
      .orderBy(xxhash64(col("__id")), col("__id"))
    val ranked = base.join(hot, bucketCols, "left_semi")
      .withColumn("__rn", row_number().over(w))
      .withColumn("__rep_id", first(col("__id")).over(w))
      .withColumn("__rep_pay", first(col("__pay")).over(w))
    def unpack(d: DataFrame) =
      d.select(bucketCols.map(col) ++ Seq(col("__id").as(idCol)) ++
        payloadCols.map(p => col(s"__pay.$p").as(p)): _*)
    val kept = unpack(base.join(hot, bucketCols, "left_anti"))
      .unionByName(unpack(ranked.filter(col("__rn") <= cap)))
    val star = ranked.filter(col("__rn") > cap)
      .select(bucketCols.map(col) ++ Seq(
        least(col("__id"), col("__rep_id")).as("id_a"),
        greatest(col("__id"), col("__rep_id")).as("id_b"),
        when(col("__id") < col("__rep_id"), col("__pay"))
          .otherwise(col("__rep_pay")).as("pay_a"),
        when(col("__id") < col("__rep_id"), col("__rep_pay"))
          .otherwise(col("__pay")).as("pay_b")): _*)
    (kept, star)
  }

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** Word k-shingles with short-doc guard (codegen'd single pass — the
    * interpreted `transform`+`concat_ws` spelling re-entered the
    * expression interpreter per shingle element and dominated q101's
    * explode; WordShingles pins exact parity with it). */
  def shingles(text: Column, k: Int = 3): Column =
    graft.functions.word_shingles(tokens(text), k)

  /** Salted-md5 MinHash signature (one value per salt). */
  def minhash(text: Column, salt: String, k: Int = 3): Column =
    array_min(transform(shingles(text, k), s => md5(concat(lit(salt), s))))

  /** Exact dedup: keep the minimum-id row per content hash.
    * @return (id, keep_id, is_duplicate) mapping for every input row */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val hashed = df.select(col(idCol), md5(col(textCol)).as("__h"))
    val keep = hashed.groupBy(col("__h")).agg(min(col(idCol)).as("keep_id"))
    hashed.join(keep, "__h")
      .select(col(idCol), col("keep_id"),
        (col(idCol) =!= col("keep_id")).as("is_duplicate"))
  }

  /** MinHash-LSH near-dup candidate pairs: `bands` bands × `rowsPerBand`
    * signatures; docs sharing any band bucket pair up, then exact Jaccard
    * over distinct tokens filters to ≥ `threshold`.
    * Collision probability ≈ 1 − (1 − j^rowsPerBand)^bands.
    *
    * Performance shape (this was a 72s→~2s rewrite at sf0.1): shingle
    * hashes (xxhash64, native) are computed ONCE per doc into one array;
    * each of the bands×rows minima reads that array; the signature frame is
    * cached so the self-join does not recompute it per side; candidate
    * pairs are deduped on (id_a, id_b) BEFORE tokens are re-joined for the
    * exact-Jaccard verification — token arrays never travel through the
    * band explode or the join. */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
      bands: Int = 4, rowsPerBand: Int = 2, threshold: Double = 0.5,
      bucketCap: Int = DefaultBucketCap): DataFrame =
    jaccardVerify(
      minhashLshCandidates(df, idCol, textCol, bands, rowsPerBand, bucketCap),
      df, idCol, textCol, threshold)

  /** The bucketing half of [[minhashLsh]]: distinct (id_a, id_b) pairs
    * sharing at least one band bucket. Split out so the in-bucket
    * verification ([[jaccardVerify]]) can be value-checked independently of
    * the engine-pinned xxhash64 band hashing (q97 writes these pairs to a
    * scratch table both engines read). */
  def minhashLshCandidates(df: DataFrame, idCol: String, textCol: String,
      bands: Int = 4, rowsPerBand: Int = 2,
      bucketCap: Int = DefaultBucketCap): DataFrame = {
    val (kept, star) = capBucketsStar(
      minhashBandBuckets(df, idCol, textCol, bands, rowsPerBand),
      Seq("band", "bucket"), "id", Nil, bucketCap, "minhash_bucket_cap")
    kept.select(col("band"), col("bucket"), col("id").as("id_a"))
      .join(kept.select(col("band"), col("bucket"), col("id").as("id_b")),
        Seq("band", "bucket"))
      .filter(col("id_b") > col("id_a"))
      .select(col("id_a"), col("id_b"))
      .unionByName(star.select(col("id_a"), col("id_b")))
      .distinct()
  }

  /** The (id, band, bucket) rows of [[minhashLshCandidates]]'s banding —
    * public because it doubles as the STORED INDEX of incremental dedup:
    * persist it for the existing corpus once, then [[probeIndex]] new
    * batches against it without ever touching corpus text again (the
    * 100 TB ingest shape: per-batch cost scales with the batch, not the
    * corpus). All nSig salted minima come from ONE xxhash64 pass over
    * the token array (the per-salt HOF formulation was ~10s at sf0.1). */
  def minhashBandBuckets(df: DataFrame, idCol: String, textCol: String,
      bands: Int = 4, rowsPerBand: Int = 2): DataFrame = {
    val nSig = bands * rowsPerBand
    val sigs = df.select(col(idCol).as("id"),
        graft.functions.minhash_signature(tokens(col(textCol)), nSig).as("sig"))
      .filter(size(col("sig")) > 0)
    sigs.select(col("id"),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            xxhash64((lit(b) +: (0 until rowsPerBand).map(r =>
              element_at(col("sig"), b * rowsPerBand + r + 1))): _*).as("bucket"))
        }: _*)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** Incremental near-dup candidates: band-bucket collisions of `batch`
    * against a prebuilt [[minhashBandBuckets]] index — distinct
    * (id_new, id_old) pairs. The batch side is banded fresh; the index
    * side is READ, not recomputed, and the join is an equi-join on
    * (band, bucket) — never batch × corpus. */
  def probeIndex(batch: DataFrame, idCol: String, textCol: String,
      index: DataFrame, bands: Int = 4, rowsPerBand: Int = 2): DataFrame =
    minhashBandBuckets(batch, idCol, textCol, bands, rowsPerBand)
      .select(col("band"), col("bucket"), col("id").as("id_new"))
      .join(index.select(col("band"), col("bucket"), col("id").as("id_old")),
        Seq("band", "bucket"))
      .filter(col("id_new") =!= col("id_old"))
      .select(col("id_new"), col("id_old"))
      .distinct()

  /** Fold an ingest batch INTO a persisted [[minhashBandBuckets]] index.
    * MinHash band rows are a pure per-document function (no global
    * statistics — unlike `SetSimJoin.prefixIndex`, whose rarest-first
    * order depends on corpus frequencies), so the merge is exactly the
    * union of the standing index with the batch's fresh band rows, and
    * `mergeIntoIndex(batch, index) ≡ minhashBandBuckets(corpus ∪ batch)`
    * row for row (pinned in DedupSpec). Contract: batch ids disjoint
    * from index ids (a re-ingested id would duplicate its band rows —
    * dedup with a distinct on (id, band) first if re-ingest is possible). */
  def mergeIntoBandIndex(batch: DataFrame, idCol: String, textCol: String,
      index: DataFrame, bands: Int = 4, rowsPerBand: Int = 2): DataFrame =
    index.select(col("id"), col("band"), col("bucket"))
      .unionByName(minhashBandBuckets(batch, idCol, textCol, bands, rowsPerBand))

  /** The verification half of [[minhashLsh]]: exact token-set Jaccard over
    * candidate pairs (`id_a`, `id_b`), kept when ≥ `threshold`. Token
    * arrays join in only here — they never travel through the bucketing. */
  def jaccardVerify(pairs: DataFrame, df: DataFrame, idCol: String,
      textCol: String, threshold: Double): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      array_distinct(tokens(col(textCol))).as("tok"))
    pairs.select(col("id_a"), col("id_b"))
      .join(toks.select(col("id").as("id_a"), col("tok").as("tok_a")), "id_a")
      .join(toks.select(col("id").as("id_b"), col("tok").as("tok_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("tok_a"), col("tok_b"))).cast("double")
          / size(array_union(col("tok_a"), col("tok_b")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** SimHash near-dup pairs: 64-bit fingerprints; candidates share at least
    * one of 4 16-bit chunks (any pair within hamming distance ≤ `maxHamming`
    * ≤ 3 necessarily collides on some chunk — pigeonhole); exact hamming
    * check within buckets. */
  def simhashNearDup(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, bucketCap: Int = DefaultBucketCap): DataFrame =
    hammingVerify(simhashCandidates(df, idCol, textCol, bucketCap), maxHamming)

  /** The bucketing half of [[simhashNearDup]]: distinct candidate pairs
    * carrying both fingerprints, so the hamming verification can be
    * value-checked from a scratch table (q98) without DuckDB re-deriving
    * the engine-pinned FNV-1a64 fingerprints. */
  def simhashCandidates(df: DataFrame, idCol: String, textCol: String,
      bucketCap: Int = DefaultBucketCap): DataFrame =
    fingerprintCandidates(
      df.select(col(idCol).as("id"), simhash64(tokens(col(textCol))).as("fp")),
      bucketCap)

  /** The fingerprint-agnostic banding core of [[simhashCandidates]]:
    * candidate pairs for ANY (id, fp) 64-bit fingerprint frame via the
    * 4×16-bit chunk pigeonhole (hamming ≤ 3 ⇒ some chunk equal) with the
    * hot-bucket star cap. Shared by SimHash text near-dup and the
    * perceptual image aHash ([[graft.multimodal.PerceptualHash]]). */
  def fingerprintCandidates(fp: DataFrame,
      bucketCap: Int = DefaultBucketCap): DataFrame = {
    val (kept, star) = capBucketsStar(
      fp.select(col("id"), col("fp"),
        explode(array((0 until 4).map(i =>
          struct(lit(i).as("chunk"),
            shiftrightunsigned(col("fp"), i * 16).bitwiseAND(lit(0xffffL)).as("key"))): _*)).as("ck"))
        .select(col("id"), col("fp"), col("ck.chunk").as("chunk"), col("ck.key").as("key")),
      Seq("chunk", "key"), "id", Seq("fp"), bucketCap, "simhash_bucket_cap")
    val a = kept.select(col("chunk"), col("key"), col("id").as("id_a"), col("fp").as("fp_a"))
    val b = kept.select(col("chunk"), col("key"), col("id").as("id_b"), col("fp").as("fp_b"))
    a.join(b, Seq("chunk", "key"))
      .filter(col("id_b") > col("id_a"))
      .select(col("id_a"), col("id_b"), col("fp_a"), col("fp_b"))
      .unionByName(star.select(col("id_a"), col("id_b"),
        col("pay_a.fp").as("fp_a"), col("pay_b.fp").as("fp_b")))
      .distinct()
  }

  /** The verification half of [[simhashNearDup]]: exact hamming distance
    * over candidate fingerprint pairs, kept when ≤ `maxHamming`. */
  def hammingVerify(pairs: DataFrame, maxHamming: Int): DataFrame =
    pairs.select(col("id_a"), col("id_b"),
        bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)

  /** Near-dup CANONICALIZATION — the cluster-level completion of pairwise
    * near-dup detection: verified pairs are edges of a similarity graph;
    * its connected components are duplicate clusters; each document maps to
    * the cluster's smallest id. Pairwise keep/drop decisions are wrong for
    * transitive chains (A≈B, B≈C, A̸≈C must still collapse to one
    * representative) — training-data dedup keeps one doc PER CLUSTER.
    *
    * Scale: components come from [[graft.operators.ConnectedComponents]]
    * (star contraction above the local threshold), so the only shuffles are
    * the shrinking edge list; docs in no pair stay their own keep_id via
    * the left join.
    *
    * @return (`idCol`, keep_id, is_duplicate) for EVERY input row */
  def canonicalize(verifiedPairs: DataFrame, df: DataFrame, idCol: String): DataFrame = {
    val edges = verifiedPairs.select(col("id_a").as("src"), col("id_b").as("dst"))
    val comp = graft.operators.ConnectedComponents.components(edges)
    df.select(col(idCol))
      .join(comp, col(idCol) === col("id"), "left")
      .select(col(idCol),
        coalesce(col("component"), col(idCol)).as("keep_id"),
        (coalesce(col("component"), col(idCol)) =!= col(idCol)).as("is_duplicate"))
  }

  /** [[canonicalize]] with the PRODUCTION keep-rule: each duplicate
    * cluster keeps its highest-`scoreCol` member (longest / best-quality
    * document — what a real pretraining dedup retains) instead of the
    * smallest id; ties break to the smallest id so the choice is total.
    * One extra aggregate + broadcast-friendly join over the per-component
    * argmax (a row per CLUSTER, not per document) on top of the
    * [[canonicalize]] shuffles. `scoreCol` must be orderable; the
    * argmax is max(struct(score, −id)).
    *
    * @return (`idCol`, keep_id, is_duplicate) for EVERY input row */
  def canonicalizeBy(verifiedPairs: DataFrame, df: DataFrame, idCol: String,
      scoreCol: String): DataFrame = {
    val edges = verifiedPairs.select(col("id_a").as("src"), col("id_b").as("dst"))
    val comp = graft.operators.ConnectedComponents.components(edges)
    val member = df.select(col(idCol), col(scoreCol))
      .join(comp, col(idCol) === col("id"), "left")
      .select(col(idCol), col(scoreCol),
        coalesce(col("component"), col(idCol)).as("component"))
    val best = member.groupBy(col("component"))
      .agg(max(struct(col(scoreCol), (-col(idCol)).as("neg_id"))).as("b"))
      .select(col("component"), (-col("b.neg_id")).as("keep_id"))
    member.join(best, "component")
      .select(col(idCol), col("keep_id"),
        (col("keep_id") =!= col(idCol)).as("is_duplicate"))
  }

  /** MinHash-LSH near-dup end to end at cluster granularity:
    * [[minhashLshCandidates]] → [[jaccardVerify]] → [[canonicalize]]. */
  def nearDupCanonical(df: DataFrame, idCol: String, textCol: String,
      bands: Int = 4, rowsPerBand: Int = 2, threshold: Double = 0.5,
      bucketCap: Int = DefaultBucketCap): DataFrame =
    canonicalize(
      minhashLsh(df, idCol, textCol, bands, rowsPerBand, threshold, bucketCap),
      df, idCol)

  /** Embedding cosine near-dup within coarse buckets (IVF-style): only
    * same-bucket pairs are scored. `bucketCol` is any coarse assignment
    * (cluster label, LSH band of the vector, shard key).
    *
    * Float policy: the threshold compares the similarity ROUNDED to 9
    * decimals (`oround`, the DuckDB-parity rounding), not the raw double —
    * a last-bit difference between two engines' cosine accumulations can
    * otherwise flip a pair sitting within 1 ulp of the threshold. 9
    * decimals is far below any semantic tolerance and collapses the
    * fragile zone from "within 1 ulp of the threshold" to "within 1 ulp
    * of a 0.5e-9 rounding boundary". */
  def embeddingNearDup(df: DataFrame, idCol: String, vecCol: String,
      bucketCol: String, threshold: Double,
      bucketCap: Int = DefaultBucketCap): DataFrame = {
    val (kept, star) = capBucketsStar(
      df.select(col(bucketCol).as("bucket"), col(idCol).as("id"), col(vecCol).as("vec")),
      Seq("bucket"), "id", Seq("vec"), bucketCap, "embedding_bucket_cap")
    val a = kept.select(col("bucket"), col("id").as("id_a"), col("vec").as("vec_a"))
    val b = kept.select(col("bucket"), col("id").as("id_b"), col("vec").as("vec_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_b") > col("id_a"))
      .select(col("id_a"), col("id_b"), col("vec_a"), col("vec_b"))
      .unionByName(star.select(col("id_a"), col("id_b"),
        col("pay_a.vec").as("vec_a"), col("pay_b.vec").as("vec_b")))
      .select(col("id_a"), col("id_b"),
        cosine_similarity(col("vec_a"), col("vec_b")).as("sim"))
      .filter(graft.queries.oround(col("sim"), 9) >= threshold)
  }
}
