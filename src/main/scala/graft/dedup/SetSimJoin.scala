package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT all-pairs set-similarity join with prefix filtering — the
  * PPJoin family (Chaudhuri, Ganti & Kaushik ICDE 2006's SSJoin;
  * Xiao et al. WWW 2008): every document pair whose distinct-shingle
  * Jaccard meets the threshold, WITHOUT the O(n²) all-pairs join and
  * WITHOUT the false negatives LSH trades away (q56's MinHash banding is
  * the probabilistic sibling; this is the exact one a contract-bound
  * dedup needs).
  *
  * Prefix-filter theorem: order each document's shingles by ascending
  * GLOBAL frequency (rarest first, ties by shingle string); a pair with
  * `J(a, b) ≥ t` must share at least one shingle inside each side's
  * first `|d| − ⌈t·|d|⌉ + 1` shingles — so equi-joining on prefix
  * shingles alone generates a candidate superset (NO false negatives),
  * and exact verification of the bounded candidate set gives the exact
  * answer. Every boundary is integer: the prefix length uses the ppm
  * ceiling `(t_ppm·sz + 999999) div 10^6`, and the final test is the
  * cross-multiplied `i·10^6 ≥ t_ppm·(n_a + n_b − i)` — no float ever
  * ranks or thresholds.
  *
  * Scale shape: the frequency order makes prefixes the RAREST shingles,
  * so candidate buckets are small on any natural corpus — the quadratic
  * work concentrates exactly where matches are plausible. One groupBy
  * builds the frequency table; the per-doc prefix is a window bounded by
  * document length; verification is two equi-joins per candidate pair.
  * Degenerate bound (documented, inherent to EXACTNESS): on a corpus of
  * N verbatim-identical documents the ANSWER is C(N, 2) pairs, so no
  * exact algorithm beats quadratic OUTPUT there — the capped/approximate
  * path for such corpora is `Dedup.capBucketsStar` + canonicalization.
  */
object SetSimJoin {

  /** All pairs (id_a < id_b) with distinct-`shingleK`-shingle Jaccard
    * ≥ `tPpm`/10^6. Output: (id_a, id_b, i_n, u_n, jac_ppm), exact. */
  def jaccardJoin(docs: DataFrame, idCol: String, textCol: String,
      tPpm: Long, shingleK: Int = 3): DataFrame = {
    require(tPpm > 0 && tPpm <= 1000000L, s"tPpm out of (0, 1e6]: $tPpm")
    // shuffle_hash hints on every shingle-carrying side: these frames are
    // corpus-sized (one row per distinct shingle instance), so at scale
    // they could never broadcast — and at bench scale letting the
    // optimizer broadcast them costs a driver collect + hash build of
    // ~10^5 string rows PER JOIN (measured: 8.3s → ~3s warm at sf0.1)
    val toks = docs.select(col(idCol).cast("long").as("id"),
      explode(array_distinct(graft.functions.word_shingles(
        split(col(textCol), " "), shingleK))).as("tok"))
      .hint("shuffle_hash")
    val freq = toks.groupBy(col("tok")).agg(count(lit(1)).as("f"))
      .hint("shuffle_hash")
    val wDoc = Window.partitionBy(col("id")).orderBy(col("f"), col("tok"))
    val prefix = toks.join(freq, "tok")
      .withColumn("pos", row_number().over(wDoc))
      .withColumn("sz", count(lit(1)).over(Window.partitionBy(col("id"))))
      .filter(col("pos") <=
        col("sz") - expr(s"(${tPpm}L * sz + 999999) div 1000000") + 1)
      .select(col("id"), col("tok"), col("sz"), col("pos"))
      .hint("shuffle_hash")
    // PPJoin LENGTH filter (exact pruning, theorem-preserving):
    // J(a,b) ≥ t ⇒ i ≥ t·u ≥ t·max(|a|,|b|) and i ≤ min(|a|,|b|), so
    // 10^6·min < t_ppm·max cannot reach the threshold — dropped BEFORE
    // the distinct and the two intersection joins. On same-length
    // corpora it prunes little; on the heterogeneous-length corpora a
    // 100 TB dedup actually sees, it removes the long-vs-short candidate
    // mass the prefix filter alone admits.
    //
    // PPJoin POSITIONAL filter (Xiao et al. WWW 2008 §3.2, adapted to the
    // set-based shape; exact pruning like the length filter): all
    // documents order their shingles by the same global total order
    // (f asc, tok asc), so for a shared prefix shingle at positions
    // (p_a, p_b) the overlap decomposes around it —
    //   shared before it ≤ min(p_a, p_b) − 1   (consistent order),
    //   the shingle itself = 1,
    //   shared after it  ≤ min(sz_a − p_a, sz_b − p_b)
    // — giving i ≤ min(p_a, p_b) + min(sz_a − p_a, sz_b − p_b) =: ub for
    // EVERY shared prefix shingle; the candidate keeps the tightest one.
    // J ≥ t ⟺ i·(10^6 + t_ppm) ≥ t_ppm·(sz_a + sz_b), so a pair whose ub
    // falls below that line cannot pass the exact verify and is dropped
    // BEFORE the two corpus-sized intersection joins (the grouping
    // replaces the old distinct — same shuffle, strictly fewer surviving
    // candidates).
    val cand = prefix.select(col("id").as("id_a"), col("tok"),
        col("sz").as("sz_a"), col("pos").as("pos_a"))
      .join(prefix.select(col("id").as("id_b"), col("tok"),
        col("sz").as("sz_b"), col("pos").as("pos_b")), "tok")
      .filter(col("id_a") < col("id_b") &&
        lit(tPpm) * greatest(col("sz_a"), col("sz_b")) <=
          lit(1000000L) * least(col("sz_a"), col("sz_b")))
      .groupBy(col("id_a"), col("id_b"))
      .agg(
        min(least(col("pos_a"), col("pos_b")) +
          least(col("sz_a") - col("pos_a"),
            col("sz_b") - col("pos_b"))).as("ub"),
        // sz is functionally dependent on the id — min is just "the value"
        min(col("sz_a")).as("sz_a"), min(col("sz_b")).as("sz_b"))
      .filter(col("ub") * lit(1000000L + tPpm) >=
        lit(tPpm) * (col("sz_a") + col("sz_b")))
      .select(col("id_a"), col("id_b"))
    // Exact verification by PER-PAIR set intersection over the documents'
    // collected shingle sets (r17; was an exploded intersection join —
    // cand ⋈ toks ⋈ toks + a (id_a, id_b) groupBy — that pushed
    // Σ_pairs n_a shingle ROWS through two exchanges and a corpus-pair
    // aggregation; at sf0.1 that is ~18M rows for 310K candidates).
    // Here each doc contributes ONE array row; the intersection count is
    // a single codegen'd array_intersect per candidate — the same bytes
    // move through the two candidate joins, but as 310K rows instead of
    // 18M, and the verify-side groupBy disappears. Exactness unchanged:
    // toks is array_distinct'd, so |array_intersect| IS i_n (order
    // inside collect_list is irrelevant to a set intersection size).
    val docSets = toks.groupBy(col("id"))
      .agg(collect_list(col("tok")).as("ts"), count(lit(1)).as("n"))
    cand
      .join(docSets.select(col("id").as("id_a"), col("ts").as("ts_a"),
        col("n").as("n_a")).hint("shuffle_hash"), "id_a")
      .join(docSets.select(col("id").as("id_b"), col("ts").as("ts_b"),
        col("n").as("n_b")).hint("shuffle_hash"), "id_b")
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("ts_a"), col("ts_b"))).cast("long").as("i_n"),
        col("n_a"), col("n_b"))
      .filter(col("i_n") * 1000000L >=
        lit(tPpm) * (col("n_a") + col("n_b") - col("i_n")))
      .select(col("id_a"), col("id_b"), col("i_n"),
        (col("n_a") + col("n_b") - col("i_n")).as("u_n"),
        expr("(i_n * 1000000) div (n_a + n_b - i_n)").as("jac_ppm"))
  }

  /** Persistable EXACT-dedup index over a corpus — ONE frame holding
    * every distinct shingle instance with the metadata the probe needs:
    * `(id, tok, f, n, is_prefix)` (corpus shingle frequency, the
    * document's set size, and whether the shingle falls in the
    * document's threshold prefix). The incremental twin of
    * `Dedup.minhashBandBuckets` for the exact path: build once, persist,
    * probe each ingest batch against it. */
  def prefixIndex(docs: DataFrame, idCol: String, textCol: String,
      tPpm: Long, shingleK: Int = 3): DataFrame = {
    require(tPpm > 0 && tPpm <= 1000000L, s"tPpm out of (0, 1e6]: $tPpm")
    val toks = docs.select(col(idCol).cast("long").as("id"),
      explode(array_distinct(graft.functions.word_shingles(
        split(col(textCol), " "), shingleK))).as("tok"))
      .hint("shuffle_hash")
    val freq = toks.groupBy(col("tok")).agg(count(lit(1)).as("f"))
      .hint("shuffle_hash")
    val wDoc = Window.partitionBy(col("id")).orderBy(col("f"), col("tok"))
    toks.join(freq, "tok")
      .withColumn("pos", row_number().over(wDoc))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("id"))))
      .select(col("id"), col("tok"), col("f"), col("n"),
        (col("pos") <=
          col("n") - expr(s"(${tPpm}L * n + 999999) div 1000000") + 1)
          .as("is_prefix"),
        // the build threshold travels WITH the index (RLE-compressed to
        // nothing on disk): prefixes computed under one threshold are
        // meaningless to a probe or merge at another, and the frame is
        // plain parquet with nowhere else to carry the contract
        lit(tPpm).as("t_ppm"))
  }

  /** Fail fast when a persisted index's build threshold disagrees with
    * the caller's: `is_prefix` under a different threshold voids the
    * no-false-negative theorem SILENTLY (missed pairs, not errors).
    * One 1-row collect; an empty index passes vacuously. */
  private def requireSameThreshold(index: DataFrame, tPpm: Long): Unit = {
    val stored = index.select(col("t_ppm")).limit(1).collect()
    require(stored.isEmpty || stored(0).getLong(0) == tPpm,
      s"index built with t_ppm=${stored.headOption.map(_.getLong(0)).orNull}, " +
        s"probed/merged with t_ppm=$tPpm")
  }

  /** Fold an ingest batch INTO a persisted [[prefixIndex]] — the
    * index-maintenance path that closes the rebuild-per-cycle gap: the
    * merged frame is ROW-IDENTICAL to `prefixIndex(corpus ∪ batch)`
    * (pinned in SetSimJoinSpec and by q217's oracle, whose SQL replays
    * the rebuild), so a probe against the merged index ≡ a probe against
    * a full rebuild, with NO staleness bound to carry.
    *
    * Why exact equivalence is affordable: corpus shingle frequencies
    * only enter the index through each document's rarest-first ORDER,
    * and a batch changes the frequency of exactly the shingles it
    * contains. So only three row groups can differ from a rebuild:
    *  - batch documents (derived fresh under the merged frequencies),
    *  - TOUCHED corpus documents — those sharing ≥ 1 shingle with the
    *    batch, whose rarest-first order may have shifted (re-derived
    *    from their stored (id, tok) rows; one window per doc),
    *  - every row's `f` for batch-touched shingles (a broadcast-sized
    *    delta added in).
    * Untouched documents' rows pass through VERBATIM — no re-shingling,
    * no text access; the merge never reads the original corpus. Cost is
    * batch + the index rows of touched documents. On a natural corpus
    * prefixes are rare shingles but documents share COMMON ones, so the
    * touched set is the honest price of exact frequency parity; the
    * worst case (a batch containing a universal stopword shingle
    * touches every document) degrades to an index-sized window pass —
    * still cheaper than a rebuild (no corpus scan, no re-shingle).
    * Measured at 20× in ScaleSmoke (`setsim_index_merge` vs
    * `setsim_index_rebuild`, fixed batch): merge wall grows 2.1× while
    * the rebuild grows 3.4× — at bench scale the absolute walls are
    * close because the exploded shingle index dwarfs the tiny document
    * text, but the corpus-text read the merge never performs is the
    * dominant cost at 100 TB.
    *
    * Contract (same as [[probePrefixIndex]]): batch ids are disjoint
    * from index ids — re-ingesting an existing id would double-count
    * its shingle frequencies. */
  def mergeIntoIndex(batch: DataFrame, idCol: String, textCol: String,
      index: DataFrame, tPpm: Long, shingleK: Int = 3): DataFrame = {
    require(tPpm > 0 && tPpm <= 1000000L, s"tPpm out of (0, 1e6]: $tPpm")
    requireSameThreshold(index, tPpm)
    val bt = batch.select(col(idCol).cast("long").as("id"),
      explode(array_distinct(graft.functions.word_shingles(
        split(col(textCol), " "), shingleK))).as("tok"))
      .hint("shuffle_hash")
    val delta = bt.groupBy(col("tok")).agg(count(lit(1)).as("fd"))
    val mergedFreq = index.select(col("tok"), col("f")).distinct()
      .join(delta, Seq("tok"), "full_outer")
      .select(col("tok"),
        (coalesce(col("f"), lit(0L)) + coalesce(col("fd"), lit(0L))).as("f"))
      .hint("shuffle_hash")
    val touchedIds = index.join(delta.select(col("tok")), Seq("tok"), "left_semi")
      .select(col("id")).distinct()
    val untouched = index.join(touchedIds, Seq("id"), "left_anti")
      .select(col("id"), col("tok"), col("f"), col("n"), col("is_prefix"),
        col("t_ppm"))
    // identical derivation to prefixIndex, but over stored (id, tok)
    // rows + the merged frequency table instead of a corpus re-shingle
    def derive(rows: DataFrame): DataFrame = {
      val wDoc = Window.partitionBy(col("id")).orderBy(col("f"), col("tok"))
      rows.join(mergedFreq, "tok")
        .withColumn("pos", row_number().over(wDoc))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("id"))))
        .select(col("id"), col("tok"), col("f"), col("n"),
          (col("pos") <=
            col("n") - expr(s"(${tPpm}L * n + 999999) div 1000000") + 1)
            .as("is_prefix"),
          lit(tPpm).as("t_ppm"))
    }
    val touchedRows = derive(index.join(touchedIds, Seq("id"), "left_semi")
      .select(col("id"), col("tok")).hint("shuffle_hash"))
    untouched.unionByName(touchedRows).unionByName(derive(bt))
  }

  /** Probe a NEW batch against a persisted [[prefixIndex]]: all pairs
    * (batch doc, INDEXED doc) with Jaccard ≥ `tPpm`/10^6 — per-batch
    * cost tracks the batch and the index rows its prefix shingles touch,
    * never a corpus re-shingle (q194's ingest shape for the exact path).
    *
    * Batch shingles order by the INDEX frequency, with unseen shingles
    * at f = 0 (rarest-first). That is a consistent extension of the
    * fixed global order the index prefixes were built under — common
    * shingles carry the same f, unseen shingles occur on the batch side
    * only — so the no-false-negative prefix theorem holds ACROSS the
    * batch/corpus boundary. Output: (new_id, old_id, i_n, u_n, jac_ppm),
    * exact. */
  def probePrefixIndex(batch: DataFrame, idCol: String, textCol: String,
      index: DataFrame, tPpm: Long, shingleK: Int = 3): DataFrame = {
    require(tPpm > 0 && tPpm <= 1000000L, s"tPpm out of (0, 1e6]: $tPpm")
    requireSameThreshold(index, tPpm)
    val bt = batch.select(col(idCol).cast("long").as("new_id"),
      explode(array_distinct(graft.functions.word_shingles(
        split(col(textCol), " "), shingleK))).as("tok"))
      .hint("shuffle_hash")
    val freq = index.select(col("tok"), col("f")).distinct()
      .hint("shuffle_hash")
    val wDoc = Window.partitionBy(col("new_id"))
      .orderBy(col("f0"), col("tok"))
    val bPrefix = bt.join(freq, Seq("tok"), "left")
      .withColumn("f0", coalesce(col("f"), lit(0L)))
      .withColumn("pos", row_number().over(wDoc))
      .withColumn("bn", count(lit(1)).over(
        Window.partitionBy(col("new_id"))))
      .filter(col("pos") <=
        col("bn") - expr(s"(${tPpm}L * bn + 999999) div 1000000") + 1)
      .select(col("new_id"), col("tok"), col("bn"))
    // new_id =!= old_id: re-ingesting an id already present in the index
    // must not emit the trivial self-pair (jac_ppm = 1e6) — the caller's
    // contract is pairs BETWEEN the batch and the standing corpus.
    // Length filter as in jaccardJoin: J ≥ t bounds the size ratio, so
    // mismatched-size candidates drop before the intersection joins.
    val cand = bPrefix
      .join(index.filter(col("is_prefix"))
        .select(col("id").as("old_id"), col("tok"), col("n").as("n_o")),
        "tok")
      .filter(col("new_id") =!= col("old_id") &&
        lit(tPpm) * greatest(col("bn"), col("n_o")) <=
          lit(1000000L) * least(col("bn"), col("n_o")))
      .select(col("new_id"), col("old_id")).distinct()
    val bSizes = bt.groupBy(col("new_id")).agg(count(lit(1)).as("n_b"))
    cand
      .join(bt, "new_id")
      .join(index.select(col("id").as("old_id"), col("tok"), col("n")),
        Seq("old_id", "tok"))
      .groupBy(col("new_id"), col("old_id"), col("n"))
      .agg(count(lit(1)).as("i_n"))
      .join(bSizes, "new_id")
      .filter(col("i_n") * 1000000L >=
        lit(tPpm) * (col("n_b") + col("n") - col("i_n")))
      .select(col("new_id"), col("old_id"), col("i_n"),
        (col("n_b") + col("n") - col("i_n")).as("u_n"),
        expr("(i_n * 1000000) div (n_b + n - i_n)").as("jac_ppm"))
  }
}
