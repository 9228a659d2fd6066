package graft.cluster

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Integer-exact CART training (depth 2) — the tree-based classifier
  * trainer beside q153's logistic GD and q127's fastText-style inference
  * (tree ensembles are the OTHER standard quality-filter family; a depth-2
  * tree is the interpretable core: one distributed split search per node).
  *
  * Exactness discipline: features live on the ppm grid, binned into 64
  * equal-width buckets; a split candidate is a (feature, bin) edge and is
  * scored by the exact weighted Gini impurity
  * `pl(nl−pl)/nl + pr(nr−pr)/nr` (minimize). The rational score is
  * totally ordered via the common-denominator form scaled to a 1e-15
  * grid: `sk = (a·10^15) div (nl·nr)` with
  * `a = pl(nl−pl)·nr + pr(nr−pr)·nl`, computed in DECIMAL(38,0) (Spark) /
  * HUGEINT (DuckDB) so both engines truncate identically; score
  * collisions on that grid (possible once n ≳ 10^4) fall to the
  * deterministic (feature, bin) tie-break — both engines pick the SAME
  * split even then, which is the property the oracle needs.
  *
  * Scale shape (the q153/q154 training discipline): model state is
  * driver-side and O(1) (three split rows); each search is one groupBy
  * onto ≤ |features|·64 cells, one per-feature prefix window over ≤ 64
  * rows, and a LIMIT 1 — the corpus shuffles once per node into a
  * cell-count histogram, never pairwise. */
object GiniTree {

  val NumBins = 64
  val BinWidthPpm = 15625L // 1e6 / 64

  /** `(feature, thrBin, nl, pl, nr, pr)` of the argmin split. */
  private case class Split(f: String, bin: Long, nl: Long, pl: Long,
      nr: Long, pr: Long)

  /** Argmin Gini split of `sub` (long format: doc_id, y, f, bin), or
    * None when no candidate has both sides non-empty (every feature
    * constant on the node — the node stays a leaf). */
  private def bestSplit(sub: DataFrame): Option[Split] = {
    val h = sub.groupBy(col("f"), col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("p"))
    val w = Window.partitionBy(col("f")).orderBy(col("bin"))
    val c = h
      .withColumn("nl", sum(col("n")).over(w))
      .withColumn("pl", sum(col("p")).over(w))
    val t = h.groupBy(col("f"))
      .agg(sum(col("n")).as("tn"), sum(col("p")).as("tp"))
    val k = c.join(t, "f")
      .withColumn("nr", col("tn") - col("nl"))
      .withColumn("pr", col("tp") - col("pl"))
      .filter(col("nl") > 0 && col("nr") > 0)
      .withColumn("a",
        col("pl") * (col("nl") - col("pl")) * col("nr")
          + col("pr") * (col("nr") - col("pr")) * col("nl"))
      .withColumn("sk", expr(
        "CAST((CAST(a AS DECIMAL(38,0)) * 1000000000000000) div (nl * nr) AS BIGINT)"))
    val best = k.orderBy(col("sk"), col("f"), col("bin")).limit(1)
      .select("f", "bin", "nl", "pl", "nr", "pr").collect()
    best.headOption.map { r =>
      Split(r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))
    }
  }

  /** Fit a depth-2 tree over `feats` (doc_id, y ∈ {0,1}, f, bin) and
    * return the 7-row node table:
    * (node_id, kind, feature, thr_bin, thr_ppm, n, pos, pred) — node 0
    * splits into 1 (left, bin ≤ thr) / 2; node 1 into leaves 3/4; node 2
    * into leaves 5/6. `pred` is the majority label (ties → 1). */
  def fitDepth2(spark: SparkSession, feats: DataFrame): DataFrame = {
    val cached = feats.cache()
    val s0 = bestSplit(cached).getOrElse(
      throw new IllegalArgumentException(
        "root has no valid split (all features constant)"))
    val side = cached.filter(col("f") === s0.f)
      .select(col("doc_id"), (col("bin") <= s0.bin).as("is_left"))
    val assigned = cached.join(side, "doc_id").cache()
    val left = assigned.filter(col("is_left"))
    val right = assigned.filter(!col("is_left"))
    val s1 = bestSplit(left)
    val s2 = bestSplit(right)

    def leafStats(sub: DataFrame, s: Split): Seq[(Long, Long)] = {
      // (n, pos) of (bin ≤ thr) and (bin > thr) under the node's feature
      val r = sub.filter(col("f") === s.f)
        .groupBy((col("bin") <= s.bin).as("l"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("p"))
        .collect().map(x => x.getBoolean(0) -> ((x.getLong(1), x.getLong(2))))
        .toMap
      Seq(r.getOrElse(true, (0L, 0L)), r.getOrElse(false, (0L, 0L)))
    }
    def pred(n: Long, p: Long): Int = if (2 * p >= n) 1 else 0
    def row(id: Int, kind: String, f: String, bin: Long, n: Long, p: Long) =
      (id, kind, f, bin, if (kind == "split") (bin + 1) * BinWidthPpm else 0L,
        n, p, pred(n, p))
    /** One child subtree: a split node + two leaves, or (degenerate: no
      * candidate — node pure/constant) a leaf node + two EMPTY leaves, so
      * the node table stays a fixed 7 rows. */
    def childRows(id: Int, leafBase: Int, sub: DataFrame, s: Option[Split],
        n: Long, p: Long): Seq[(Int, String, String, Long, Long, Long, Long, Int)] =
      s match {
        case Some(sp) =>
          val Seq((na, pa), (nb, pb)) = leafStats(sub, sp)
          Seq(row(id, "split", sp.f, sp.bin, sp.nl + sp.nr, sp.pl + sp.pr),
            row(leafBase, "leaf", "", -1L, na, pa),
            row(leafBase + 1, "leaf", "", -1L, nb, pb))
        case None =>
          Seq(row(id, "leaf", "", -1L, n, p),
            row(leafBase, "leaf", "", -1L, 0L, 0L),
            row(leafBase + 1, "leaf", "", -1L, 0L, 0L))
      }
    val rows =
      Seq(row(0, "split", s0.f, s0.bin, s0.nl + s0.nr, s0.pl + s0.pr)) ++
        childRows(1, 3, left, s1, s0.nl, s0.pl) ++
        childRows(2, 5, right, s2, s0.nr, s0.pr)
    cached.unpersist(); assigned.unpersist()
    import spark.implicits._
    rows.toDF("node_id", "kind", "feature", "thr_bin", "thr_ppm",
      "n", "pos", "pred").orderBy(col("node_id"))
  }
}
