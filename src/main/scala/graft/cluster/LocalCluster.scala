package graft.cluster

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Per-key local density clustering (SURVEY §2.9 ops 58-60): the reference
  * runs UMAP → pairwise cosine → HDBSCAN per user on GPU
  * (assets/old_history.py:155-187). There is no Spark-native HDBSCAN; the
  * blueprint decision (SURVEY §7) is per-key *local* clustering inside
  * `flatMapGroups` — each user's interest set is small (thousands), so the
  * O(n²) distance matrix is a per-group in-memory computation while Spark
  * parallelizes across users. Semantics per group, scale across groups.
  *
  * Two per-key clusterers share the plumbing:
  *  - [[clusterPerKey]]: ε-threshold single-linkage over cosine distance
  *    (connected components of the "distance ≤ ε" graph) with a minimum
  *    cluster size — a flat DBSCAN*-style cut, fully SQL-replayable and
  *    oracle-checked (q54);
  *  - [[hdbscanPerKey]]: the reference's ACTUAL algorithm ([[Hdbscan]] —
  *    MST, condensed tree, EOM stability, cluster_selection_epsilon),
  *    spec-pinned by hand-derived goldens (q100).
  * Labels are deterministic in both: clusters are numbered by their
  * smallest member's input order (no RNG, no iteration-order dependence).
  */
object LocalCluster {

  /** Pure local kernel: rows = (ordinal, unit-ish vector). Returns labels. */
  def clusterVectors(vecs: Array[Array[Float]], eps: Double, minClusterSize: Int): Array[Int] = {
    val n = vecs.length
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    def union(a: Int, b: Int): Unit = {
      val ra = find(a); val rb = find(b)
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        if (round9(cosineDistance(vecs(i), vecs(j))) <= eps) union(i, j)
        j += 1
      }
      i += 1
    }
    // component sizes → noise for small ones; stable labels by min member
    val roots = Array.tabulate(n)(find)
    val sizes = roots.groupBy(identity).map { case (r, m) => r -> m.length }
    val clusterRoots = roots.distinct.filter(sizes(_) >= minClusterSize).sorted
    val labelOf = clusterRoots.zipWithIndex.toMap
    roots.map(r => labelOf.getOrElse(r, -1))
  }

  /** Repo float policy (round-then-compare): distances are rounded to 9
    * decimals before the ε threshold, with the same FP op sequence DuckDB's
    * `round(x, 9)` performs (`std::round` half away from zero; distances
    * are non-negative so `floor(x·1e9 + 0.5)` is identical) — the oracle
    * rounds its side too, so a last-bit cosine difference between engines
    * cannot flip a pair sitting within 1 ulp of ε. */
  private def round9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9

  def cosineDistance(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 1.0
    else 1.0 - dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Which local algorithm `reduceTo` runs (SURVEY §2.9 op 58): [[Umap]]
    * is the reference-faithful reduction (assets/old_history.py:157-161);
    * [[Pca]] is the deterministic closed-form alternative retained for the
    * oracle-checked composition proof (q123's fixture discharge relies on
    * PCA's top-k projection being an isometry on that data, which no
    * SGD layout can promise). */
  sealed trait Reducer extends Serializable
  case object Pca extends Reducer
  case object Umap extends Reducer

  /** Cluster `df` per `keyCol` group. Input needs `keyCol: long`,
    * `itemCol: string`, `vecCol: array<float>`; output adds
    * `cluster_label: int` (−1 = noise). Rows within a group are ordered by
    * `itemCol` before clustering so labels are reproducible.
    * `reduceTo = Some(k)` runs the per-group `reducer` to k dims first —
    * the reference's UMAP→cluster shape (SURVEY §2.9 op 58). */
  def clusterPerKey(
      df: DataFrame,
      keyCol: String,
      itemCol: String,
      vecCol: String,
      eps: Double = 0.02,
      minClusterSize: Int = 5,
      reduceTo: Option[Int] = None,
      reducer: Reducer = Pca): DataFrame =
    labelPerKey(df, keyCol, itemCol, vecCol, reduceTo, reducer,
      clusterVectors(_, eps, minClusterSize))

  /** [[clusterPerKey]] with the per-point REDUCED vectors retained
    * (`reduced: array<float>`) — the surface the layout-quality bound
    * oracles (q93/q102) compute neighborhood preservation on. */
  def clusterPerKeyReduced(
      df: DataFrame,
      keyCol: String,
      itemCol: String,
      vecCol: String,
      eps: Double = 0.02,
      minClusterSize: Int = 5,
      reduceTo: Option[Int] = None,
      reducer: Reducer = Pca): DataFrame =
    labelPerKey(df, keyCol, itemCol, vecCol, reduceTo, reducer,
      clusterVectors(_, eps, minClusterSize), keepReduced = true)

  /** [[hdbscanPerKey]] with the per-point REDUCED vectors retained —
    * see [[clusterPerKeyReduced]]. */
  def hdbscanPerKeyReduced(
      df: DataFrame,
      keyCol: String,
      itemCol: String,
      vecCol: String,
      minClusterSize: Int = 5,
      minSamples: Int = 0,
      clusterSelectionEpsilon: Double = 0.02,
      reduceTo: Option[Int] = None,
      reducer: Reducer = Pca): DataFrame =
    labelPerKey(df, keyCol, itemCol, vecCol, reduceTo, reducer,
      Hdbscan.labels(_, minClusterSize, minSamples, clusterSelectionEpsilon),
      keepReduced = true)

  /** TRUE HDBSCAN per `keyCol` group ([[Hdbscan]]: MST → condensed tree →
    * EOM stability selection → epsilon search) — the reference's actual
    * per-user clusterer (`assets/old_history.py:169-176`), where
    * [[clusterPerKey]] is the flat ε-cut approximation. Same input/output
    * contract and determinism (rows sorted by item, labels by smallest
    * member). */
  def hdbscanPerKey(
      df: DataFrame,
      keyCol: String,
      itemCol: String,
      vecCol: String,
      minClusterSize: Int = 5,
      minSamples: Int = 0,
      clusterSelectionEpsilon: Double = 0.02,
      reduceTo: Option[Int] = None,
      reducer: Reducer = Pca): DataFrame =
    labelPerKey(df, keyCol, itemCol, vecCol, reduceTo, reducer,
      Hdbscan.labels(_, minClusterSize, minSamples, clusterSelectionEpsilon))

  /** Hard per-group row cap, ENFORCED (VERDICT r9 watch item: the bound
    * was documented but not checked). The per-group cost is an O(n²)
    * distance matrix — n = 8192 is ~537 MB of transient doubles per
    * concurrent group task, the largest that stays executor-safe at
    * default task parallelism. The reference row-limits each user's
    * group far below this (hundreds to low thousands,
    * assets/old_history.py); a group that outgrows the cap means an
    * upstream limit was dropped, and the right response is a loud
    * per-key error naming the group, not a silent quadratic straggler
    * (or executor OOM) three stages later. */
  val MaxGroupRows = 8192

  /** Shared per-key plumbing: deterministic in-group order, optional
    * reduction, one local labeling call per group inside `flatMapGroups`. */
  private def labelPerKey(
      df: DataFrame,
      keyCol: String,
      itemCol: String,
      vecCol: String,
      reduceTo: Option[Int],
      reducer: Reducer,
      labelFn: Array[Array[Float]] => Array[Int],
      keepReduced: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(df(keyCol), df(itemCol), df(vecCol))
      .map { r =>
        (r.getLong(0), r.getString(1), r.getSeq[Float](2))
      }
      .groupByKey(_._1)
      .flatMapGroups { (key, it) =>
        // cap check BEFORE materializing/sorting the group: take(cap + 1)
        // is complete when the group is under the cap, and an over-cap
        // group dies here instead of OOMing inside toVector/sortBy
        val capped = it.take(MaxGroupRows + 1).toVector
        require(capped.length <= MaxGroupRows,
          s"per-key local clustering group '$key' exceeds the $MaxGroupRows-row " +
            "cap: an upstream per-group row limit was dropped — cap the " +
            "group before clustering (the O(n²) local pass is only safe " +
            "for bounded groups)")
        val rows = capped.sortBy(r => (r._2, r._3.headOption.getOrElse(0f)))
        val raw = rows.map(_._3.toArray).toArray
        val vecs = reduceTo match {
          case Some(k) =>
            val reduced = reducer match {
              case Pca => LocalPca.reduce(raw, k)
              case Umap => LocalUmap.reduce(raw, k)
            }
            reduced.map(_.map(_.toFloat))
          case None => raw
        }
        val labels = labelFn(vecs)
        rows.iterator.zipWithIndex.map { case ((k, item, vec), i) =>
          // reduced is empty unless requested, so the common path pays no
          // extra serialization
          val red: Seq[Float] = if (keepReduced) vecs(i).toSeq else Seq.empty
          (k, item, vec, red, labels(i))
        }
      }
      .toDF(keyCol, itemCol, vecCol, "reduced", "cluster_label")
      .drop((if (keepReduced) Seq.empty[String] else Seq("reduced")): _*)
  }
}
