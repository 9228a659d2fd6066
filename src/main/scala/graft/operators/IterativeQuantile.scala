package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact order statistics WITHOUT a global sort (SURVEY §2.3 op 22's
  * scale path; reference computes `percentile_cont` over per-user frames,
  * which Spark's `percentile` serves fine — this operator is for the
  * whole-table quantile a 100 TB column can't globally sort for).
  *
  * Two bounded passes + one bucket-local sort:
  *   1. min/max/count (one aggregate row to the driver);
  *   2. a `buckets`-bin histogram on a value-derived bin id (one aggregate,
  *      ≤ `buckets` rows to the driver) → cumulative counts locate, for
  *      each requested rank k, the single bin holding the k-th smallest;
  *   3. per rank: sort ONLY that bin (expected n/buckets rows) ascending,
  *      `limit(k − cum_before)` and take the max — the k-th smallest value,
  *      exactly, duplicates and skew included.
  *
  * The driver round-trips are fixed-size (1 row + ≤ `buckets` rows — the
  * same bounded-constant class as IvfIndex's probed-centroid set, allowed
  * by PlanAuditSpec's collect budget); the data-sized work is one scan for
  * the histogram and one bin-sized sort per rank. Bin ids are computed once
  * in one plan fragment, so float edge behavior in the binning is
  * internally consistent — correctness never depends on bin BOUNDARIES,
  * only on every row landing in exactly one bin, and the selected value is
  * an existing data value (no arithmetic on it), which is what makes the
  * result oracle-checkable bit-for-bit.
  *
  * A skewed bin (heavy duplicates) just means step 3 sorts more rows; a
  * follow-up histogram inside the bin would bound that too (not needed at
  * current scales — documented, not built).
  */
object IterativeQuantile {

  /** The k-th smallest values (1-indexed ranks, each 1 ≤ k ≤ count) of
    * `valueCol`, one row per requested rank: (k, value), ordered by k.
    * Declarative result — the selected values never visit the driver. */
  def orderStatistics(df: DataFrame, valueCol: String, ks: Seq[Long],
      buckets: Int = 1024): DataFrame = {
    require(ks.nonEmpty)
    val v = col(valueCol).cast("double")
    val stats = df.agg(min(v).as("mn"), max(v).as("mx"),
      count(v).as("n")).head()
    // read n FIRST: on an empty/all-null column min/max are null, and the
    // rank-range require below must fire (k > n = 0), not an opaque NPE
    val n = stats.getLong(2)
    ks.foreach(k => require(k >= 1 && k <= n, s"rank $k out of [1, $n]"))
    val (mn, mx) = (stats.getDouble(0), stats.getDouble(1))

    // bin id: monotone in v, every non-null row in exactly one of [0, buckets)
    val width = (mx - mn) / buckets
    def binOf(c: Column): Column =
      if (width == 0.0) lit(0L)
      else least(floor((c - lit(mn)) / lit(width)), lit(buckets - 1L)).cast("long")

    val hist = df.filter(v.isNotNull)
      .groupBy(binOf(v).as("bin")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val cumBefore = hist.scanLeft(0L)(_ + _._2).init
    val binIndex = hist.map(_._1).zip(cumBefore) // (bin, ranks before it)

    ks.map { k =>
      val (bin, before) = binIndex.takeWhile(_._2 < k).last
      // `limit` takes an Int: a single bin holding > 2^31 rows needs an
      // in-bin refinement pass (a second histogram inside [bin]) that is
      // not built — fail loudly rather than wrap the offset
      require(k - before <= Int.MaxValue,
        s"bin $bin holds rank offset ${k - before} > Int.MaxValue — " +
          "raise `buckets` or add an in-bin refinement pass")
      df.filter(v.isNotNull && binOf(v) === bin)
        .orderBy(v.asc)
        .limit((k - before).toInt)
        .agg(lit(k).as("k"), max(v).as("value"))
    }.reduce(_.unionAll(_)).orderBy(col("k"))
  }
}
