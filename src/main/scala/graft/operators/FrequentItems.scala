package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic mergeable heavy hitters — Misra–Gries (Misra & Gries
  * 1982) per input partition, merged by plain token-sum (Agarwal et al.,
  * "Mergeable Summaries", PODS 2012): the frequent-items summary whose
  * error bound SURVIVES distribution, unlike a local top-k.
  *
  * Per partition p the MG(k) invariants give, for every token t:
  * `cnt_p(t) ≤ true_p(t) ≤ cnt_p(t) + dec_p` (absent ⇒ cnt_p = 0), where
  * `dec_p` is that partition's decrement-round count and each round
  * retires k+1 units of stream mass, so `dec_p ≤ n_p/(k+1)`. Summing
  * over partitions (the merge is a commutative token-keyed sum — NO
  * order dependence):
  *
  *   est(t) ≤ true(t) ≤ est(t) + D,   D = Σ_p dec_p ≤ N/(k+1)
  *
  * and any token ABSENT from the merged summary has true(t) ≤ D — i.e.
  * every token with true count above D is guaranteed present
  * (guaranteed-heavy coverage). All three are THEOREMS of the structure,
  * not accuracy hopes, which is what makes them oracle-pinnable.
  *
  * Scale shape: one O(k)-memory pass per input split with NO shuffle of
  * the raw stream — only the ≤ (k+1)·P summary rows shuffle into the
  * token-sum merge. This is the sketch to reach for when even the
  * (token, count) pre-aggregate is too wide to materialize (q144's CMS
  * answers point queries; MG answers "which items are frequent"). */
object FrequentItems {

  private val summarySchema = StructType(Seq(
    StructField("tok", StringType),
    StructField("cnt", LongType)))

  /** Per-partition MG(k) summaries: counter rows `(tok, cnt)` plus ONE
    * `(NULL, dec_p)` decrement-marker row per non-empty partition.
    *
    * NULL tokens are dropped up front (the SQL `count(col)` convention):
    * NULL carries no token identity, and a NULL counter row would be
    * indistinguishable from the decrement marker — the merge would
    * silently fold its count into D, corrupting every bound. */
  def misraGriesSummaries(tokens: DataFrame, tokenCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    tokens.select(col(tokenCol).cast("string"))
      .filter(col(tokenCol).isNotNull)
      .mapPartitions { it =>
        val m = new java.util.HashMap[String, Long](2 * k)
        var dec = 0L
        var any = false
        while (it.hasNext) {
          any = true
          val t = it.next().getString(0)
          val cur = m.get(t)
          if (cur != 0L || m.containsKey(t)) m.put(t, cur + 1L)
          else if (m.size < k) m.put(t, 1L)
          else {
            // full and t untracked: one decrement round over all k
            // counters, t's arrival uncounted — k+1 units of mass retired.
            dec += 1L
            val eit = m.entrySet().iterator()
            while (eit.hasNext) {
              val e = eit.next()
              if (e.getValue == 1L) eit.remove() else e.setValue(e.getValue - 1L)
            }
          }
        }
        if (!any) Iterator.empty
        else {
          val counters = m.entrySet().iterator()
          new Iterator[Row] {
            private var emittedDec = false
            def hasNext: Boolean = counters.hasNext || !emittedDec
            def next(): Row =
              if (counters.hasNext) { val e = counters.next(); Row(e.getKey, e.getValue) }
              else { emittedDec = true; Row(null, dec) }
          }
        }
      }(Encoders.row(summarySchema))
  }

  /** Merged summary `(tok, est, d_total)`: token-keyed sum of the
    * per-partition counters, with the global decrement total D (the
    * one-row broadcast q113 shape — summary cardinality is ≤ (k+1)·P, so
    * the cross join is over sketch rows, never the stream). */
  def misraGries(tokens: DataFrame, tokenCol: String, k: Int): DataFrame = {
    val s = misraGriesSummaries(tokens, tokenCol, k).cache()
    val est = s.filter(col("tok").isNotNull)
      .groupBy(col("tok")).agg(sum(col("cnt")).as("est"))
    val d = s.filter(col("tok").isNull)
      .agg(coalesce(sum(col("cnt")), lit(0L)).as("d_total"))
    est.crossJoin(broadcast(d))
  }
}
