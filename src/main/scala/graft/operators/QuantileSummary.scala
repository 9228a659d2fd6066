package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic mergeable quantile summary — the rank-sample family
  * (Manku–Rajagopalan–Lindsay 1998 lineage; the quantile member of the
  * mergeable-summaries shelf next to KMV/HLL/CMS and [[FrequentItems]]):
  * each input split sorts locally and keeps every s-th element with
  * weight s (s = ⌈n_p/m⌉), the merge is a plain weighted union — NO
  * order dependence — and the global rank estimate
  * `est_rank(v) = Σ weight(entries ≤ v)` carries the THEOREM
  *
  *   true_count≤(v) ∈ [est_rank(v), est_rank(v) + E],  E = Σ_p s_p ≤ N/m + P
  *
  * (within one split with j kept elements ≤ v, the j-th kept sits at
  * sorted position j·s — so at least j·s originals are ≤ v — and fewer
  * than (j+1)·s are, since the (j+1)-th kept exceeds v: the weighted
  * estimate UNDERCOUNTS by less than one spacing s_p and never
  * overcounts). The φ-quantile read (smallest sample value x with
  * cumulative weight ≥ ⌈φN⌉) therefore satisfies
  * `count(≤ x) ≥ ⌈φN⌉` and `count(< x) < ⌈φN⌉ + 2E` — oracle-pinnable
  * bounds, not accuracy hopes. The budget E travels IN the summary as
  * marker rows, so a stored/merged summary stays self-describing.
  *
  * Scale shape: one in-memory sort per input split (the same budget any
  * per-partition summary spends, bounded by the split size), a summary
  * of ≤ (m+1)·P rows total, and a single tiny pass over sketch rows for
  * the quantile read. The raw stream never shuffles. */
object QuantileSummary {

  private val entrySchema = StructType(Seq(
    StructField("kind", IntegerType), // 0 = rank sample, 1 = budget marker
    StructField("v", LongType),
    StructField("w", LongType)))

  /** Per-split systematic rank samples `(kind=0, v, w)` over an INTEGRAL
    * value column — the split's sorted i·s-th elements (1-based), each
    * weighted s except a lighter final remainder entry, so Σ w = n_p
    * exactly — plus ONE `(kind=1, 0, s_p)` budget marker per non-empty
    * split. */
  def summaries(df: DataFrame, valueCol: String, m: Int): DataFrame = {
    require(m >= 2, "summary size must be at least 2")
    df.select(col(valueCol).cast("long"))
      .mapPartitions { it =>
        val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
        while (it.hasNext) buf += it.next().getLong(0)
        if (buf.isEmpty) Iterator.empty
        else {
          val arr = buf.toArray
          java.util.Arrays.sort(arr)
          val n = arr.length
          val s = (n + m - 1) / m
          val out = scala.collection.mutable.ArrayBuffer.empty[Row]
          var i = s
          while (i <= n) { out += Row(0, arr(i - 1), s.toLong); i += s }
          val rem = n % s
          if (rem != 0) out += Row(0, arr(n - 1), rem.toLong)
          out += Row(1, 0L, s.toLong)
          out.iterator
        }
      }(Encoders.row(entrySchema))
  }

  /** Quantile read over a (possibly merged) summary: for each φ = i/q
    * the smallest sample value whose cumulative weight reaches ⌈φ·N⌉,
    * with N and the error budget E carried on every row. Output:
    * (phi_pct, value, target_rank, n_total, err_bound). The ordering
    * window runs over ≤ (m+1)·P sketch rows, never the stream. */
  def quantiles(summary: DataFrame, q: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val entries = summary.filter(col("kind") === 0)
    val tot = entries.agg(sum(col("w")).as("n_total"))
      .crossJoin(broadcast(summary.filter(col("kind") === 1)
        .agg(sum(col("w")).as("err_bound"))))
    val cum = entries
      .withColumn("cw", sum(col("w")).over(Window.orderBy(col("v"), col("w"))))
      .crossJoin(broadcast(tot))
    val phis = summary.sparkSession.range(1, q)
      .select(expr(s"CAST((id * 100) div $q AS INT)").as("phi_pct"))
    cum.crossJoin(broadcast(phis))
      .withColumn("target_rank",
        expr("CAST((phi_pct * n_total + 99) div 100 AS BIGINT)"))
      .filter(col("cw") >= col("target_rank"))
      .groupBy(col("phi_pct"), col("target_rank"), col("n_total"),
        col("err_bound"))
      .agg(min(col("v")).as("value"))
      .select(col("phi_pct"), col("value"), col("target_rank"),
        col("n_total"), col("err_bound"))
  }
}
