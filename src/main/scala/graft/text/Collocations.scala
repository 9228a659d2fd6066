package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Collocation mining — pointwise-mutual-information association of
  * adjacent token pairs (Church & Hanks 1990), the classic "new york" /
  * "machine learning" detector a tokenizer-vocabulary or phrase-table
  * builder runs over a training corpus before deciding what deserves a
  * single unit.
  *
  * Integer discipline (the repo's float policy): rather than rank by
  * `log(p(x,y)/(p(x)p(y)))` — a float whose last bit differs across
  * engines — we rank by the LIFT on the ppm grid, which orders
  * identically because log is monotone:
  *
  *   lift_ppm = (n_xy · N · N · 10^6) div (B · n_x · n_y)
  *
  * with `n_x` = occurrences of token x, `N` = total tokens, `n_xy` =
  * occurrences of the ADJACENT pair (x,y), `B` = total pairs. The
  * numerator reaches N² ≈ 10^24 at trillion-token scale, so the product
  * is computed in DECIMAL(38,0) ≡ DuckDB HUGEINT (the q193 parity rule)
  * and only the post-division lift lands on the BIGINT grid.
  *
  * 100 TB shape: two linear corpus passes (pair counts, token counts —
  * both map-side-combined groupBys), then all arithmetic happens on the
  * VOCABULARY-sized pair table: two equi-hash joins against the
  * unigram-count table (itself vocabulary-sized — broadcastable for
  * real-word vocabularies, but never assumed) and a broadcast 1-row
  * totals frame. The corpus is never self-joined and token text never
  * shuffles twice.
  */
object Collocations {

  /** Top-`k` collocations with pair count ≥ `minCount`: (x, y, n_xy,
    * n_x, n_y, lift_ppm), lift desc, ties by (x, y). */
  def topLift(docs: DataFrame, idCol: String, textCol: String,
      minCount: Long, k: Int): DataFrame = {
    val toks = docs.select(split(col(textCol), " ").as("w"))
    val uni = toks.select(explode(col("w")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
    // adjacent pairs via the positions zip — one explode, no self-join.
    // The size(w) > 1 guard is load-bearing: Spark's sequence(1, 0) is
    // the DESCENDING [1, 0], so a single-token doc would emit bogus
    // (tok, null)/(null, tok) rows that only null-join semantics keep
    // out of the output (DuckDB's generate_series(1, 0) is empty)
    val pairs = toks.filter(size(col("w")) > 1)
      .select(explode(expr(
        "transform(sequence(1, size(w) - 1), i -> struct(w[i-1] AS x, w[i] AS y))"))
        .as("p"))
      .select(col("p.x").as("x"), col("p.y").as("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("n_xy"))
      .filter(col("n_xy") >= minCount)
    val tot = toks.agg(
      sum(size(col("w"))).cast("long").as("n_tok"),
      sum(greatest(size(col("w")) - 1, lit(0))).cast("long").as("n_big"))
    pairs
      .join(uni.select(col("tok").as("x"), col("n").as("n_x")), "x")
      .join(uni.select(col("tok").as("y"), col("n").as("n_y")), "y")
      .crossJoin(broadcast(tot))
      .select(col("x"), col("y"), col("n_xy"), col("n_x"), col("n_y"),
        expr("CAST((CAST(n_xy AS DECIMAL(38,0)) * n_tok * n_tok * 1000000) div " +
          "(CAST(n_big AS DECIMAL(38,0)) * n_x * n_y) AS BIGINT)")
          .as("lift_ppm"))
      .orderBy(col("lift_ppm").desc, col("x"), col("y"))
      .limit(k)
  }
}
