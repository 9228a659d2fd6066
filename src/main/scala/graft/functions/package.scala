package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.{Bridge => ExpressionUtils}

/** Column-level API over the engine's custom Catalyst expressions, plus SQL
  * registration so every function is also reachable from `spark.sql(...)`. */
package object functions {

  private def c(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    ExpressionUtils.column(e)
  private def e(col: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    ExpressionUtils.expression(col)

  /** Cosine similarity of two array<float|double> columns (codegen'd). */
  def cosine_similarity(a: Column, b: Column): Column =
    c(CosineSimilarity(e(a), e(b)))

  /** pgvector-style cosine distance `a <=> b` = 1 − similarity. */
  def cosine_distance(a: Column, b: Column): Column =
    lit(1.0) - cosine_similarity(a, b)

  /** Dot product of two array<float|double> columns (codegen'd). */
  def vec_dot(a: Column, b: Column): Column = c(DotProduct(e(a), e(b)))

  /** L2 norm of an array<float|double> column. */
  def vec_norm(a: Column): Column = sqrt(vec_dot(a, a))

  /** Raw JSON `{...}`/`[...]` snippets embedded in noisy text, in order.
    * `explodeArrays = true` flattens top-level arrays into their objects. */
  def extract_json_objects(text: Column, explodeArrays: Boolean = false): Column =
    c(ExtractJsonObjects(e(text), explodeArrays))

  /** 64-bit SimHash of a token array. */
  def simhash64(tokens: Column): Column = c(SimHash64(e(tokens)))

  /** Winnowing fingerprint (char k-grams, window w) of a string column. */
  def winnow_fingerprint(text: Column, k: Int = 8, w: Int = 16): Column =
    c(WinnowFingerprint(e(text), k, w))

  /** Word k-shingles of a token array (codegen'd single pass; empty array
    * below k tokens) — concat_ws/transform parity, see WordShingles. */
  def word_shingles(tokens: Column, k: Int): Column =
    c(WordShingles(e(tokens), k))

  /** Character k-shingles of a string (codegen'd single boundary-walk
    * pass; empty array below k characters) — substring/transform parity,
    * see CharShingles. */
  def char_shingles(text: Column, k: Int): Column =
    c(CharShingles(e(text), k))

  /** Clipped char-k-gram stats struct(match_n, c_total, r_total) of a
    * (candidate, reference) pair in one per-row pass — the chrF/BLEU
    * clip without any per-gram rows; see CharGramClipStats. */
  def char_gram_clip(cand: Column, ref: Column, k: Int): Column =
    c(CharGramClipStats(e(cand), e(ref), k))

  /** Word-gram twin of [[char_gram_clip]] over two token arrays; see
    * WordGramClipStats. */
  def word_gram_clip(cand: Column, ref: Column, k: Int): Column =
    c(WordGramClipStats(e(cand), e(ref), k))

  /** min(md5(salt || shingle)) over word 3-shingles of a token array —
    * exact parity with `array_min(transform(shingles, md5(salt || s)))`
    * in one tight loop, no shingle materialization. */
  def salted_md5_min(tokens: Column, salt: String, shingleSize: Int = 3): Column =
    c(SaltedMd5Min(e(tokens), salt, shingleSize))

  /** Element-wise mean of an array column (centroid aggregate — map-side
    * buffers instead of a dim× posexplode shuffle blowup). */
  def vector_mean(vec: Column): Column =
    c(VectorMean(e(vec)).toAggregateExpression())

  /** Single-pass MinHash signature (array<long> of nSig salted minima)
    * over word shingles of a token array. */
  def minhash_signature(tokens: Column, nSig: Int, shingleSize: Int = 3): Column =
    c(MinHashSignature(e(tokens), nSig, shingleSize))

  /** Sign-bit hyperplane LSH bucket (deterministic planes from `seed`). */
  def hyperplane_lsh(vec: Column, dim: Int, nPlanes: Int, seed: Long): Column =
    c(HyperplaneLsh(e(vec), dim, nPlanes, seed))

  /** Apply a Polars offset string ("-15d", "-3mo", "1h30m") to a timestamp. */
  def offset_by(ts: Column, offset: String): Column = PolarsOffset.offsetBy(ts, offset)

  /** Integer fixed point: round(c · scale) half away from zero, as a
    * 64-bit integer — the ONE rounding primitive every oracle-boundary
    * fixed-point compare must share (sim_i9 grids in SessionOps, the 1e-6
    * vector grid in KmeansPpm). The op sequence (signum·floor(|s|+0.5))
    * matches DuckDB's `CAST(round(x · scale) AS BIGINT)` bit for bit;
    * Spark's own `round()` goes through BigDecimal HALF_UP on the decimal
    * rendering and diverges on half-boundary doubles (see
    * graft.queries.oround, the double-valued sibling of this helper). */
  def fixed_point(col: Column, scale: Double): Column = {
    val s = col * lit(scale)
    (signum(s) * floor(abs(s) + lit(0.5))).cast("long")
  }

  /** Seconds-of-day codec for the engine's time-of-day representation
    * (SURVEY §1.2: Spark has no TimeType; reference compares Postgres
    * `time` values — zero-padded "HH:mm" strings and seconds-of-day ints
    * order identically). */
  def seconds_of_day(hhmm: Column): Column =
    substring(hhmm, 1, 2).cast("int") * 3600 + substring(hhmm, 4, 2).cast("int") * 60

  /** Inverse codec: seconds-of-day int → "HH:mm". */
  def hhmm_of_seconds(secs: Column): Column =
    format_string("%02d:%02d", (secs / 3600).cast("int"), ((secs % 3600) / 60).cast("int"))

  import org.apache.spark.sql.catalyst.expressions.{Expression => CExpr, Literal}
  import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
  import org.apache.spark.unsafe.types.UTF8String

  private def intArg(es: Seq[CExpr], i: Int, dflt: Int): Int =
    if (es.length <= i) dflt else es(i) match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"argument ${i + 1} must be an integer literal, got $other")
    }

  private def longArg(es: Seq[CExpr], i: Int, dflt: Long): Long =
    if (es.length <= i) dflt else es(i) match {
      case Literal(v: Int, IntegerType) => v.toLong
      case Literal(v: Long, LongType) => v
      case other => throw new IllegalArgumentException(
        s"argument ${i + 1} must be an integer literal, got $other")
    }

  private def strArg(es: Seq[CExpr], i: Int, dflt: String): String =
    if (es.length <= i) dflt else es(i) match {
      case Literal(v: UTF8String, StringType) => v.toString
      case other => throw new IllegalArgumentException(
        s"argument ${i + 1} must be a string literal, got $other")
    }

  /** Single source of truth for the SQL-function surface. BOTH registration
    * paths — `GraftExtensions` (spark.sql.extensions deployments) and
    * `registerAll` (programmatic sessions) — iterate this list, so a query
    * that resolves under one path resolves under the other. */
  private[graft] val sqlFunctions: Seq[(String, Seq[CExpr] => CExpr)] = Seq(
    "cosine_similarity" -> ((es: Seq[CExpr]) => CosineSimilarity(es(0), es(1))),
    "vec_dot" -> ((es: Seq[CExpr]) => DotProduct(es(0), es(1))),
    "extract_json_objects" -> ((es: Seq[CExpr]) => ExtractJsonObjects(es.head)),
    "simhash64" -> ((es: Seq[CExpr]) => SimHash64(es.head)),
    "word_shingles" -> ((es: Seq[CExpr]) => WordShingles(es.head, intArg(es, 1, 3))),
    "char_shingles" -> ((es: Seq[CExpr]) => CharShingles(es.head, intArg(es, 1, 3))),
    "winnow_fingerprint" -> ((es: Seq[CExpr]) =>
      WinnowFingerprint(es.head, intArg(es, 1, 8), intArg(es, 2, 16))),
    "minhash_signature" -> ((es: Seq[CExpr]) =>
      MinHashSignature(es.head, intArg(es, 1, 8), intArg(es, 2, 3))),
    "vector_mean" -> ((es: Seq[CExpr]) => VectorMean(es.head).toAggregateExpression()),
    "salted_md5_min" -> ((es: Seq[CExpr]) =>
      SaltedMd5Min(es.head, strArg(es, 1, ""), intArg(es, 2, 3))),
    "hyperplane_lsh" -> ((es: Seq[CExpr]) => {
      // dim has no sane default: dim=0 would zero every dot product and
      // collapse all rows into one bucket with no error
      if (es.length < 2) throw new IllegalArgumentException(
        "hyperplane_lsh(vec, dim[, nPlanes[, seed]]) requires the vector dimension")
      HyperplaneLsh(es.head, intArg(es, 1, 0), intArg(es, 2, 16), longArg(es, 3, 42L))
    })
  )

  /** Register all custom functions for the SQL surface (same list as the
    * `GraftExtensions` injection path). */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    sqlFunctions.foreach { case (name, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
  }
}
