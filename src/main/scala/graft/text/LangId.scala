package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Heuristic language identification: score each language profile by its
  * stopword hit-rate over the token stream, pick the argmax.
  *
  * Pure column expressions (codegen'd higher-order functions) — no UDF, so
  * at 100 TB the whole detector stays inside whole-stage codegen and the
  * scan. Profiles are deliberately tiny; real deployments would swap in
  * larger function-word lists or char-n-gram models behind the same API.
  */
object LangId {

  val profiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "en" -> Seq("the", "a", "of", "and", "to", "is", "in", "that"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "los", "una"),
    "fr" -> Seq("le", "la", "les", "et", "des", "que", "une", "dans"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "他", "不"))

  /** Adds `lang_pred` (argmax language, ties broken by language code) and
    * `lang_score` (winning hit-rate, rounded) to `df`. */
  def detect(df: DataFrame, text: Column): DataFrame = {
    val tok = split(lower(text), "\\s+")
    val nTok = greatest(size(tok), lit(1)).cast("double")
    // ONE pass over the tokens for all profiles (codegen'd expression with
    // a token→profile-bitmask map); the previous per-profile filter() HOFs
    // were interpreted and re-walked the token list once per language.
    val hits = org.apache.spark.sql.graftbridge.Bridge.column(
      graft.functions.StopwordHits(
        org.apache.spark.sql.graftbridge.Bridge.expression(tok),
        profiles.map(_._2)))
    val scored = profiles.zipWithIndex.map { case ((lang, _), i) =>
      struct(
        (element_at(hits, i + 1).cast("double") / nTok).as("score"),
        lit(lang).as("lang"))
    }
    // array_max on struct(score, lang): max score wins, lexicographically
    // larger language code breaks ties — stable across engines and runs.
    val best = array_max(array(scored: _*))
    df.withColumn("lang_pred", best.getField("lang"))
      .withColumn("lang_score",
        (signum(best.getField("score") * 1e6) * floor(abs(best.getField("score") * 1e6) + 0.5)) / 1e6)
  }
}
