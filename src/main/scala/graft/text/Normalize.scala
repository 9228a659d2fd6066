package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text normalization for dedup/matching — the canonicalization pass a
  * multilingual curation pipeline runs BEFORE content hashing so that
  * case, diacritic, and whitespace variants of the same text collapse
  * (the NFKC-then-casefold convention, restricted to an explicit
  * engine-portable folding table: `translate` + `lower` + whitespace
  * collapse exist with identical semantics in Spark and DuckDB, so the
  * whole normalizer is SQL-replayable — no ICU dependency, no
  * locale-sensitive surprises).
  *
  * Scale: pure per-row column expressions — no shuffle, no UDF; the
  * normalized column feeds the exact content-hash dedup (q40/q169
  * family) unchanged. */
object Normalize {

  /** Latin-1/Latin-Extended diacritic folds, paired index-for-index with
    * [[AccentTo]]. Extend both together (lengths must match — translate
    * maps positionally). */
  val AccentFrom: String =
    "ÁÀÂÄÃÅáàâäãåÉÈÊËéèêëÍÌÎÏíìîïÓÒÔÖÕóòôöõÚÙÛÜúùûüÇçÑñÝýÿ"
  val AccentTo: String =
    "AAAAAAaaaaaaEEEEeeeeIIIIiiiiOOOOOoooooUUUUuuuuCcNnYyy"

  require(AccentFrom.length == AccentTo.length,
    "fold table halves must pair index-for-index")

  /** Fold diacritics → strip case → collapse runs of spaces → trim.
    * Order matters: the fold runs first so `Á` → `A` → `a`. */
  def normalized(c: Column): Column =
    trim(regexp_replace(lower(translate(c, AccentFrom, AccentTo)), " +", " "))
}
