package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Normalizer contract: fold table integrity, operation order,
  * idempotence, and the dedup-collapse composition. */
class NormalizeSpec extends SparkSpec {

  import spark.implicits._

  private def norm(s: String): String =
    Seq(s).toDF("t").select(Normalize.normalized(col("t"))).head().getString(0)

  test("fold goldens: accents fold THEN case strips (Á -> a)") {
    assert(norm("Árbol ÑOÑO Çà") == "arbol nono ca")
    assert(norm("déjà vu") == "deja vu")
    // lower-before-fold would leave upper-case accents unfolded: pin the order
    assert(norm("ÉÈÊË") == "eeee")
  }

  test("whitespace collapse + trim; plain ASCII untouched") {
    assert(norm("  a   b  c ") == "a b c")
    assert(norm("already normal text") == "already normal text")
  }

  test("idempotence: normalize twice == normalize once") {
    val samples = Seq("  Mañana  CAFÉ  ", "ÜBER straße", "x  Y  z")
    samples.foreach(s => assert(norm(norm(s)) == norm(s)))
  }

  test("fold table halves stay paired index-for-index") {
    assert(Normalize.AccentFrom.length == Normalize.AccentTo.length)
    // every target char is unaccented ASCII
    assert(Normalize.AccentTo.forall(c => c < 128))
  }

  test("composition: case/diacritic/space variants collapse under exact dedup") {
    val df = Seq(
      (1L, "hello world"), (2L, "  HÉLLÖ   WÖRLD "), (3L, "another doc"))
      .toDF("id", "t")
      .withColumn("norm", Normalize.normalized(col("t")))
    val rows = graft.dedup.Dedup.exact(df, "id", "norm")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(rows == Set((1L, 1L, false), (2L, 1L, true), (3L, 3L, false)))
  }
}
