package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The q213 audit's two sides, pinned independently in the driver:
  * banding recall is measured against q208's exact truth, and the
  * banding itself must obey the exact-duplicate THEOREM — identical
  * shingle sets produce identical salted minima, hence identical bands,
  * hence found with certainty (recall on the J = 1 decile can never be
  * below 10^6). The brute replay below recomputes shingles, salted md5
  * minima, bands, and Jaccard with java MessageDigest — no Spark. */
class LshRecallSpec extends SparkSpec {

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
  }

  private def shingles(text: String): Seq[String] =
    text.split(" ", -1).toSeq.sliding(3).filter(_.size == 3)
      .map(_.mkString(" ")).toSeq

  private def bandsOf(text: String): Seq[(Int, String)] = {
    val sh = shingles(text)
    if (sh.isEmpty) Seq.empty
    else (0 until 4).map { b =>
      b -> md5hex(sh.map(s => md5hex((2 * b).toString + s)).min +
        sh.map(s => md5hex((2 * b + 1).toString + s)).min)
    }
  }

  private def bruteCandidates(docs: Seq[(Long, String)]): Set[(Long, Long)] =
    (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      shared = bandsOf(ta).toSet intersect bandsOf(tb).toSet
      if shared.nonEmpty
    } yield (ia, ib)).toSet

  test("banded candidates equal the brute salted-minima band join") {
    import spark.implicits._
    val rnd = new scala.util.Random(37)
    val vocab = Vector("red", "blue", "green", "gold", "iron", "clay")
    def sentence(n: Int) =
      Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val base = (1L to 10L).map(i => i -> sentence(6 + rnd.nextInt(6)))
    val dups = base.take(3).map { case (i, t) => (i + 100L) -> t }
    val docs = base ++ dups
    def sig(salt: String) = graft.functions.salted_md5_min(col("tok"), salt)
    val bands = docs.toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ").as("tok"))
      .select(col("doc_id"), posexplode(array((0 until 4).map(b =>
        md5(concat(sig((2 * b).toString), sig((2 * b + 1).toString)))): _*))
        .as(Seq("band_idx", "band_val")))
      .filter(col("band_val").isNotNull)
    val got = bands
      .select(col("band_idx"), col("band_val"), col("doc_id").as("id_a"))
      .join(bands.select(col("band_idx"), col("band_val"),
        col("doc_id").as("id_b")), Seq("band_idx", "band_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == bruteCandidates(docs))
    // exact-duplicate theorem: every planted verbatim copy is found
    assert(Seq(1L, 2L, 3L).forall(i => got.contains((i, i + 100L))))
  }
}
