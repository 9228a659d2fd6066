package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near dup of 1
    (4L, "completely different words about spark catalyst optimizer and shuffles here"),
    (5L, "short doc"))
    .toDF("doc_id", "text")

  test("exact: duplicate maps to min id, others keep themselves") {
    val m = Dedup.exact(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(m(2L) == (1L, true))
    assert(m(1L) == (1L, false))
    assert(m(4L) == (4L, false))
  }

  test("minhash LSH finds the near-dup pair and not unrelated docs") {
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L))) // identical
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L))) // near dup
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("simhash near-dup: identical docs at hamming 0; hamming bound holds") {
    val pairs = Dedup.simhashNearDup(docs, "doc_id", "text", maxHamming = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Number](2).longValue()).toMap
    assert(pairs((1L, 2L)) == 0)
    assert(pairs.values.forall(_ <= 16))
    assert(!pairs.keys.exists(p => p._1 == 4L || p._2 == 4L))
    // the ≤3-hamming pigeonhole guarantee: pairs within 3 bits MUST be found
    val guaranteed = Dedup.simhashNearDup(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(guaranteed.contains((1L, 2L)))
  }

  test("embedding near-dup respects bucket boundary and threshold") {
    val vecs = Seq(
      (1L, 0, Seq(1f, 0f, 0f)),
      (2L, 0, Seq(0.99f, 0.1f, 0f)), // same bucket, close
      (3L, 1, Seq(1f, 0f, 0f)), // other bucket — never paired with 1
      (4L, 0, Seq(0f, 1f, 0f))) // same bucket, orthogonal
      .toDF("id", "bucket", "vec")
    val pairs = Dedup.embeddingNearDup(vecs, "id", "vec", "bucket", threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }
}
