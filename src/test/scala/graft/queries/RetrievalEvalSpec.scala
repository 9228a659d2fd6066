package graft.queries

import graft.SparkSpec
import graft.SparkEntry

/** q214 retrieval-eval contract: the aggregate identities re-derived
  * row by row in the driver (the metric definitions, independent of the
  * SQL that computed them), plus the structural facts the metric
  * depends on — full lists, per-(ranker, probe) coverage. */
class RetrievalEvalSpec extends SparkSpec {

  test("q214 metrics satisfy their definitions row by row") {
    val rows = SparkEntry.queries("q214_retrieval_eval")(spark, sf).collect()
    val rankers = rows.map(_.getString(0)).toSet
    assert(rankers == Set("bm25", "jac", "rrf", "vec", "rm3"))
    // one row per (ranker, probe): 5 × 5
    assert(rows.length == 25)
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSet.size == 25)
    for (r <- rows) {
      val (nRanked, nRel) = (r.getLong(2), r.getLong(3))
      assert(nRanked >= 1 && nRanked <= 10)
      assert(nRel >= 0 && nRel <= nRanked)
      // prec_ppm is EXACTLY the truncating ratio of the two counts
      assert(r.getLong(4) == nRel * 1000000L / nRanked)
      if (nRel == 0) assert(r.isNullAt(5))
      else {
        val first = r.getLong(5)
        assert(first >= 1 && first <= nRanked)
      }
    }
    // the fusion of two rankers can't lose every probe to both inputs:
    // RRF's top-10 is drawn from the union of lists that contain the
    // relevant docs, so total rrf hits >= max per-input hits is NOT a
    // theorem — but a complete miss on a probe both inputs hit IS
    // impossible when the hit sits in an input's top-10 that survives
    // fusion; assert the weaker sanity: rrf has >= 1 relevant hit
    // wherever BOTH inputs have their first hit at rank 1
    val byKey = rows.map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    for (q <- 0L to 4L) {
      val bmFirst = Option(byKey(("bm25", q))).filter(!_.isNullAt(5)).map(_.getLong(5))
      val jcFirst = Option(byKey(("jac", q))).filter(!_.isNullAt(5)).map(_.getLong(5))
      if (bmFirst.contains(1L) && jcFirst.contains(1L))
        assert(byKey(("rrf", q)).getLong(3) >= 1L,
          s"rrf missed probe $q though both inputs hit at rank 1")
    }
  }
}
