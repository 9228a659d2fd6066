package graft

import org.apache.spark.sql.SparkSession

/** Every declared query must produce identical rows regardless of the
  * shuffle partitioning — the bug class this guards against is real: a
  * non-total window ORDER BY passed the sf0.01 oracle and broke at sf0.1
  * (q13, fixed by a price tiebreak). Runs the full surface at sf0.001
  * under two different shuffle-partition settings and compares. */
class QueryDeterminismSpec extends SparkSpec {

  private def runAll(parts: Int): Map[String, Seq[String]] = {
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    try {
      SparkEntry.allQueries.map { q =>
        q.name -> q.run(spark, sf).collect().map(_.toString).sorted.toSeq
      }.toMap
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", "4")
    }
  }

  test("all queries are partition-count invariant at sf0.001") {
    spark.catalog.clearCache()
    val a = runAll(3)
    spark.catalog.clearCache()
    val b = runAll(7)
    val names = SparkEntry.allQueries.map(_.name)
    val diffs = names.filter(n => a(n) != b(n))
    assert(diffs.isEmpty, s"partition-dependent queries: $diffs")
    // sanity: the surface is non-trivial
    assert(names.size >= 55)
    assert(a.values.count(_.nonEmpty) >= 50)
  }
}
