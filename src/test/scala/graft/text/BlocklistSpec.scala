package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Aho-Corasick blocklist contract. Independent reference: a brute-force
  * all-occurrence scan (every start position × every pattern). */
class BlocklistSpec extends SparkSpec {

  private def brute(text: String, patterns: Seq[String]): (Long, Int) = {
    val hits = patterns.map { p =>
      (0 to text.length - p.length).count(i => text.regionMatches(i, p, 0, p.length))
    }
    (hits.map(_.toLong).sum, hits.count(_ > 0))
  }

  test("classic she/he/hers/his fixture: overlapping + chained matches") {
    val ac = new Blocklist.Automaton(Seq("he", "she", "his", "hers"))
    // "ushers": she (1), he (2), hers (3) -- 'he' inside 'she' AND 'hers'
    assert(ac.scan("ushers") == (3L, (1L << 0) | (1L << 1) | (1L << 3)))
    assert(ac.scan("his") == (1L, 1L << 2))
    assert(ac.scan("xyz") == (0L, 0L))
  }

  test("bordered pattern counts ALL occurrences (what SQL replace cannot)") {
    val ac = new Blocklist.Automaton(Seq("aa"))
    assert(ac.scan("aaaa")._1 == 3L) // replace-arithmetic would say 2
  }

  test("randomized agreement with the brute-force reference") {
    val pats = Seq("ab", "bca", "aabb", "c", "cab")
    val ac = new Blocklist.Automaton(pats)
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val s = (1 to 30).map(_ => "abc" (rnd.nextInt(3))).mkString
      val (hits, mask) = ac.scan(s)
      val (bHits, bPats) = brute(s, pats)
      assert(hits == bHits, s"hits on '$s'")
      assert(java.lang.Long.bitCount(mask) == bPats, s"patterns on '$s'")
    }
  }

  test("operator: per-doc stats over a frame, rejects bad dictionaries") {
    import spark.implicits._
    val df = Seq((1L, "the slow fast merge path"), (2L, "nothing here"),
      (3L, "merge merge")).toDF("doc_id", "text")
    val got = Blocklist.scan(df, "doc_id", "text",
      Seq("slow fast", "merge")).orderBy("doc_id").collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSeq ==
      Seq((1L, 2L, 2, 1), (2L, 0L, 0, 0), (3L, 2L, 1, 1)))
    intercept[IllegalArgumentException] { new Blocklist.Automaton(Nil) }
    intercept[IllegalArgumentException] { new Blocklist.Automaton(Seq("a", "a")) }
    intercept[IllegalArgumentException] { new Blocklist.Automaton(Seq("")) }
    intercept[IllegalArgumentException] {
      new Blocklist.Automaton((1 to 65).map("p" + _))
    }
  }
}
