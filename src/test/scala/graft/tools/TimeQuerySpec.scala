package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** Regression for the TimeQuery arg-parsing advice item: omitting the data
  * dir must error out loudly, not silently consume the first query name as
  * sfDir and time nothing. Both requires fire before any SparkSession is
  * built, so this spec stays session-free. */
class TimeQuerySpec extends AnyFunSuite {

  test("query name in the sfDir position is rejected") {
    val e = intercept[IllegalArgumentException] {
      TimeQuery.main(Array("q01_pricing_summary", "q02_filter_pushdown"))
    }
    assert(e.getMessage.contains("existing sf data dir"))
  }

  test("missing query list is rejected") {
    val e = intercept[IllegalArgumentException] {
      TimeQuery.main(Array("/tmp"))
    }
    assert(e.getMessage.contains("usage"))
  }
}
