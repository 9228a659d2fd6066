package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The geometric-mechanism table and lookup: exact structure of the
  * inverse CDF (partition of the grid, probabilities vs an independent
  * floating-point reference, near-symmetry), boundary-exact lookup
  * behavior of the CASE chain (Scala and SQL twins agree), determinism,
  * clamping, and a loose distributional sanity check over many keys. */
class DpNoiseSpec extends SparkSpec {
  import spark.implicits._

  private val K = 30
  private val table = DpNoise.geometricThresholds(K)

  test("thresholds PARTITION [0, 2^48) in ascending z order") {
    assert(table.head._2 == 0L)
    assert(table.last._3 == DpNoise.Grid)
    table.sliding(2).foreach { case Seq((_, _, hi), (_, lo, _)) =>
      assert(hi == lo, "rows must be contiguous")
    }
    assert(table.map(_._1) == (-K to K).map(_.toLong))
    table.foreach { case (_, lo, hi) => assert(lo < hi) }
  }

  test("widths match the geometric pmf within 1 grid unit of the " +
      "independent double reference; +K absorbs the truncated tail") {
    table.foreach { case (z, lo, hi) =>
      val width = (hi - lo).toDouble / DpNoise.Grid.toDouble
      val p = math.pow(0.5, math.abs(z).toDouble) / 3.0
      val tol =
        if (z == K) math.pow(0.5, (K - 1).toDouble) / 3.0 + 1e-12
        else 2.0 / DpNoise.Grid.toDouble
      assert(math.abs(width - p) <= tol, s"z=$z width=$width p=$p")
    }
    // near-symmetry: |width(z) − width(−z)| ≤ 1 grid unit below the cap
    (1 until K).foreach { k =>
      val w1 = table.find(_._1 == k.toLong).get
      val w2 = table.find(_._1 == -k.toLong).get
      assert(math.abs((w1._3 - w1._2) - (w2._3 - w2._2)) <= 1L)
    }
  }

  test("lookup is boundary-exact and the Scala chain agrees with the " +
      "SQL twin at every lo and hi−1") {
    val probes = table.flatMap { case (z, lo, hi) =>
      Seq((lo, z), (hi - 1, z)) }
    val df = probes.toDF("u48", "want")
    val got = df.select(col("want"),
        DpNoise.noiseFor(col("u48"), K).as("scala_z"),
        expr(DpNoise.noiseForSql("u48", K)).as("sql_z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (want, sc, sq) =>
      assert(sc == want && sq == want, s"want=$want scala=$sc sql=$sq")
    }
  }

  test("mechanism is deterministic in (key, salt) and the clamp holds") {
    val keys = (1 to 500).map(i => s"group_$i").toDF("k")
    val u = DpNoise.uniform48(col("k"), "|dp1")
    val a = keys.select(col("k"), DpNoise.noiseFor(u, K).as("z"))
      .as[(String, Long)].collect().toMap
    val b = keys.select(col("k"), DpNoise.noiseFor(u, K).as("z"))
      .as[(String, Long)].collect().toMap
    assert(a == b)
    val clamped = keys
      .select(DpNoise.noisyCount(lit(1L), u, K).as("n"))
      .as[Long].collect()
    assert(clamped.forall(_ >= 0L))
    assert(clamped.exists(_ == 0L), "some count-1 releases clamp to 0")
  }

  test("distributional sanity over 20k keys: P(0) near 1/3, " +
      "P(|z|<=2) near 5/6, mean near 0") {
    val n = 20000
    val zs = (1 to n).map(i => s"key_$i").toDF("k")
      .select(DpNoise.noiseFor(DpNoise.uniform48(col("k"), "|s"), K).as("z"))
      .as[Long].collect()
    val p0 = zs.count(_ == 0L).toDouble / n
    assert(p0 > 0.31 && p0 < 0.36, s"P(0)=$p0")
    // P(|z|<=2) = 1/3 + 2·(1/6 + 1/12) = 5/6 ≈ 0.8333
    val p2 = zs.count(z => math.abs(z) <= 2L).toDouble / n
    assert(p2 > 0.81 && p2 < 0.86, s"P(|z|<=2)=$p2")
    val mean = zs.sum.toDouble / n
    assert(math.abs(mean) < 0.05, s"mean=$mean")
  }
}
