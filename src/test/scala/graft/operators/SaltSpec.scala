package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SaltSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregation equals plain aggregation (incl. a hot key)") {
    val df = ((1 to 10000).map(i => ("hot", i.toLong, i.toDouble)) ++
      (1 to 50).map(i => (s"k$i", i.toLong, i.toDouble)))
      .toDF("key", "id", "v")
    val salted = Salt.saltedSumCount(df, Seq("key"), "v", col("id"), salts = 8)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val plain = df.groupBy("key").agg(sum("v"), count(lit(1)))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(salted.keySet == plain.keySet)
    plain.foreach { case (k, (s, n)) =>
      assert(salted(k)._2 == n)
      assert(math.abs(salted(k)._1 - s) < 1e-6)
    }
  }

  test("salted join equals plain join") {
    val big = (1 to 5000).map(i => ("hot", i.toLong)).toDF("key", "id")
      .union(Seq(("cold", 1L)).toDF("key", "id"))
    val small = Seq(("hot", "H"), ("cold", "C"), ("absent", "A")).toDF("key", "tag")
    val salted = Salt.saltedJoin(big, small, Seq("key"), col("id"), salts = 4)
      .select("key", "id", "tag").as[(String, Long, String)].collect().toSet
    val plain = big.join(small, Seq("key"))
      .select("key", "id", "tag").as[(String, Long, String)].collect().toSet
    assert(salted == plain)
  }

  test("salt is deterministic across re-evaluation") {
    val df = (1 to 100).map(i => i.toLong).toDF("id")
      .withColumn("s", Salt.saltCol(col("id"), 8))
    assert(df.collect().toSeq == df.collect().toSeq)
    assert(df.select("s").distinct().count() > 1)
  }
}
