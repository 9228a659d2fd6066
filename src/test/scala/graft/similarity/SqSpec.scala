package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SQ8 contract: quantization theorems, a hand-computed fixture, and
  * measured recall vs the exact integer-dot ranking. */
class SqSpec extends SparkSpec {

  import spark.implicits._

  private def ppm(x: Double): Long =
    (math.signum(x * 1e6) * math.floor(math.abs(x * 1e6) + 0.5)).toLong

  test("hand-computed 2-dim fixture: codes, reconstruction, both scores") {
    // dim 1 values: 0.0, 1.0 -> lo=0, span=1000000
    // dim 2 values: -0.5, 0.5 -> lo=-500000, span=1000000
    val df = Seq(
      (1L, Seq(0.0f, -0.5f)), (2L, Seq(1.0f, 0.5f))).toDF("vec_id", "embedding")
    val st = Sq.stats(df, "vec_id", "embedding")
      .orderBy("d").as[(Int, Long, Long)].collect().toSeq
    assert(st == Seq((1, 0L, 1000000L), (2, -500000L, 1000000L)))
    val codes = Sq.encode(df, "vec_id", "embedding", Sq.stats(df, "vec_id", "embedding"))
      .orderBy("id").as[(Long, Seq[Int])].collect().toSeq
    assert(codes == Seq((1L, Seq(0, 0)), (2L, Seq(255, 255))))
    // recon for code 255: lo + (255*span) div 255 = lo + span = exact hi
    val out = Sq.topK(
        Sq.encode(df, "vec_id", "embedding", Sq.stats(df, "vec_id", "embedding")),
        Sq.stats(df, "vec_id", "embedding"),
        df.filter($"vec_id" === 1L), df, "vec_id", "embedding", k = 1, factor = 2)
      .as[(Long, Int, Long, Long, Long)].collect().toSeq
    // probe 1 vs corpus 2: qppm = (0, -500000); recon(2) = (1000000, 500000)
    // adc_i = 0*1000000 + (-500000)*500000 = -250000000000 ; exact same
    assert(out == Seq((1L, 1, 2L, -250000000000L, -250000000000L)))
  }

  test("quantization theorems: codes in [0,255], |recon - v| <= span div 255 + 1") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val st = Sq.stats(e, "vec_id", "embedding")
    val bad = Sq.encode(e, "vec_id", "embedding", st)
      .select(col("id"), posexplode(col("codes")))
      .select(col("id"), (col("pos") + 1).as("d"), col("col").as("code"))
      .join(broadcast(st), "d")
      .withColumn("recon", expr("lo + (cast(code as bigint) * span) div 255"))
      .join(
        e.select(col("vec_id").as("id"),
          posexplode(col("embedding").cast("array<double>")))
          .select(col("id"), (col("pos") + 1).as("d"),
            graft.functions.fixed_point(col("col"), 1e6).as("vppm")),
        Seq("id", "d"))
      .filter(col("code") < 0 || col("code") > 255 ||
        abs(col("recon") - col("vppm")) > col("span") / lit(255L) + 1)
      .count()
    assert(bad == 0L)
  }

  test("measured recall vs exact integer-dot top-10 on the test corpus") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val st = Sq.stats(e, "vec_id", "embedding")
    val codes = Sq.encode(e, "vec_id", "embedding", st)
    val probes = e.filter($"vec_id" < 20)
    val got = Sq.topK(codes, st, probes, e, "vec_id", "embedding", k = 10, factor = 4)
      .select("qid", "nn").as[(Long, Long)].collect().toSet
    // exact reference: brute-force integer dot on the same ppm grid
    val varr = e.select(col("vec_id").as("id"),
      expr("transform(cast(embedding as array<double>), " +
        "x -> cast(signum(x * 1e6) * floor(abs(x * 1e6) + 0.5) as bigint))").as("v"))
    val q = varr.filter($"id" < 20)
      .select(col("id").as("qid"), col("v").as("qv"))
    val exact = varr.crossJoin(q).filter($"id" =!= $"qid")
      .select($"qid", $"id", expr(
        "aggregate(sequence(1, size(v)), cast(0 as bigint), " +
          "(acc, i) -> acc + element_at(qv, i) * element_at(v, i))").as("s"))
      .withColumn("r", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"qid")
          .orderBy($"s".desc, $"id")))
      .filter($"r" <= 10).select("qid", "id").as[(Long, Long)].collect().toSet
    val recall = (got intersect exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"SQ8 recall $recall below floor") // observed ~1.0
  }

  test("partitioning independence") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    def run(df: org.apache.spark.sql.DataFrame) = {
      val st = Sq.stats(df, "vec_id", "embedding")
      Sq.topK(Sq.encode(df, "vec_id", "embedding", st), st,
          df.filter($"vec_id" < 3), df, "vec_id", "embedding", 5, 4)
        .collect().map(_.toSeq).toSeq
    }
    assert(run(e.repartition(7)) == run(e.coalesce(1)))
  }
}
