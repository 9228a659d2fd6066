package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Incremental-CC contract: batched ingest with redeliveries ≡ a
  * from-scratch solve over all edges (ConnectedComponents.components is
  * the independent reference), in ANY batch order; the min-root theorem
  * survives a new node smaller than an existing root; an in-component
  * batch changes nothing; orphan versions are invisible. */
class VersionedCcIndexSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("vccidx").toString

  private def mapping(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.select("node", "root").as[(Long, Long)].collect().toMap

  private def reference(edges: Seq[(Long, Long)]): Map[Long, Long] =
    mapping(graft.operators.ConnectedComponents
      .components(edges.toDF("src", "dst"))
      .select(col("id").as("node"), col("component").as("root")))

  test("double-delivered edge batches ≡ from-scratch solve, in any order") {
    val rnd = new scala.util.Random(17)
    val edges = Seq.fill(60)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2)
    val want = reference(edges)
    for (order <- Seq(edges.grouped(20).toSeq, edges.grouped(20).toSeq.reverse)) {
      val idx = VersionedCcIndex.create(spark, tmp())
      order.zipWithIndex.foreach { case (b, i) =>
        assert(idx.mergeOnce(b.toDF("src", "dst"), i.toLong))
        assert(!idx.mergeOnce(b.toDF("src", "dst"), i.toLong))
      }
      assert(mapping(idx.live()) == want)
    }
  }

  test("a new node SMALLER than an existing root becomes the new root; " +
      "an in-component batch is a semantic no-op") {
    val idx = VersionedCcIndex.create(spark, tmp())
    assert(idx.mergeOnce(Seq((5L, 9L), (9L, 12L)).toDF("src", "dst"), 0L))
    assert(mapping(idx.live()) == Map(5L -> 5L, 9L -> 5L, 12L -> 5L))
    // batch fully inside the existing component: mapping unchanged
    assert(idx.mergeOnce(Seq((5L, 12L)).toDF("src", "dst"), 1L))
    assert(mapping(idx.live()) == Map(5L -> 5L, 9L -> 5L, 12L -> 5L))
    // node 0 joins: min-root theorem relabels the whole class
    assert(idx.mergeOnce(Seq((12L, 0L)).toDF("src", "dst"), 2L))
    assert(mapping(idx.live()) ==
      Map(0L -> 0L, 5L -> 0L, 9L -> 0L, 12L -> 0L))
  }

  test("orphan version above live is invisible; prune keeps live; " +
      "create is fresh; negative id rejected") {
    val dir = tmp()
    val idx = VersionedCcIndex.create(spark, dir)
    assert(idx.mergeOnce(Seq((1L, 2L)).toDF("src", "dst"), 0L))
    Seq((999L, 999L)).toDF("node", "root")
      .write.mode("overwrite").parquet(s"$dir/v7")
    assert(idx.liveVersion() == 0L)
    assert(!mapping(idx.live()).contains(999L))
    assert(idx.mergeOnce(Seq((2L, 3L)).toDF("src", "dst"), 1L))
    idx.prune()
    val dirs = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.startsWith("v")).toSet
    assert(dirs == Set("v1"))
    assert(!idx.mergeOnce(Seq((1L, 2L)).toDF("src", "dst"), 0L))
    intercept[IllegalArgumentException] {
      idx.mergeOnce(Seq((1L, 2L)).toDF("src", "dst"), -1L)
    }
    val fresh = VersionedCcIndex.create(spark, dir)
    assert(fresh.committed().isEmpty)
  }
}
