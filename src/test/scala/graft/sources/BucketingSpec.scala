package graft.sources

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {

  /** Force the sort-merge path — at test scale everything broadcasts,
    * which would bypass the bucket co-location being demonstrated. */
  private def withNoBroadcast[A](f: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed fact-fact join plans with no shuffle on either side") {
    Bucketing.writeBucketed(Tables.orders(spark, sf), "b_orders",
      "o_orderkey", buckets = 8, sortCols = Seq("o_orderkey"))
    Bucketing.writeBucketed(Tables.lineitem(spark, sf), "b_lineitem",
      "l_orderkey", buckets = 8, sortCols = Seq("l_orderkey"))

    withNoBroadcast {
      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(sum(col("l_quantity")).as("q"))

      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange"),
        s"bucketed join should not shuffle:\n$plan")

      // and it is the same result as the unbucketed join
      val expect = Tables.orders(spark, sf)
        .join(Tables.lineitem(spark, sf), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(sum(col("l_quantity")).as("q"))
        .collect().map(_.toString).sorted.toSeq
      assert(joined.collect().map(_.toString).sorted.toSeq == expect)
    }
  }

  test("aggregation on the bucket key also avoids the shuffle") {
    val agg = spark.table("b_lineitem")
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("ShuffleExchange"), plan)
  }
}
