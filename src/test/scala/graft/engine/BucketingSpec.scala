package graft.engine

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Bucketed co-located joins: both fact tables written bucketed on the
  * join key -> the join plans with NO shuffle exchange on either side.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed-bucketed join has no shuffle exchange") {
    val sink = SinkConfig(format = "parquet", mode = "overwrite",
      bucketBy = Seq("l_orderkey"), numBuckets = 4)
    Sink.write(
      spark.read.parquet(sf() + "/lineitem.parquet")
        .withColumnRenamed("l_orderkey", "l_orderkey"),
      "li_bucketed", sink)
    Sink.write(
      spark.read.parquet(sf() + "/orders.parquet")
        .withColumnRenamed("o_orderkey", "l_orderkey"),
      "o_bucketed", sink.copy(bucketBy = Seq("l_orderkey")))

    val li = spark.table("li_bucketed")
    val o  = spark.table("o_bucketed")
    // disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = li.join(o, Seq("l_orderkey"))
        .groupBy("l_orderkey").count()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), plan.take(800))
      // and it still computes the right thing
      val expect = spark.read.parquet(sf() + "/lineitem.parquet")
        .join(spark.read.parquet(sf() + "/orders.parquet")
          .withColumnRenamed("o_orderkey", "l_orderkey"), Seq("l_orderkey"))
        .count()
      assert(joined.agg(sum("count")).head().getLong(0) == expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
