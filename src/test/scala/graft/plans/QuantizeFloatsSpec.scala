package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

class QuantizeFloatsSpec extends SparkSpec {
  import spark.implicits._

  test("codegen'd quantize == higher-order-function form on real embeddings") {
    val e = spark.read.parquet(sf() + "/embeddings.parquet")
    val both = e.select(
      QuantizeFloats(col("embedding"), 1000).as("fast"),
      transform(col("embedding"),
        x => floor(x.cast("double") * 1000).cast("long")).as("slow"))
    assert(both.filter(not(col("fast") === col("slow"))).count() == 0)
  }

  test("negative values floor toward negative infinity") {
    val df = Seq(Seq(-0.0015f, 0.0015f, -1.0f)).toDF("v")
    val got = df.select(QuantizeFloats(col("v"), 1000).as("q"))
      .head().getSeq[Long](0)
    assert(got == Seq(-2L, 1L, -1000L))
  }

  test("null array propagates; stays inside whole-stage codegen") {
    val df = Seq(Option(Seq(1.5f)), None).toDF("v")
    val rows = df.select(QuantizeFloats(col("v"), 1000).as("q")).collect()
    assert(rows.exists(_.isNullAt(0)))
    val plan = spark.read.parquet(sf() + "/embeddings.parquet")
      .select(QuantizeFloats(col("embedding"), 1000).as("q"))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("quantize_floats") && l.trim.startsWith("*")), plan)
  }
}
