package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.VectorFunctions

class LongArrayDotSpec extends SparkSpec {
  import spark.implicits._

  test("codegen'd dot == higher-order-function dot on real embeddings") {
    val e = spark.read.parquet(sf() + "/embeddings.parquet").limit(50)
      .select(col("vec_id"), VectorFunctions.quantize(col("embedding")).as("qv"))
    val a = e.select(col("vec_id").as("v1"), col("qv").as("q1"))
    val b = e.select(col("vec_id").as("v2"), col("qv").as("q2"))
    val pairs = a.crossJoin(b)
      .withColumn("fast", LongArrayDot(col("q1"), col("q2")))
      .withColumn("slow", aggregate(zip_with(col("q1"), col("q2"), _ * _),
        lit(0L), _ + _))
    assert(pairs.filter(col("fast") =!= col("slow")).count() == 0)
  }

  test("null propagation and length mismatch") {
    val df = Seq(
      (Some(Seq(1L, 2L)), Some(Seq(3L, 4L, 99L))),  // extra elems ignored
      (None, Some(Seq(1L)))
    ).toDF("a", "b")
    val out = df.select(LongArrayDot(col("a"), col("b"))).collect()
    assert(out(0).getLong(0) == 11L)
    assert(out(1).isNullAt(0))
  }

  test("registered as a SQL function via extensions") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT long_array_dot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d")
      .head().getLong(0)
    assert(r == 32L)
  }

  test("whole-stage codegen actually compiles the expression") {
    val e = spark.range(10).select(
      org.apache.spark.sql.functions.array(lit(1L), col("id")).as("a"))
    val plan = e.select(LongArrayDot(col("a"), col("a")).as("d"))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators fused into WholeStageCodegen;
    // the Project evaluating the expression must carry it (a
    // CodegenFallback expression would split the span instead)
    assert(plan.linesIterator.exists(l =>
      l.contains("long_array_dot") && l.trim.startsWith("*")), plan)
  }
}
