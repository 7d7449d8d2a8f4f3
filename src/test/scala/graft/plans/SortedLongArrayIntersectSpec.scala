package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SortedLongArrayIntersectSpec extends SparkSpec {
  import spark.implicits._

  test("two-pointer size == size(array_intersect) on sorted distinct " +
       "shingle sets from real documents") {
    val sh = spark.read.parquet(sf() + "/documents.parquet").limit(80)
      .select(col("doc_id"),
        // distinct is part of the expression's contract (the rolling
        // hash emits one value per WINDOW, with repeats)
        sort_array(array_distinct(
          graft.plans.RollingShingleHashes(col("text"), 16))).as("sh"))
    val a = sh.select(col("doc_id").as("d1"), col("sh").as("s1"))
    val b = sh.select(col("doc_id").as("d2"), col("sh").as("s2"))
    val pairs = a.crossJoin(b)
      .withColumn("fast",
        SortedLongArrayIntersectSize(col("s1"), col("s2")))
      .withColumn("slow",
        size(array_intersect(col("s1"), col("s2"))).cast("long"))
    assert(pairs.filter(col("fast") =!= col("slow")).count() == 0)
  }

  test("empty arrays, disjoint arrays, null propagation") {
    val df = Seq(
      (Some(Seq[Long]()), Some(Seq(1L, 2L))),
      (Some(Seq(1L, 3L, 5L)), Some(Seq(2L, 4L, 6L))),
      (Some(Seq(1L, 2L, 3L)), Some(Seq(2L, 3L, 9L))),
      (None, Some(Seq(1L)))
    ).toDF("a", "b")
    val out = df.select(
      SortedLongArrayIntersectSize(col("a"), col("b"))).collect()
    assert(out(0).getLong(0) == 0L)
    assert(out(1).getLong(0) == 0L)
    assert(out(2).getLong(0) == 2L)
    assert(out(3).isNullAt(0))
  }

  test("registered as SQL functions via extensions") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT sorted_long_array_intersect_size(array(1L, 3L, 5L), " +
        "array(3L, 5L, 9L)) AS n").head().getLong(0)
    assert(r == 2L)
    val g = spark.sql(
      "SELECT qcosine_gate(array(10L, 0L), array(10L, 0L), 100L, 100L, " +
        "9, 10) AS ok").head().getBoolean(0)
    assert(g) // cos = 1 >= 0.9
    val g2 = spark.sql(
      "SELECT qcosine_gate(array(10L, 0L), array(0L, 10L), 100L, 100L, " +
        "1, 10) AS ok").head().getBoolean(0)
    assert(!g2) // orthogonal: d = 0 -> gate false
  }

  test("whole-stage codegen actually compiles the expression") {
    val e = spark.range(10).select(
      array(col("id"), col("id") + 5L).as("a"))
    val plan = e.select(
      SortedLongArrayIntersectSize(col("a"), col("a")).as("d"))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("sorted_long_array_intersect_size") &&
        l.trim.startsWith("*")), plan)
  }
}
