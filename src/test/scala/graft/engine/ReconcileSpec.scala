package graft.engine

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ReconcileSpec extends SparkSpec {

  test("round-tripped load reconciles; layout and order are irrelevant") {
    val src = spark.read.parquet(sf() + "/orders.parquet")
    val out = java.nio.file.Files.createTempDirectory("graft_rec").toString
    src.repartition(7).write.mode("overwrite").parquet(s"$out/orders")
    val sink = spark.read.parquet(s"$out/orders")
      .orderBy(col("o_totalprice"))  // different order, different layout
    val r = Reconcile.compare(src, sink)
    assert(r.ok, r.toString)
  }

  test("a dropped row, a mutated value, and a duplicated row all fail") {
    val src = spark.read.parquet(sf() + "/orders.parquet")
    assert(!Reconcile.compare(src, src.limit(100)).ok)
    val mutated = src.withColumn("o_totalprice",
      when(col("o_orderkey") === 1, col("o_totalprice") + 0.01)
        .otherwise(col("o_totalprice")))
    val rm = Reconcile.compare(src, mutated)
    assert(rm.sourceRows == rm.sinkRows && !rm.ok)
    assert(!Reconcile.compare(src, src.unionAll(src.limit(1))).ok)
  }

  test("case-insensitive column matching; mismatched sets rejected") {
    val src = spark.read.parquet(sf() + "/region.parquet")
    val upper = src.toDF(src.columns.map(_.toUpperCase).toIndexedSeq: _*)
    assert(Reconcile.compare(src, upper).ok)
    val e = intercept[IllegalArgumentException](
      Reconcile.compare(src, src.drop("r_name")))
    assert(e.getMessage.contains("column sets differ"))
  }
}
