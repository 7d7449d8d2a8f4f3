package graft.engine

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join == plain join on skewed data (inner and left)") {
    // hot key: 10k rows of key 1, long tail of others
    val big = spark.range(10000).select(lit(1L).as("k"), col("id").as("v"))
      .unionAll(spark.range(100).select((col("id") + 2).as("k"),
        col("id").as("v")))
    val small = Seq((1L, "hot"), (2L, "cold"), (999L, "missing-from-big"))
      .toDF("k", "name")
    for (jt <- Seq("inner", "left")) {
      val plain = big.join(small, Seq("k"), jt)
        .select("k", "v", "name").collect().map(_.toSeq).toSet
      val salted = SkewJoin.saltedJoin(big, small, Seq("k"), salt = 8, jt)
        .select("k", "v", "name").collect().map(_.toSeq).toSet
      assert(salted == plain, s"join type $jt diverged")
    }
  }

  test("salt actually spreads a hot key across partitions") {
    val big = spark.range(1000).select(lit(1L).as("k"), col("id").as("v"))
    val salted = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(8)).cast("int"))
    val spread = salted.select("__salt").distinct().count()
    assert(spread == 8)
  }
}
