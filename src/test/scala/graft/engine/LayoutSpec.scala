package graft.engine

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Laws for the Z-order layout: Morton-code arithmetic, and the
  * pruning property the layout exists for — under a predicate on the
  * SECOND dimension, a z-ordered table concentrates matches into few
  * files while a first-dimension sort spreads them over every file.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("InterleaveBits: known vectors and the bit-position contract " +
       "(first key at even positions)") {
    val rows = Seq((5L, 3L), (0L, 0L), (1L, 0L), (0L, 1L),
      ((1L << 21) - 1, (1L << 21) - 1),
      // wraps: only the low 21 bits participate
      (1L << 21, 3L)).toDF("x", "y")
    val got = rows.select(
        graft.plans.InterleaveBits(col("x"), col("y"), 21)).as[Long]
      .collect().toSeq
    // x=5 (bits 0,2 -> pos 0,4 = 17), y=3 (bits 0,1 -> pos 1,3 = 10)
    assert(got == Seq(27L, 0L, 1L, 2L, (1L << 42) - 1, 2L + 8L))
  }

  test("zorderBy prunes BOTH dimensions; single-key sort prunes only " +
       "its own") {
    val n = 100000
    // independent dims (two multiplicative hashes of id mod 1024 are
    // linearly related — y would be a function of x and the x-sort
    // would accidentally prune y)
    val df = spark.range(n).select(
        pmod(xxhash64(col("id")), lit(1024L)).as("x"),
        pmod(xxhash64(col("id"), lit(1L)), lit(1024L)).as("y"))
      .localCheckpoint(true)
    val files = 16
    val zDir = java.nio.file.Files
      .createTempDirectory("graft_layout_z").toString
    val xDir = java.nio.file.Files
      .createTempDirectory("graft_layout_x").toString
    Layout.zorderBy(df, col("x"), col("y"), files, bits = 10)
      .write.mode("overwrite").parquet(zDir)
    Layout.orderByKey(df, col("x"), files)
      .write.mode("overwrite").parquet(xDir)
    val yPred = col("y") >= 100 && col("y") < 132 // 1/32 of the y range
    val xPred = col("x") >= 100 && col("x") < 132
    val zY = Layout.filesTouched(spark, zDir, yPred)
    val xY = Layout.filesTouched(spark, xDir, yPred)
    val zX = Layout.filesTouched(spark, zDir, xPred)
    val xX = Layout.filesTouched(spark, xDir, xPred)
    // x-sort is blind to y: every file holds y-matches
    assert(xY == files.toLong, s"x-sorted layout should spread " +
      s"y-matches over all $files files, got $xY")
    // the z-order concentrates them (sqrt-ish: expect <= half)
    assert(zY <= files / 2, s"z-order should prune y-predicates, " +
      s"touched $zY of $files")
    // and still prunes x (allowed a bit looser than the perfect sort)
    assert(xX <= 2, s"x-sorted baseline broken: $xX")
    assert(zX <= files / 2, s"z-order should prune x-predicates too, " +
      s"touched $zX of $files")
    // same rows either way (layout is a permutation)
    val a = spark.read.parquet(zDir).agg(
      sum(col("x") * 1024 + col("y"))).as[Long].head()
    val b = spark.read.parquet(xDir).agg(
      sum(col("x") * 1024 + col("y"))).as[Long].head()
    assert(a == b)
  }
}
