package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the q_iceberg_evolve table build — the
  * bench's largest single first-pass constant (115.9 s once at sf0.1,
  * r14 baseline). Isolates: identity writeTable, metadata-only spec
  * evolution, and the day-spec append whose ~2400 partition tuples
  * stress the composer's data-write layout.
  */
object EvolveProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.engine.GraftSession.build("evolve-probe", cpus = cpus)
    val ord = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"))

    def timed[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }

    val p = java.nio.file.Files
      .createTempDirectory("graft_evolveprobe").toString + "/tbl"
    timed("writeTable identity(status)") {
      graft.sources.Iceberg.writeTable(
        ord.where(col("o_orderkey") % 4 === 0), p, "o_orderstatus")
    }
    timed("evolvePartitionSpec day") {
      graft.sources.Iceberg.evolvePartitionSpec(
        p, Seq(("o_orderdate", "day")))
    }
    timed("appendToTable under day spec") {
      graft.sources.Iceberg.appendToTable(
        ord.where(col("o_orderkey") % 4 === 1), p)
    }
    timed("scan 2-week window") {
      graft.sources.Iceberg.scan(spark, p,
          sourceRange = Some(("o_orderdate", "1995-02-01", "1995-02-14")))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
