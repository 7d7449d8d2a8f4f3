package graft.tools

import org.apache.spark.sql.functions._

/** Micro-probe for the serial cost of the hash-stability numeric policy
  * (sum(cast(double as decimal)) over a single-row-group scan): times
  * scan-only, plain double sums, and the decimal-cast sums the oracle
  * contract mandates, each over the same lineitem slice.
  */
object DecProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.engine.GraftSession.build("dec-probe",
      cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")

    def bench(tag: String)(f: => Unit): Unit = {
      val times = (1 to 4).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[dec] $tag%-34s ${times.map(t => f"$t%5.2f").mkString(" ")}")
    }

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    bench("scan 4 cols only") {
      noop(li.select("l_quantity", "l_extendedprice", "l_returnflag",
        "l_linestatus"))
    }
    bench("groupBy + double sums") {
      noop(li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity")), sum(col("l_extendedprice")),
          avg(col("l_quantity")), count(lit(1))))
    }
    bench("groupBy + decimal-cast sums") {
      noop(li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity").cast("decimal(18,2)")),
          sum(col("l_extendedprice").cast("decimal(18,2)")),
          avg(col("l_quantity").cast("decimal(18,2)")),
          count(lit(1))))
    }
    bench("project decimal casts only") {
      noop(li.select(col("l_quantity").cast("decimal(18,2)"),
        col("l_extendedprice").cast("decimal(18,2)")))
    }
    spark.stop()
  }
}
