package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * $SPARK_GRAFT_SF_DIR and prints ONE JSON line
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}.
  *
  * Each query is materialized through a `noop` datasource write — unlike
  * `count()`, that forces every output column through the full plan
  * (count() lets Catalyst drop final sorts and prune all columns, which
  * under-measures scan+compute).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.engine.GraftSession.build("graft-bench",
      cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    // warm the JVM (codegen compiler, parquet reader, shuffle machinery,
    // sort + exchange paths) so the first measured query isn't charged
    // for session start-up or first-use JIT
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").count()
        .write.format("noop").mode("overwrite").save()
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .orderBy("l_orderkey", "l_linenumber")
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }
    // optional args = query-name filter (dev iteration on hotspots);
    // the driver passes none and always measures the full set
    val selected =
      if (args.isEmpty) SparkEntry.queries
      else {
        val unknown = args.filterNot(SparkEntry.queries.contains)
        require(unknown.isEmpty,
          s"unknown quer${if (unknown.length == 1) "y" else "ies"}: " +
            unknown.mkString(", "))
        SparkEntry.queries.filter { case (n, _) => args.contains(n) }
      }
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // compact formatting (3 decimals, no exponent): the driver captures
    // only the tail of stdout, and an over-long JSON line gets its head
    // truncated out of the capture window -> unparseable (BENCH_r01)
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def f2(v: Double): String = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f2(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val line =
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    spark.stop()
    // print LAST, after Spark's shutdown logging, so the line sits at the
    // very end of the captured tail
    println(line)
  }
}
