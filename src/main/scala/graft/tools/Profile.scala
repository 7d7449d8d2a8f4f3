package graft.tools

import graft.SparkEntry

/** Perf triage CLI: run named queries N times in one JVM and print
  * per-repeat seconds — separates one-time planning/codegen constants
  * (first run only) from real per-run compute. Usage:
  *   Profile <sfDir> <repeats> <query...>   (no queries = all)
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = graft.engine.GraftSession.build("graft-profile",
      cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    // same warmup as Bench
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count()
      .write.format("noop").mode("overwrite").save()
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-24s ${ts.map(t => f"$t%6.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
