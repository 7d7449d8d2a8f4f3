package graft.tools

import graft.SparkEntry

/** Plan-inspection CLI: print the formatted physical plan of named
  * queries without executing them. Usage: Explain <sfDir> <query...>
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = graft.engine.GraftSession.build("graft-explain",
      cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    args.drop(1).foreach { name =>
      println(s"==== $name ====")
      println(SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExtendedMode))
    }
    spark.stop()
  }
}
