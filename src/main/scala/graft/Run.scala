package graft

import org.apache.spark.sql.SparkSession
import graft.engine.{EngineConfig, Pipeline}

/** CLI entry point — the engine's `main.go` (GCS2Postgres src/main.go:11-44):
  * load YAML config, run the pipeline, report per-table results.
  * Usage: graft.Run <config.yaml> [parallelism]
  */
object Run {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.Run <config.yaml> [parallelism]")
    val config = EngineConfig.fromYamlFile(args(0))
    val parallelism = if (args.length > 1) args(1).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = Pipeline.run(spark, config, parallelism)
    results.foreach { r =>
      if (r.ok)
        println(s"[graft] ${r.job.source} -> ${r.job.target}: ${r.rows.get} rows")
      else
        println(s"[graft] ${r.job.source} -> ${r.job.target}: FAILED: ${r.error.get.getMessage}")
    }
    spark.stop()
    if (results.exists(!_.ok)) sys.exit(1)
  }
}
