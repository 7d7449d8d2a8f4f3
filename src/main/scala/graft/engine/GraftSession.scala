package graft.engine

import org.apache.spark.sql.SparkSession

/** Central SparkSession factory with the engine's tuning defaults.
  *
  * The knobs that matter at 100 TB, set once:
  *   - shuffle.partitions sized to the cluster (env-driven here; on a
  *     real cluster 2-3x total cores, with AQE coalescing the tail)
  *   - AQE on: runtime re-plan, skew-join splitting, partition coalescing
  *   - files.maxPartitionBytes default 128m: scan-task granularity —
  *     raise for wide-row tables to cut task-scheduling overhead
  *   - UTC session timezone: oracle parity and sane event-time semantics
  */
object GraftSession {

  def build(appName: String = "graft",
            cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"),
            extraConfs: Map[String, String] = Map.empty): SparkSession = {
    // catalog state (bucketed saveAsTable, derby metastore) goes to tmp,
    // not the process cwd
    val cat = java.nio.file.Files.createTempDirectory("graft_catalog").toString
    if (System.getProperty("derby.system.home") == null)
      System.setProperty("derby.system.home", cat)
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", s"$cat/warehouse")
      .config("spark.ui.enabled", "false")
    extraConfs.foreach { case (k, v) => b.config(k, v) }
    // deployment-specific overrides without a code change:
    // SPARK_GRAFT_EXTRA_CONFS="k=v;k=v" (cluster runs tune e.g.
    // files.maxPartitionBytes / advisoryPartitionSizeInBytes here; the
    // local bench default stays exactly the baseline above)
    sys.env.get("SPARK_GRAFT_EXTRA_CONFS").foreach {
      _.split(";").filter(_.contains("=")).foreach { kv =>
        val i = kv.indexOf('=')
        b.config(kv.take(i).trim, kv.drop(i + 1).trim)
      }
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
