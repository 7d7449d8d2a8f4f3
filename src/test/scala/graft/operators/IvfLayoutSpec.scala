package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The IVF clustered-write layout claimed in ARCHITECTURE ("at 100 TB the
  * assignment is a clustered write so probes prune files"): writing the
  * cell assignment partitioned by cent_id must let a probe's cell filter
  * prune at the FILE level — the scan touches only the probed cells'
  * directories, not the whole index.
  */
class IvfLayoutSpec extends SparkSpec {

  test("cell-partitioned index write -> probe filter prunes partitions") {
    import graft.functions.VectorFunctions.quantize
    import graft.plans.LongArrayDot
    val e = spark.read.parquet(sf() + "/embeddings.parquet")
    val cents = e.orderBy(col("vec_id")).limit(8)
      .select(col("vec_id").as("cent_id"),
        quantize(col("embedding")).as("cent_v"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cid")).orderBy(col("cscore").desc, col("cent_id"))
    val assigned = e
      .select(col("vec_id").as("cid"), quantize(col("embedding")).as("cv"))
      .crossJoin(broadcast(cents))
      .withColumn("cscore", LongArrayDot(col("cv"), col("cent_v")))
      .withColumn("crank", row_number().over(w))
      .filter(col("crank") === 1)
      .select(col("cid"), col("cent_id"), col("cv"))

    val dir = java.nio.file.Files
      .createTempDirectory("graft_ivf_layout").toString
    assigned.write.mode("overwrite")
      .partitionBy("cent_id").parquet(dir)

    val index = spark.read.parquet(dir)
    val probe = index.filter(col("cent_id").isin(0, 3))
    val plan = probe.queryExecution.executedPlan.toString
    // partition pruning must appear at the scan, not as a post-filter
    assert(plan.contains("PartitionFilters: [") &&
      !plan.contains("PartitionFilters: []"), plan.take(1200))
    // only the probed cells' directories are read
    val scannedCells = probe.select("cent_id").distinct()
      .collect().map(_.getInt(0) & 0xffffffffL).toSet
    assert(scannedCells.subsetOf(Set(0L, 3L)))
    // and pruning is visible in the files actually opened: every file
    // the probe reads lives under a probed cell's directory, and the
    // full index holds strictly more files
    def filesRead(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.select(input_file_name()).distinct()
        .collect().map(_.getString(0)).toSet
    val probedFiles = filesRead(probe)
    val allFiles = filesRead(index)
    assert(probedFiles.nonEmpty && probedFiles.size < allFiles.size,
      s"probe read ${probedFiles.size} of ${allFiles.size} files")
    assert(probedFiles.forall(f =>
      f.contains("cent_id=0") || f.contains("cent_id=3")), probedFiles)
  }
}
