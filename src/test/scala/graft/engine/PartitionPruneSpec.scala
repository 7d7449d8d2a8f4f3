package graft.engine

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Partition-layout pruning: a date-partitioned sink layout lets a
  * day-filtered read skip every other partition AT PLANNING TIME
  * (`PruneFileSourcePartitions` -> PartitionFilters in the scan). This
  * is the layout contract the 100 TB story rests on: the dominant scan
  * dimension (ingest day) must never be re-read to answer a
  * day-bounded query.
  */
class PartitionPruneSpec extends SparkSpec {

  test("day-partitioned layout: a day filter prunes to one partition") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_part").toString
    val events = Readers.table(spark, sf(), "events")
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    Sink.write(events, "events_bydate",
      SinkConfig(format = "parquet", mode = "overwrite",
        path = Some(root), partitionBy = Seq("day")))

    val read = spark.read.parquet(s"$root/events_bydate")
      .filter(col("day") === "2024-01-03")
    val plan = read.queryExecution.executedPlan.toString
    // the day predicate must appear as a PartitionFilter (metadata-only
    // pruning), not a post-scan data Filter
    val scanLine = plan.linesIterator
      .find(_.contains("PartitionFilters")).getOrElse("")
    assert(scanLine.contains("day"), plan.take(1200))
    // and only one partition's rows are read
    val expect = events.filter(col("day") === "2024-01-03").count()
    val plan2 = read.queryExecution.executedPlan
    assert(plan2.executeCollect().length == expect && expect > 0)
    // physical proof: the executed scan touched exactly one partition
    val scan = plan2.collectLeaves()
      .collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
    assert(scan.nonEmpty, "no FileSourceScanExec found")
    assert(scan.get.metrics("numPartitions").value == 1,
      scan.get.metrics.map { case (k, m) => s"$k=${m.value}" }.mkString(", "))
  }
}
