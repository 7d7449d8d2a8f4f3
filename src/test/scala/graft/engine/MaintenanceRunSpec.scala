package graft.engine

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Iceberg

/** Config-driven lakehouse maintenance laws: the YAML list drives the
  * real table ops in order, the full WAP + upkeep sequence changes no
  * answer, and failures isolate per table (later ops on a failed
  * table skip, other tables still run).
  */
class MaintenanceRunSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("a maintenance sequence (tag -> create_branch -> fast_forward " +
       "-> compact -> expire) drives the real table ops in order and " +
       "changes NO answer — upkeep is answer-invariant by law") {
    val li = spark.read.parquet(sf() + "/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_returnflag"))
    val a = li.where(col("l_orderkey") % 30 === 0)
    val b = li.where(col("l_orderkey") % 30 === 1)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_maint").toString
    Iceberg.writeTable(a, dir, "l_returnflag")
    Iceberg.createBranch(dir, "staging")
    Iceberg.appendToTable(b, dir, branch = Some("staging"))
    val want = rows(a.unionAll(b))
    val cfg = EngineConfig.fromYaml(
      s"""jobs: []
         |maintenance:
         |  - table: $dir
         |    op: fast_forward
         |    name: staging
         |  - table: $dir
         |    op: tag
         |    name: published-day-1
         |  - table: $dir
         |    op: compact
         |    sort_by: l_orderkey
         |  - table: $dir
         |    op: expire
         |    retain_last: 2
         |""".stripMargin)
    val results = Maintenance.run(spark, cfg.maintenance)
    assert(results.forall(_.ok),
      results.flatMap(_.error).map(_.getMessage).mkString("; "))
    // the published + compacted + trimmed table still answers exactly
    assert(rows(Iceberg.scan(spark, dir)) === want)
    val meta = Iceberg.currentMetadata(dir)
    assert(meta.refTypes("published-day-1") === "tag")
    assert(meta.snapshotOps(meta.currentSnapshotId) === "replace")
    // the tag pinned the pre-compaction published state through expiry
    assert(rows(Iceberg.scan(spark, dir,
      asOf = Some(meta.refs("published-day-1")))) === want)
  }

  test("failure isolation: a failing op skips LATER ops on the same " +
       "table (dependent sequences stop at the break) while another " +
       "table's maintenance still runs") {
    val li = spark.read.parquet(sf() + "/lineitem.parquet")
      .select(col("l_orderkey"), col("l_returnflag"))
      .where(col("l_orderkey") % 30 === 0)
    val t1 = java.nio.file.Files
      .createTempDirectory("graft_maint_t1").toString
    val t2 = java.nio.file.Files
      .createTempDirectory("graft_maint_t2").toString
    Iceberg.writeTable(li, t1, "l_returnflag")
    Iceberg.writeTable(li, t2, "l_returnflag")
    val results = Maintenance.run(spark, Seq(
      MaintenanceSpec(t1, "fast_forward", Map("name" -> "nope")),
      MaintenanceSpec(t1, "tag", Map("name" -> "never")),
      MaintenanceSpec(t2, "tag", Map("name" -> "fine"))))
    assert(!results(0).ok)
    assert(!results(1).ok &&
      results(1).error.get.getMessage.contains("skipped"))
    assert(results(2).ok)
    assert(Iceberg.currentMetadata(t2).refs.contains("fine"))
    assert(!Iceberg.currentMetadata(t1).refs.contains("never"))
    // unknown ops name themselves loudly
    val bad = Maintenance.run(spark,
      Seq(MaintenanceSpec(t2, "vacuum")))
    assert(!bad.head.ok &&
      bad.head.error.get.getMessage.contains("unknown op 'vacuum'"))
  }
}
