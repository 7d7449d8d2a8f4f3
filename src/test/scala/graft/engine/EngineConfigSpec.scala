package graft.engine

import org.scalatest.funsuite.AnyFunSuite

class EngineConfigSpec extends AnyFunSuite {

  test("yaml parse: jobs + sink") {
    val cfg = EngineConfig.fromYaml(
      """jobs:
        |  - source: /data/lineitem.parquet
        |    target: lineitem
        |  - source: /data/events.csv
        |    target: events
        |    format: csv
        |    target_schema: "a INT, b STRING"
        |    options: {header: "false"}
        |sink:
        |  format: parquet
        |  path: /tmp/out
        |  mode: overwrite
        |""".stripMargin)
    assert(cfg.jobs.size == 2)
    assert(cfg.jobs.head.resolvedFormat == SourceFormat.Parquet)
    assert(cfg.jobs(1).resolvedFormat == SourceFormat.Csv)
    assert(cfg.jobs(1).targetSchema.get.fieldNames.toSeq == Seq("a", "b"))
    assert(cfg.jobs(1).options == Map("header" -> "false"))
    assert(cfg.sink.path.contains("/tmp/out"))
    assert(cfg.sink.mode == "overwrite")
  }

  test("format derived from extension, case-insensitive") {
    assert(SourceFormat.fromExtension("/x/y/F.PARQUET") == SourceFormat.Parquet)
    assert(SourceFormat.fromExtension("a.json") == SourceFormat.Json)
    intercept[IllegalArgumentException](SourceFormat.fromExtension("a.xyz"))
  }

  test("table id from basename (reference db.go:23)") {
    assert(Readers.tableIdFor("gs://b/dir/regions.parquet") == "regions")
    assert(Readers.tableIdFor("noext") == "noext")
  }
}
