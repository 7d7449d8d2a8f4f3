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

  test("parses the reference's own config.yaml unchanged (drop-in " +
       "migration; shape of /root/reference/config.yaml:1-25)") {
    val cfg = EngineConfig.fromReferenceYaml(
      """postgres:
        |  host: "localhost"
        |  port: 5432
        |  user: "postgres"
        |  dbname: "tfmv"
        |  sslmode: "disable"
        |  secret_name: "projects/858338514445/secrets/postgres-pwd/versions/latest"
        |
        |gcs:
        |  bucket_name: "tfmv-gcs-to-pg"
        |  project_id: "tfmv-371720"
        |  dataset: "tfmv"
        |  files:
        |    - name: "regions.parquet"
        |      table: "regions"
        |    - name: "supplier.avro"
        |      table: "supplier"
        |  concurrent_jobs: 1
        |
        |bq:
        |  project_id: "tfmv-371720"
        |  dataset: "tpch"
        |  tables:
        |    - name: "nation"
        |      table: "nation"
        |""".stripMargin)
    assert(cfg.jobs.map(_.target) == Seq("regions", "supplier", "nation"))
    assert(cfg.jobs.head.source == "gs://tfmv-gcs-to-pg/regions.parquet")
    // format from extension — the reference's db.go:27 rule
    assert(cfg.jobs.head.resolvedFormat == SourceFormat.Parquet)
    assert(cfg.jobs(1).resolvedFormat == SourceFormat.Avro)
    assert(cfg.jobs(2).source == "tfmv-371720.tpch.nation")
    assert(cfg.jobs(2).resolvedFormat == SourceFormat.Bigquery)
    // sink: same Postgres, password deferred to the secret provider
    assert(cfg.sink.format == "jdbc")
    val url = cfg.sink.url.get
    assert(url.startsWith("jdbc:postgresql://localhost:5432/tfmv?"))
    assert(url.contains("user=postgres") && url.contains("sslmode=disable"))
    assert(url.contains(
      "password=secret://projects/858338514445/secrets/postgres-pwd/versions/latest"))
    // the placeholder resolves through the pluggable provider (R14)
    val resolved = Secrets.resolve(url,
      name => if (name.endsWith("postgres-pwd/versions/latest"))
        Some("s3cret") else None)
    assert(resolved.contains("password=s3cret"))
  }

  test("fromAnyYaml dispatches on top-level keys, not line sniffing") {
    val ref = EngineConfig.fromAnyYaml(
      """bq:
        |  project_id: p
        |  dataset: d
        |  tables:
        |    - name: "t"
        |      table: "t2"
        |""".stripMargin)
    assert(ref.jobs.head.resolvedFormat == SourceFormat.Bigquery)
    val native = EngineConfig.fromAnyYaml(
      """jobs:
        |  - source: /x/a.parquet
        |    target: a
        |""".stripMargin)
    assert(native.jobs.head.resolvedFormat == SourceFormat.Parquet)
  }

  test("malformed reference configs fail with the offending section and " +
       "key named") {
    def msg(yaml: String): String =
      intercept[IllegalArgumentException](
        EngineConfig.fromReferenceYaml(yaml)).getMessage
    assert(msg("gcs:\n  files:\n    - name: x\n")
      .contains("'gcs.files[]' is missing required key 'table'"))
    assert(msg("gcs:\n  files: 7\n").contains("'gcs.files' must be a list"))
    // a complete entry parses cleanly
    val ok = EngineConfig.fromReferenceYaml(
      "gcs:\n  bucket_name: b\n  files:\n    - name: x\n      table: t\n")
    assert(ok.jobs.map(_.target) == Seq("t"))
    assert(msg("postgres:\n  host: h\n")
      .contains("section 'postgres' is missing required key 'port'"))
  }

  test("maintenance: section parses ordered op entries with their " +
       "op-specific args, and missing table/op fail with the key named") {
    val cfg = EngineConfig.fromYaml(
      """jobs: []
        |maintenance:
        |  - table: /tmp/t1
        |    op: create_branch
        |    name: staging
        |  - table: /tmp/t1
        |    op: fast_forward
        |    name: staging
        |  - table: /tmp/t1
        |    op: compact
        |    sort_by: k
        |  - table: /tmp/t1
        |    op: expire
        |    retain_last: 3
        |  - table: /tmp/t2
        |    op: evolve_spec
        |    spec: "ts:day,k:bucket[8]"
        |""".stripMargin)
    assert(cfg.maintenance.map(_.op) ===
      Seq("create_branch", "fast_forward", "compact", "expire",
        "evolve_spec"))
    assert(cfg.maintenance.head.args === Map("name" -> "staging"))
    assert(cfg.maintenance(2).args === Map("sort_by" -> "k"))
    assert(cfg.maintenance(3).args === Map("retain_last" -> "3"))
    assert(cfg.maintenance(4).table === "/tmp/t2")
    assert(cfg.maintenance(4).args === Map("spec" -> "ts:day,k:bucket[8]"))
    val err = intercept[IllegalArgumentException](EngineConfig.fromYaml(
      "jobs: []\nmaintenance:\n  - table: /tmp/t\n"))
    assert(err.getMessage.contains("missing required key 'op'"))
  }
}
