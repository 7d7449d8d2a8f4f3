package graft.engine

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Ingest hardening the reference lacks entirely (its failure mode is
  * log.Fatalf on the whole process): malformed source rows either
  * quarantine into a corrupt-record column (PERMISSIVE) or fail the one
  * table's job (FAILFAST) — never silently vanish, never kill sibling
  * tables. Options flow through JobSpec.options untouched, so this is
  * configuration, not code.
  */
class CorruptRecordSpec extends SparkSpec {

  private def writeJson(rows: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft_corrupt").toString
    Files.write(Paths.get(dir, "data.json"),
      rows.mkString("\n").getBytes("UTF-8"))
    dir
  }

  test("PERMISSIVE json ingest quarantines malformed rows") {
    val dir = writeJson(Seq(
      """{"id": 1, "name": "ok"}""",
      """{"id": 2, "name": "also ok"}""",
      """{"id": 3, "name": BROKEN""",
      """{"id": 4, "name": "fine"}"""))
    val df = Readers.read(spark, JobSpec(
      source = s"$dir/data.json",
      target = "quarantine_demo",
      format = Some(SourceFormat.Json),
      options = Map(
        "mode" -> "PERMISSIVE",
        "columnNameOfCorruptRecord" -> "_corrupt_record")))
      // corrupt-record capture requires the column in the schema AND a
      // cache barrier in Spark 4 (the analyzer forbids selecting only
      // the corrupt column from a lazy scan)
      .cache()
    assert(df.filter(col("_corrupt_record").isNull).count() == 3)
    val bad = df.filter(col("_corrupt_record").isNotNull)
    assert(bad.count() == 1)
    assert(bad.head().getAs[String]("_corrupt_record").contains("BROKEN"))
  }

  test("FAILFAST json ingest fails the job on the first malformed row") {
    val dir = writeJson(Seq(
      """{"id": 1}""",
      """{"id": NOPE}"""))
    // json schema inference is eager, so FAILFAST raises inside read()
    intercept[org.apache.spark.SparkException] {
      Readers.read(spark, JobSpec(
        source = s"$dir/data.json",
        target = "failfast_demo",
        format = Some(SourceFormat.Json),
        options = Map("mode" -> "FAILFAST"))).collect()
    }
  }
}
