package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional trailing args: verify only these queries (local iteration;
    // the driver always runs the full set)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Dump-side physical-type normalization: top-level TIMESTAMP (ltz)
    // columns go out as TIMESTAMP_NTZ. Under the UTC session tz the
    // wall-clock values are identical, but Spark writes NTZ as naive
    // int64 micros — byte-for-byte the physical form DuckDB's oracle
    // produces — where ltz goes out as INT96 nanos (the one
    // physical-type asymmetry left in the r11 q_avro_roundtrip
    // investigation). A narrow projection on top of the query's own
    // ORDER BY, so row order is untouched.
    def ntzDump(df: org.apache.spark.sql.DataFrame)
        : org.apache.spark.sql.DataFrame = {
      import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
      import org.apache.spark.sql.functions.col
      val cols = df.schema.fields.map { f =>
        val c = col("`" + f.name.replace("`", "``") + "`")
        if (f.dataType == TimestampType) c.cast(TimestampNTZType).as(f.name)
        else c
      }
      df.select(cols.toIndexedSeq: _*)
    }
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try ntzDump(fn(spark, sfDir)).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
