package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Locks the reader's timestamp normalization: whatever flavor the
  * parquet writer used — tz-adjusted TIMESTAMP, naive TIMESTAMP_NTZ
  * (pandas/pyarrow default), or TIMESTAMP(NANOS) — `Readers.readParquet`
  * hands every downstream operator plain session TimestampType with the
  * same instant values. Round 7 lost two queries and seven specs to a
  * testdata writer flipping isAdjustedToUTC; this spec is the regression
  * gate for that entire failure class.
  */
class ReadersSpec extends SparkSpec {

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_readers").toString

  test("TIMESTAMP_NTZ columns normalize to TimestampType with instant " +
       "values preserved (UTC session)") {
    import spark.implicits._
    val dir = tmpDir() + "/ntz"
    Seq(("2024-03-01 10:15:30.123456", 1L), ("2024-03-02 23:59:59.999999", 2L))
      .toDF("s", "id")
      .select(to_timestamp_ntz(col("s")).as("ts"), col("id"))
      .write.parquet(dir)
    // control: the raw read really is NTZ (the spec tests normalization,
    // not a Spark default that happens to agree)
    assert(spark.read.parquet(dir).schema("ts").dataType == TimestampNTZType)
    val df = Readers.readParquet(spark, dir)
    assert(df.schema("ts").dataType == TimestampType)
    val got = df.orderBy("id")
      .select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .as[String].collect().toSeq
    assert(got == Seq("2024-03-01 10:15:30.123456",
      "2024-03-02 23:59:59.999999"))
  }

  test("NTZ normalization reaches nested struct/array/map fields") {
    import spark.implicits._
    val dir = tmpDir() + "/nested"
    Seq(("2024-05-05 01:02:03", 1L)).toDF("s", "id")
      .select(
        struct(to_timestamp_ntz(col("s")).as("t"), col("id").as("k"))
          .as("rec"),
        array(to_timestamp_ntz(col("s"))).as("arr"),
        col("id"))
      .write.parquet(dir)
    val df = Readers.readParquet(spark, dir)
    val rec = df.schema("rec").dataType.asInstanceOf[StructType]
    assert(rec("t").dataType == TimestampType)
    assert(df.schema("arr").dataType ==
      ArrayType(TimestampType, containsNull = true))
    val v = df.select(col("rec.t").cast("string")).as[String].head()
    assert(v == "2024-05-05 01:02:03")
  }

  test("tz-adjusted TIMESTAMP passes through untouched") {
    import spark.implicits._
    val dir = tmpDir() + "/tz"
    Seq(("2024-07-04 12:00:00", 7L)).toDF("s", "id")
      .select(to_timestamp(col("s")).as("ts"), col("id"))
      .write.parquet(dir)
    val df = Readers.readParquet(spark, dir)
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.select(col("ts").cast("string")).as[String].head() ==
      "2024-07-04 12:00:00")
  }

  test("testdata events.ts arrives as TimestampType through every " +
       "Readers entry point") {
    for (d <- Seq(Readers.table(spark, sf(), "events"),
                  Readers.events(spark, sf())))
      assert(d.schema("ts").dataType == TimestampType,
        s"got ${d.schema("ts").dataType}")
  }
}
