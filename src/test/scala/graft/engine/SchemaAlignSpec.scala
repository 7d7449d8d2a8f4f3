package graft.engine

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Mirrors the reference's alignment semantics (SURVEY §2 R6-R8):
  * case-insensitive resolution, missing -> NULL, extra -> dropped,
  * per-column cast including int64 -> int32 narrowing.
  */
class SchemaAlignSpec extends SparkSpec {

  private def df = {
    val schema = StructType(Seq(
      StructField("ID", LongType),
      StructField("Name", StringType),
      StructField("extra_col", StringType),
      StructField("Price", DoubleType)))
    spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, "a", "x", 1.5),
        Row(2L, null, "y", 2.5)),
      schema)
  }

  test("case-insensitive resolution + reorder") {
    val target = StructType(Seq(
      StructField("name", StringType),
      StructField("id", LongType)))
    val out = SchemaAlign.align(df, target)
    assert(out.columns.toSeq == Seq("name", "id"))
    assert(out.collect().map(_.getLong(1)).sorted.toSeq == Seq(1L, 2L))
  }

  test("missing target column becomes typed NULL") {
    val target = StructType(Seq(
      StructField("id", LongType),
      StructField("nonexistent", StringType)))
    val out = SchemaAlign.align(df, target)
    assert(out.schema("nonexistent").dataType == StringType)
    assert(out.collect().forall(_.isNullAt(1)))
  }

  test("extra source columns silently dropped") {
    val target = StructType(Seq(StructField("id", LongType)))
    assert(SchemaAlign.align(df, target).columns.toSeq == Seq("id"))
  }

  test("int64 -> int32 narrowing cast (reference utils.go:146-149)") {
    val target = StructType(Seq(StructField("id", IntegerType)))
    val out = SchemaAlign.align(df, target)
    assert(out.schema("id").dataType == IntegerType)
    assert(out.collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2))
  }

  test("double -> string fallback (reference utils.go:162-163)") {
    val target = StructType(Seq(StructField("price", StringType)))
    val out = SchemaAlign.align(df, target)
    assert(out.collect().map(_.getString(0)).sorted.toSeq == Seq("1.5", "2.5"))
  }

  test("alignChecked requireAll raises on missing column") {
    val target = StructType(Seq(StructField("nope", StringType)))
    intercept[IllegalArgumentException] {
      SchemaAlign.alignChecked(df, target, requireAll = true)
    }
  }
}
