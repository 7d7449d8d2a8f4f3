package graft.sources

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class AvroSourceSpec extends SparkSpec {

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft_avro_$tag").toString

  private def sampleDf(): DataFrame = {
    import spark.implicits._
    spark.range(0, 100)
      .select(
        col("id"),
        col("id").cast("int").as("i32"),
        (col("id") * 1.5).as("d"),
        concat(lit("s"), col("id")).as("s"),
        when(col("id") % 3 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("n"), col("id"))).as("s_null"),
        (col("id") % 2 === 0).as("b"),
        col("id").cast("decimal(12,2)").multiply(lit("0.07")).cast("decimal(12,2)").as("dec"),
        to_timestamp(lit("2024-03-01 10:00:00")).plus(
          expr("make_interval(0,0,0,0,0,0, id)")).as("ts"),
        to_date(lit("2024-03-01")).as("day"),
        array(col("id"), col("id") % 7).as("arr"),
        map(lit("k1"), col("id"), lit("k2"), col("id") % 5).as("m"),
        struct(col("id").as("a"), concat(lit("x"), col("id")).as("bb")).as("st"))
  }

  test("round trip preserves every supported type exactly") {
    val dir = tmpDir("rt")
    val df = sampleDf()
    df.write.format("graft-avro").mode("overwrite").save(dir)
    val back = spark.read.format("graft-avro").load(dir)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      df.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    val a = df.orderBy("id").collect()
    val b = back.orderBy("id").collect()
    assert(b.length === a.length)
    a.zip(b).foreach { case (x, y) =>
      // Map column: compare as sorted entry lists (map iteration order
      // is not part of either engine's contract)
      val xs = x.toSeq.updated(10, x.getMap[String, Long](10).toSeq.sorted)
      val ys = y.toSeq.updated(10, y.getMap[String, Long](10).toSeq.sorted)
      assert(ys === xs)
    }
  }

  test("column pruning reaches the scan (ReadSchema subset) and values survive") {
    val dir = tmpDir("prune")
    sampleDf().write.format("graft-avro").mode("overwrite").save(dir)
    val back = spark.read.format("graft-avro").load(dir).select("s", "id")
    val plan = back.queryExecution.executedPlan.toString()
    assert(plan.contains("ReadSchema: struct<id:bigint,s:string>"),
      s"pruned read schema not in plan:\n$plan")
    val rows = back.orderBy("id").collect()
    assert(rows.take(3).map(_.getString(0)).toSeq === Seq("s0", "s1", "s2"))
    assert(rows.length === 100)
  }

  test("split ranges read every record exactly once (tiny splitSize, many blocks)") {
    val dir = tmpDir("split")
    // many small Avro blocks: repartition(1) then tiny sync interval via
    // writing with default blocks — force many blocks by writing many rows
    import spark.implicits._
    spark.range(0, 20000).select(col("id"), concat(lit("pad_"),
        col("id")).as("s"))
      .repartition(1)
      .write.format("graft-avro").mode("overwrite").save(dir)
    val back = spark.read.format("graft-avro")
      .option("splitSize", "4096").load(dir)
    assert(back.rdd.getNumPartitions > 4,
      s"expected many byte-range partitions, got ${back.rdd.getNumPartitions}")
    assert(back.count() === 20000)
    assert(back.agg(sum("id")).head.getLong(0) === (19999L * 20000 / 2))
    assert(back.select("id").distinct().count() === 20000)
  }

  test("overwrite truncates prior generations; append adds files") {
    val dir = tmpDir("modes")
    import spark.implicits._
    spark.range(0, 10).write.format("graft-avro").mode("overwrite").save(dir)
    spark.range(0, 10).write.format("graft-avro").mode("overwrite").save(dir)
    assert(spark.read.format("graft-avro").load(dir).count() === 10)
    spark.range(10, 15).write.format("graft-avro").mode("append").save(dir)
    assert(spark.read.format("graft-avro").load(dir).count() === 15)
  }

  test("reads a foreign Avro file (written by the avro library directly, " +
       "int/enum/timestamp-millis/int-promotion)") {
    val dir = tmpDir("foreign")
    val schema = SchemaBuilder.record("Ext").namespace("x").fields()
      .requiredInt("n")
      .name("e").`type`(Schema.createEnum("E", null, "x",
        Seq("RED", "GREEN").asJava)).noDefault()
      .name("tms").`type`(LogicalTypes.timestampMillis()
        .addToSchema(Schema.create(Schema.Type.LONG))).noDefault()
      .endRecord()
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, new java.io.File(s"$dir/ext.avro"))
    (0 until 5).foreach { i =>
      val r = new GenericData.Record(schema)
      r.put("n", i)
      r.put("e", new GenericData.EnumSymbol(schema.getField("e").schema(),
        if (i % 2 == 0) "RED" else "GREEN"))
      r.put("tms", 1700000000000L + i)
      w.append(r)
    }
    w.close()
    val back = spark.read.format("graft-avro").load(dir)
    assert(back.schema("n").dataType === IntegerType)
    assert(back.schema("e").dataType === StringType)
    assert(back.schema("tms").dataType === TimestampType)
    val rows = back.orderBy("n").collect()
    assert(rows.map(_.getInt(0)).toSeq === (0 until 5))
    assert(rows.map(_.getString(1)).toSeq ===
      Seq("RED", "GREEN", "RED", "GREEN", "RED"))
    // timestamp-millis -> micros conversion exact
    assert(rows.head.getTimestamp(2).getTime === 1700000000000L)
  }

  test("multi-branch non-null unions are rejected loudly") {
    val u = Schema.createUnion(Schema.create(Schema.Type.INT),
      Schema.create(Schema.Type.STRING))
    val schema = Schema.createRecord("U", null, "x", false,
      List(new Schema.Field("u", u, null, null.asInstanceOf[Object])).asJava)
    val e = intercept[IllegalArgumentException] {
      AvroConv.toStructType(schema)
    }
    assert(e.getMessage.contains("union"))
  }

  test("unsupported Spark write types fail at plan time, not mid-job") {
    val dir = tmpDir("badtype")
    import spark.implicits._
    val df = spark.range(3).select(map(col("id"), col("id")).as("badkey"))
    val e = intercept[Exception] {
      df.write.format("graft-avro").mode("overwrite").save(dir)
    }
    assert(e.getMessage.contains("graft-avro"))
  }
}
