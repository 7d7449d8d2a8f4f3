package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Round-trip gate for timestamp physical-type drift on the STREAMING
  * read path (round-7 postmortem: 7 spec failures came from streaming /
  * typed-encoder paths that read testdata differently from the batch
  * queries). Reads the real driver testdata through every streaming
  * reader and asserts the event-time column is plain session
  * TimestampType with the same instants the batch reader produces —
  * if a future data regeneration flips the parquet timestamp flavor
  * again (NANOS / NTZ / tz-adjusted), this fails at the reader, loudly,
  * before any operator spec gets a confusing downstream error.
  */
class StreamReaderNtzSpec extends SparkSpec {

  test("EventStream.readEvents hands operators session TimestampType " +
       "regardless of the parquet writer's timestamp flavor") {
    val stream = EventStream.readEvents(spark, sf())
    assert(stream.schema("ts").dataType == TimestampType,
      s"streaming ts is ${stream.schema("ts").dataType}")
  }

  test("streamed events carry the same instants as the batch reader") {
    val streamed = EventStream.runToMemory(
      EventStream.readEvents(spark, sf())
        .select(col("event_id"), col("ts")),
      "ntz_roundtrip", OutputMode.Append)
    val batch = graft.engine.Readers.events(spark, sf())
      .select(col("event_id"), col("ts"))
    assert(batch.schema("ts").dataType == TimestampType)
    assert(streamed.count() == batch.count())
    // exceptAll both ways: any single drifted microsecond breaks this
    assert(streamed.exceptAll(batch).isEmpty &&
           batch.exceptAll(streamed).isEmpty)
  }

  test("typed Event encoder round-trips the streamed ts (the exact " +
       "LocalDateTime->java.sql.Timestamp cast that broke in round 7)") {
    import spark.implicits._
    val events = EventStream.readEvents(spark, sf())
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStream.Event]
    // mapGroupsWithState machinery is exercised by EventStreamSpec; here
    // just force the encoder through a streaming collect of typed rows
    val out = EventStream.runToMemory(
      events.map(e => (e.event_id, e.ts.getTime)).toDF("event_id", "ms"),
      "ntz_typed", OutputMode.Append)
    val batchMs = graft.engine.Readers.events(spark, sf())
      .select(col("event_id"), (unix_micros(col("ts")) / 1000).cast("long")
        .as("ms"))
    assert(out.exceptAll(batchMs).isEmpty)
  }

  test("DocStream.readDocuments schema matches the physical testdata " +
       "schema (drift fails here, not mid-pipeline)") {
    val physical = graft.engine.Readers.table(spark, sf(), "documents")
    for (f <- DocStream.documentsSchema.fields)
      assert(physical.schema(f.name).dataType == f.dataType,
        s"${f.name}: stream declares ${f.dataType}, " +
          s"physical is ${physical.schema(f.name).dataType}")
  }
}
