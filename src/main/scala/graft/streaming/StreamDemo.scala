package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** CLI demo of the streaming surface: replays the events table as a file
  * stream, runs windowed counts + stateful sessionization, prints result
  * summaries. Usage: graft.streaming.StreamDemo [sfDir]
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-stream-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")

    val win = EventStream.runToMemory(
      EventStream.windowedCounts(EventStream.readEvents(spark, dir)),
      "demo_windows", OutputMode.Complete)
    println(s"[stream] hourly windows: ${win.count()} rows")
    win.orderBy("window_start", "event_type").show(5, truncate = false)

    val deduped = EventStream.runToMemory(
      EventStream.dedupStream(
        EventStream.readEvents(spark, dir)
          .unionAll(EventStream.readEvents(spark, dir)),  // replay twice
        Seq("event_id")),
      "demo_dedup")
    println(s"[stream] deduped events (2x replay): ${deduped.count()} rows")

    val sessions = EventStream.runToMemory(
      EventStream.sessionize(
        EventStream.readEvents(spark, dir)
          .selectExpr("event_id", "ts", "user_id", "event_type", "value")
          .as[EventStream.Event],
        timeout = GroupStateTimeout.NoTimeout).toDF(),
      "demo_sessions", OutputMode.Append)
    println(s"[stream] closed sessions: ${sessions.count()} rows")
    sessions.orderBy("user_id", "session_start").show(5, truncate = false)
    spark.stop()
  }
}
