package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec

/** Streaming results must agree with the batch (oracle-checked) twins:
  * the same windowed counts and the same sessions.
  */
class EventStreamSpec extends SparkSpec {

  test("streaming windowed counts (complete mode) == batch q_event_window") {
    val stream = EventStream.windowedCounts(
      EventStream.readEvents(spark, sf()))
    val got = EventStream.runToMemory(stream, "win_out", OutputMode.Complete)
      .orderBy("window_start", "event_type")
    val want = graft.SparkEntry.queries("q_event_window")(spark, sf())
    val g = got.select(col("window_start"), col("event_type"), col("n"),
      col("total_value")).collect()
    val w = want.select(col("hour_start"), col("event_type"), col("n"),
      col("total_value")).collect()
    assert(g.length == w.length)
    assert(g.sameElements(w))
  }

  test("append mode emits exactly the watermark-closed windows") {
    val closed = EventStream.runToMemory(
      EventStream.windowedCounts(
        EventStream.readEvents(spark, sf()), watermark = "2 hours"),
      "win_append", OutputMode.Append)
    val all = EventStream.runToMemory(
      EventStream.windowedCounts(
        EventStream.readEvents(spark, sf())),
      "win_complete", OutputMode.Complete)
    // closed set = all minus windows still within the watermark horizon
    assert(closed.count() < all.count())
    val horizonRows = all.count() - closed.count()
    assert(horizonRows <= 6) // at most ~3h of hourly windows x few types
  }

  test("sliding windows emit ~2x tumbling rows") {
    val tum = EventStream.runToMemory(
      EventStream.windowedCounts(EventStream.readEvents(spark, sf())),
      "tum_out", OutputMode.Complete).count()
    val sli = EventStream.runToMemory(
      EventStream.slidingCounts(EventStream.readEvents(spark, sf())),
      "sli_out", OutputMode.Complete).count()
    assert(sli > tum && sli <= tum * 2 + 100)
  }

  test("streaming dedup drops duplicate event_ids within the watermark") {
    val base = EventStream.readEvents(spark, sf())
    // replay the stream twice by unioning it with itself: every event is
    // then a duplicate; dedup must emit each id once
    val doubled = base.unionAll(base)
    val out = EventStream.runToMemory(
      EventStream.dedupStream(doubled, Seq("event_id")), "dedup_out")
    val batchCount = graft.engine.Readers.events(spark, sf()).count()
    assert(out.count() == batchCount)
    assert(out.select("event_id").distinct().count() == batchCount)
  }

  test("stateful sessionization: closed sessions match batch sessions") {
    import spark.implicits._
    val events = EventStream.readEvents(spark, sf())
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStream.Event]
    val streamed = EventStream.runToMemory(
      EventStream.sessionize(events, timeout =
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout).toDF(),
      "sess_out", OutputMode.Append)
    val batch = graft.SparkEntry.queries("q_sessionize")(spark, sf())
    // one micro-batch -> only sessions CLOSED by a later session emit;
    // the final open session per user stays in state. So: closed-session
    // count == batch sessions minus active users, and every emitted
    // (user, start, n) triple must exist identically in the batch result.
    val users = graft.engine.Readers.events(spark, sf())
      .select("user_id").distinct().count()
    assert(streamed.count() == batch.count() - users)
    val bs = batch.select(col("user_id"), col("session_start"),
      col("n_events").cast("int")).collect().map(_.toSeq).toSet
    val ss = streamed.select(col("user_id"), col("session_start"),
      col("n_events")).collect().map(_.toSeq).toSet
    assert(ss.subsetOf(bs))
  }

  test("stream-static enrichment join matches the batch join") {
    import spark.implicits._
    val batchEvents = graft.engine.Readers.events(spark, sf())
    val dim = batchEvents.select(col("user_id")).distinct()
      .withColumn("cohort", pmod(col("user_id"), lit(3)))
    val enriched = EventStream.runToMemory(
      EventStream.enrichWithDim(
        EventStream.readEvents(spark, sf()), dim, "user_id"),
      "enrich_out")
    assert(enriched.count() == batchEvents.count())
    // cohort attached correctly on every row
    assert(enriched.filter(col("cohort") =!= pmod(col("user_id"), lit(3)))
      .count() == 0)
  }

  test("foreachBatch streaming upsert: last event per user wins") {
    // the standard streaming-merge pattern: each micro-batch is reduced
    // to one row per key, then merged into the target state
    val state = new java.util.concurrent.ConcurrentHashMap[Long, Long]()
    val q = EventStream.readEvents(spark, sf())
      .select(col("user_id"), col("event_id"), col("ts"))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.groupBy(col("user_id"))
          .agg(max_by(col("event_id"), struct(col("ts"), col("event_id")))
            .as("last_event"))
          .collect()
          .foreach(r => state.put(r.getLong(0), r.getLong(1)))
      }
      .start()
    q.processAllAvailable(); q.stop()
    val want = graft.engine.Readers.events(spark, sf())
      .groupBy(col("user_id"))
      .agg(max_by(col("event_id"), struct(col("ts"), col("event_id")))
        .as("last_event"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    import scala.jdk.CollectionConverters._
    assert(state.asScala.toMap == want)
  }

  test("watermarked stream-stream join matches the batch time-range join") {
    val streamed = EventStream.runToMemory(
      EventStream.purchaseClickJoin(EventStream.readEvents(spark, sf())),
      "ssjoin_out")
    val ev = graft.engine.Readers.events(spark, sf())
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("c_ts"))
    val batch = p.join(c,
      col("user_id") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 60 MINUTES"))
    assert(streamed.count() == batch.count())
    assert(streamed.count() > 0)
  }

  test("late data beyond the watermark is dropped from its window") {
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft_late").toString
    val sch = StructType(Seq(
      StructField("ts", TimestampType), StructField("event_type", StringType),
      StructField("value", DoubleType)))
    def writeBatch(sub: String, rows: Seq[(String, String, Double)]): Unit = {
      import spark.implicits._
      rows.toDF("t", "event_type", "value")
        .select(to_timestamp(col("t")).as("ts"), col("event_type"),
          col("value"))
        .coalesce(1).write.parquet(s"$dir/$sub")
      // one file per micro-batch, ordered by mtime
      Files.list(Paths.get(s"$dir/$sub")).forEach { p =>
        if (p.toString.endsWith(".parquet"))
          Files.move(p, Paths.get(dir, s"$sub.parquet"))
      }
    }
    // two separate query RUNS over one checkpoint: the watermark is
    // recovered from state, so run 2 sees run 1's 11:30 watermark and
    // must drop the 10:45 straggler for the already-closed 10:00 window
    val ckpt = Files.createTempDirectory("graft_late_ckpt").toString
    val emitted = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.Row]
    def run(): Unit = {
      val q = EventStream.windowedCounts(
          spark.readStream.schema(sch).parquet(dir),
          watermark = "1 hour")
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = batch.collect()
          emitted.synchronized { emitted ++= rows }; ()
        }
        .start()
      q.processAllAvailable(); q.stop()
    }
    // run 1: three on-time events in the 10:00 window; the 12:30 event
    // advances the watermark to 11:30, closing (emitting) that window
    writeBatch("b1", Seq(
      ("2024-01-01 10:05:00", "click", 1.0),
      ("2024-01-01 10:20:00", "click", 1.0),
      ("2024-01-01 10:40:00", "click", 1.0),
      ("2024-01-01 12:30:00", "click", 1.0)))
    run()
    // run 2: a LATE event for the closed 10:00 window (10:45 < recovered
    // watermark 11:30) must be dropped, never re-emitted or re-counted
    writeBatch("b2", Seq(
      ("2024-01-01 10:45:00", "click", 1.0),
      ("2024-01-01 13:40:00", "click", 1.0)))
    run()
    val w10 = emitted.filter(_.getTimestamp(0).toString.contains("10:00"))
    assert(w10.length == 1)            // closed exactly once
    assert(w10.head.getLong(2) == 3L)  // the late fourth event is absent
  }

  test("funnel state survives a checkpoint restart: stage-2 completes " +
       "across two separate query runs") {
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft_funl").toString
    val ckpt = Files.createTempDirectory("graft_funl_ckpt").toString
    val sch = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType)))
    def writeBatch(sub: String,
                   rows: Seq[(Long, String, Long, String)]): Unit = {
      import spark.implicits._
      rows.toDF("event_id", "t", "user_id", "event_type")
        .select(col("event_id"), to_timestamp(col("t")).as("ts"),
          col("user_id"), col("event_type"), lit(1.0).as("value"))
        .coalesce(1).write.parquet(s"$dir/$sub")
      Files.list(Paths.get(s"$dir/$sub")).forEach { p =>
        if (p.toString.endsWith(".parquet"))
          Files.move(p, Paths.get(dir, s"$sub.parquet"))
      }
    }
    val emitted = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.Row]
    def run(): Unit = {
      import spark.implicits._
      val events = spark.readStream.schema(sch).parquet(dir)
        .as[EventStream.Event]
      val q = EventStream.funnel(events).toDF()
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = batch.collect()
          emitted.synchronized { emitted ++= rows }; ()
        }
        .start()
      q.processAllAvailable(); q.stop()
    }
    // run 1: user 1 views only -> stage 1
    writeBatch("b1", Seq((1L, "2024-01-01 10:00:00", 1L, "view")))
    run()
    // run 2 (fresh query over the same checkpoint): the click 2h later
    // completes stage 2 ONLY if the recovered state still holds t1
    writeBatch("b2", Seq((2L, "2024-01-01 12:00:00", 1L, "click")))
    run()
    val stages = emitted.map(_.getAs[Int]("stage_n")).toSeq
    assert(stages == Seq(1, 2), s"got stages $stages")
    val last = emitted.last
    assert(last.getAs[java.sql.Timestamp]("t1").toString
      .contains("10:00:00"), "recovered t1 lost across restart")
  }

  test("CUSUM state survives a checkpoint restart: the recursion value " +
       "carries so an excursion split across runs still alarms") {
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft_cusum").toString
    val ckpt = Files.createTempDirectory("graft_cusum_ckpt").toString
    val sch = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType)))
    def writeBatch(sub: String, rows: Seq[(Long, String, Double)]): Unit = {
      import spark.implicits._
      rows.toDF("event_id", "t", "value")
        .select(col("event_id"), to_timestamp(col("t")).as("ts"),
          lit(1L).as("user_id"), lit("m").as("event_type"), col("value"))
        .coalesce(1).write.parquet(s"$dir/$sub")
      Files.list(Paths.get(s"$dir/$sub")).forEach { p =>
        if (p.toString.endsWith(".parquet"))
          Files.move(p, Paths.get(dir, s"$sub.parquet"))
      }
    }
    val emitted = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.Row]
    def run(): Unit = {
      import spark.implicits._
      val events = spark.readStream.schema(sch).parquet(dir)
        .as[EventStream.Event]
      // mu=10, slack=0, h=5: each event at 13.0 adds +3000 milli
      val q = EventStream.cusumAlarms(events, 10000L, 0L, 5000L).toDF()
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = batch.collect()
          emitted.synchronized { emitted ++= rows }; ()
        }
        .start()
      q.processAllAvailable(); q.stop()
    }
    // run 1: s reaches 3000 — below h
    writeBatch("b1", Seq((1L, "2024-01-01 10:00:00", 13.0)))
    run()
    assert(emitted.last.getAs[Long]("n_alarms") === 0L)
    // run 2 (fresh query, same checkpoint): +3000 alarms ONLY if the
    // recovered s still holds the first run's 3000
    writeBatch("b2", Seq((2L, "2024-01-01 11:00:00", 13.0)))
    run()
    val last = emitted.last
    assert(last.getAs[Long]("n_alarms") === 1L,
      s"excursion split across restart lost: $last")
    assert(last.getAs[Long]("max_stat") === 6000L)
    assert(last.getAs[Long]("first_alarm_pos") === 2L)
  }

  test("streaming anomaly detection == batch q_zscore on the same data") {
    val stats = graft.operators.Anomaly.groupStats(
      graft.engine.Readers.events(spark, sf()), "event_type", "value")
    val streamed = EventStream.runToMemory(
      EventStream.detectAnomalies(EventStream.readEvents(spark, sf()), stats),
      "anomaly_out")
      .select(col("event_id"), col("event_type"), col("value"),
        (floor(col("z") * 1e6 + 0.5) / 1e6).as("z"))
      .orderBy(col("event_id"))
    val batch = graft.SparkEntry.queries("q_zscore")(spark, sf())
    assert(streamed.collect().sameElements(batch.collect()))
    assert(streamed.count() > 0)
  }

  test("stateful streaming CUSUM (fixed reference) == batch cusumFixed, " +
       "across multiple in-order micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val events = spark.read.parquet(sf() + "/events.parquet")
    // fixed reference 53.0, slack 3.0, h = 300 units — the fixture
    // splits into alarming keys and a quiet one (error: 0 alarms)
    val (mu, slack, h) = (53000L, 3000L, 300000L)
    val want = graft.operators.Curation.cusumFixed(events,
        col("event_type"), col("ts"), col("event_id"), col("value"),
        mu, slack, h)
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    assert(want.values.exists(_(2).asInstanceOf[Long] > 0L) &&
      want.values.exists(_(2).asInstanceOf[Long] == 0L),
      s"fixture must exercise both outcomes: $want")
    // stream the same events in three event-time-ordered batches
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
    val sorted = events
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[(Long, java.sql.Timestamp, Long, String, Double)]
      .collect().sortBy(t => (t._2.getTime, t._1))
    val ds = mem.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStream.Event]
    val q = EventStream.cusumAlarms(ds, mu, slack, h).toDF().writeStream
      .outputMode(OutputMode.Update).format("memory")
      .queryName("cusum_out").start()
    sorted.grouped(math.max(1, sorted.length / 3 + 1)).foreach { chunk =>
      mem.addData(chunk: _*)
      q.processAllAvailable()
    }
    q.stop()
    // last row per key is the final state
    val got = spark.table("cusum_out").collect()
      .zipWithIndex.groupBy(_._1.getString(0))
      .map { case (k, rs) => k -> rs.maxBy(_._2)._1.toSeq.tail }
    assert(got === want)
  }

  test("stateful incremental funnel: final per-user stages match batch " +
       "q_funnel stage aggregates") {
    import spark.implicits._
    val events = EventStream.readEvents(spark, sf())
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStream.Event]
    val streamed = EventStream.runToMemory(
      EventStream.funnel(events).toDF(), "funnel_out", OutputMode.Update)
    // one row per user per micro-batch that changed it; the LAST row per
    // user is the final funnel state. The file source drains in one
    // batch here, so streamed == final.
    val finalRows = streamed.collect()
    def us(t: java.sql.Timestamp): Long =
      t.getTime * 1000L + (t.getNanos / 1000) % 1000
    val batch = graft.SparkEntry.queries("q_funnel")(spark, sf()).collect()
      .map(r => r.getAs[String]("stage") ->
        (r.getAs[Long]("n_users"),
          us(r.getAs[java.sql.Timestamp]("first_ts")),
          us(r.getAs[java.sql.Timestamp]("last_ts")))).toMap
    def stageStats(n: Int, col: String) = {
      val ts = finalRows.filter(_.getAs[Int]("stage_n") >= n)
        .map(r => us(r.getAs[java.sql.Timestamp](col)))
      (ts.length.toLong, ts.min, ts.max)
    }
    assert(stageStats(1, "t1") == batch("view"))
    assert(stageStats(2, "t2") == batch("click"))
    assert(stageStats(3, "t3") == batch("purchase"))
  }

  test("funnel horizonUs bounds pre-view state without changing results " +
       "when the horizon covers the data") {
    import spark.implicits._
    val events = EventStream.readEvents(spark, sf())
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStream.Event]
    // a horizon wider than the whole event-time span cannot prune
    // anything that would later qualify — identical output
    val wide = 3650L * 86400L * 1000000L
    val bounded = EventStream.runToMemory(
      EventStream.funnel(events, horizonUs = Some(wide)).toDF(),
      "funnel_h_out", OutputMode.Update).collect()
    val plain = EventStream.runToMemory(
      EventStream.funnel(events).toDF(),
      "funnel_p_out", OutputMode.Update).collect()
    assert(bounded.map(_.toString).sorted.sameElements(
      plain.map(_.toString).sorted))
  }

  test("retentionIncrements rejects maxOff outside the Long bitmask") {
    import spark.implicits._
    val events = spark.emptyDataset[EventStream.Event]
    assertThrows[IllegalArgumentException] {
      EventStream.retentionIncrements(events, maxOff = 64)
    }
    assertThrows[IllegalArgumentException] {
      EventStream.retentionIncrements(events, maxOff = -1)
    }
  }

  test("stateful retention increments aggregate to the batch q_retention " +
       "matrix") {
    import spark.implicits._
    val events = EventStream.readEvents(spark, sf())
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStream.Event]
    val streamed = EventStream.runToMemory(
      EventStream.retentionIncrements(events).toDF(), "ret_out")
    val got = streamed
      .groupBy(to_date(col("cohort")).as("cohort"), col("d_off"))
      .agg(count(lit(1)).as("n_active"))
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2))
      .toMap
    // q_retention dumps cohort at TIMESTAMP (midnight) for driver-hash
    // dtype stability; compare at day grain here
    val want = graft.SparkEntry.queries("q_retention")(spark, sf())
      .withColumn("cohort", to_date(col("cohort")))
      .select("cohort", "d_off", "n_active")
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(want.nonEmpty)
    assert(got == want)
  }
}
