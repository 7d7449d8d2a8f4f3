package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured-Streaming surface of the engine: the same event-time
  * operators as the batch queries (`q_event_window`, `q_sessionize`),
  * re-expressed on `readStream` so a parquet directory, Kafka topic, or
  * any other streaming source can drive them incrementally.
  *
  * Design notes for scale:
  *   - watermarks bound state: the windowed aggregation keeps only windows
  *     newer than (max event time - watermark); late rows beyond it drop.
  *   - sessionization uses flatMapGroupsWithState — per-key state is one
  *     small Session struct, partitioned by user_id across executors.
  *   - output is append-mode so sinks see each result exactly once per
  *     watermark close.
  */
object EventStream {

  /** Open the events table as a stream (file-based micro-batches).
    * FileStreamSource monitors a DIRECTORY; the testdata table is a
    * single parquet file, so expose it through a symlink dir (read-only
    * testdata stays untouched; prod sources are directories already).
    *
    * Streaming sources don't infer schemas, so the physical schema is
    * probed with one driver-side batch read of the same files — which
    * also makes this robust to writer drift on `ts`
    * (TIMESTAMP(NANOS) → long under nanosAsLong; naive timestamp[us] →
    * TIMESTAMP_NTZ; tz-adjusted → TIMESTAMP). All three are normalized
    * to the session TimestampType (UTC-pinned, so values coincide).
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val streamDir = StreamDirs.fileStreamDir(dir, "events.parquet",
      "graft_stream").toString
    val physical = spark.read.parquet(streamDir).schema
    val raw = spark.readStream.schema(physical).parquet(streamDir)
    physical("ts").dataType match {
      case LongType => // TIMESTAMP(NANOS) read raw under nanosAsLong
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  /** Tumbling event-time window counts/sums with a watermark for late
    * data. Streaming twin of the batch `q_event_window`.
    */
  def windowedCounts(events: DataFrame,
                     windowLen: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double")
          .as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Sliding event-time windows (1h window every 30min by default). */
  def slidingCounts(events: DataFrame,
                    windowLen: String = "1 hour",
                    slide: String = "30 minutes",
                    watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"))

  /** Streaming exact dedup: drop rows whose `keyCols` were already seen,
    * with state bounded by the watermark (a duplicate arriving later than
    * `watermark` after the original is passed through — the standard
    * at-least-once -> effectively-once compaction for event streams).
    */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
                  watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Timestamp <-> microseconds-since-epoch, full µs precision (the
    * millis-only Timestamp constructor would truncate and disagree with
    * batch min/max aggregates). Shared by every stateful operator here.
    */
  private def micros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000) % 1000
  private def toTs(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(us / 1000000L * 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }

  final case class Event(event_id: Long, ts: java.sql.Timestamp,
                         user_id: Long, event_type: String, value: Double)
  final case class SessionState(start: Long, end: Long, n: Int)
  final case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
                              session_end: java.sql.Timestamp, n_events: Int)

  /** Stateful sessionization: emit a session when a user's gap exceeds
    * `gapMinutes` (streaming twin of the batch `q_sessionize`). State per
    * user is O(1); with the default processing-time timeout idle users'
    * open sessions flush eventually. Pass `GroupStateTimeout.NoTimeout`
    * for finite replays (timeout servicing keeps empty micro-batches
    * firing forever, which never lets a drained file stream quiesce).
    */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30,
                 timeout: GroupStateTimeout =
                   GroupStateTimeout.ProcessingTimeTimeout):
      Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    // setTimeoutDuration (below) is only legal under processing-time
    // timeouts; EventTimeTimeout would throw inside the first stateful
    // micro-batch, so reject it at construction instead
    require(timeout != GroupStateTimeout.EventTimeTimeout,
      "sessionize supports ProcessingTimeTimeout or NoTimeout")
    val useTimeout = timeout != GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, timeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(s => SessionOut(userId,
              toTs(s.start),
              toTs(s.end), s.n)).toList
            state.remove()
            out.iterator
          } else {
            val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
            var cur = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              val t = micros(e.ts)
              cur match {
                case Some(s) if t - s.end <= gapUs =>
                  // cross-batch late events may arrive with t inside (or
                  // before) the open session: bounds only widen — a
                  // session end must never move backwards. A deeply-late
                  // event (t < start) conservatively merges rather than
                  // opening a retroactive session (append mode cannot
                  // retract already-emitted sessions).
                  cur = Some(s.copy(start = math.min(s.start, t),
                    end = math.max(s.end, t), n = s.n + 1))
                case Some(s) =>
                  closed += SessionOut(userId,
                    toTs(s.start), toTs(s.end), s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach(state.update)
            if (useTimeout) state.setTimeoutDuration(s"$gapMinutes minutes")
            closed.result().iterator
          }
      }
  }

  /** Watermarked stream-stream join: each purchase matched to the same
    * user's clicks in the preceding `horizonMinutes`. Both sides carry
    * watermarks and the join condition bounds event time on both ends,
    * so Spark can expire buffered state — the required shape for an
    * unbounded stream-stream join (without the time bound, state grows
    * forever).
    */
  def purchaseClickJoin(events: DataFrame, horizonMinutes: Int = 60,
                        watermark: String = "2 hours"): DataFrame = {
    import org.apache.spark.sql.functions._
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", watermark)
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", watermark)
    purchases.join(clicks,
      col("user_id") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $horizonMinutes MINUTES"))
      .select(col("user_id"), col("purchase_id"), col("p_ts"),
        col("click_id"), col("c_ts"))
  }

  final case class FunnelCand(minView: Option[Long], clicks: List[Long],
                              purchases: List[Long],
                              maxSeenUs: Long = Long.MinValue)
  final case class FunnelOut(user_id: Long, stage_n: Int,
                             t1: Option[java.sql.Timestamp],
                             t2: Option[java.sql.Timestamp],
                             t3: Option[java.sql.Timestamp])

  /** Stateful incremental funnel — streaming twin of the batch
    * `q_funnel` (view -> click -> purchase, each stage within `windowUs`
    * of the previous). Emits the user's recomputed funnel row whenever
    * new events change it (Update semantics).
    *
    * Exactness under out-of-order arrival: the first-view time only ever
    * DECREASES, so the click qualification interval (t1, t1+W] only
    * moves left — a click above t1+W can never qualify later and is
    * pruned; likewise purchases above t1+2W. State per user is therefore
    * bounded to candidates inside a 2-window horizon after the earliest
    * view (plus all candidates while no view has arrived — bound that
    * with `horizonUs`).
    *
    * `horizonUs`: optional hard bound on pre-view state. While no view
    * has arrived for a user, clicks/purchases older than
    * (max event time seen for that user − horizonUs) are dropped, so a
    * view-less hot user's state cannot grow without limit. Exactness is
    * preserved whenever the source watermark guarantees a view is never
    * more than `horizonUs` later than the clicks it qualifies; pick
    * horizonUs ≥ watermark delay + windowUs. None (default) keeps the
    * original unbounded-until-first-view behavior.
    */
  def funnel(events: Dataset[Event],
             windowUs: Long = 86400L * 1000000L,
             horizonUs: Option[Long] = None): Dataset[FunnelOut] = {
    horizonUs.foreach(h => require(h > 0, s"horizonUs must be > 0, got $h"))
    import events.sparkSession.implicits._
    events
      .filter(e => e.event_type == "view" || e.event_type == "click" ||
        e.event_type == "purchase")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelCand, FunnelOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[FunnelCand]) =>
          val s0 = state.getOption.getOrElse(FunnelCand(None, Nil, Nil))
          var minView = s0.minView
          var clicks = s0.clicks
          var purchases = s0.purchases
          var maxSeen = s0.maxSeenUs
          rows.foreach { e =>
            val t = micros(e.ts)
            if (t > maxSeen) maxSeen = t
            e.event_type match {
              case "view" =>
                if (minView.forall(t < _)) minView = Some(t)
              case "click" => clicks ::= t
              case _ => purchases ::= t
            }
          }
          // prune candidates that can never qualify again (t1 is
          // monotonically non-increasing, so the windows only move left)
          minView.foreach { t1 =>
            clicks = clicks.filter(_ <= t1 + windowUs)
            purchases = purchases.filter(_ <= t1 + 2 * windowUs)
          }
          // pre-view horizon: while no view exists, cap state to the
          // trailing horizon behind this user's max observed event time
          if (minView.isEmpty) horizonUs.foreach { h =>
            val floor = maxSeen - h
            clicks = clicks.filter(_ >= floor)
            purchases = purchases.filter(_ >= floor)
          }
          val next = FunnelCand(minView, clicks.sorted, purchases.sorted,
            maxSeen)
          state.update(next)
          val t1 = minView
          val t2 = t1.flatMap(a =>
            next.clicks.find(c => c > a && c <= a + windowUs))
          val t3 = t2.flatMap(b =>
            next.purchases.find(p => p > b && p <= b + windowUs))
          t1 match {
            case Some(_) =>
              val stage = if (t3.isDefined) 3 else if (t2.isDefined) 2 else 1
              Iterator.single(FunnelOut(userId, stage, t1.map(toTs),
                t2.map(toTs), t3.map(toTs)))
            case None => Iterator.empty
          }
      }
  }

  final case class CusumState(s: Long, n: Long, maxStat: Long,
                              nAlarms: Long, firstAlarm: Long)
  final case class CusumOut(k: String, n: Long, max_stat: Long,
                            n_alarms: Long, first_alarm_pos: Option[Long])

  /** Stateful streaming CUSUM against a FIXED reference level — the
    * twin of `Curation.cusumFixed` (the self-referenced-mean form can't
    * stream: μ needs the whole series; a monitoring target doesn't).
    * Per key the entire state is FIVE longs — the recursion value s,
    * the position counter, and the alarm summary — because
    * s = max(0, s + (x − μ − slack)) is Markov; rows are processed in
    * (ts, event_id) order within each micro-batch, so with in-order
    * batch arrival the emitted summary equals the batch operator
    * exactly (the spec-locked law; same in-order contract as the dedup
    * and audit twins). Emits the running per-key summary every batch
    * it changes (Update mode).
    */
  def cusumAlarms(events: Dataset[Event], muMilli: Long, slackMilli: Long,
                  hMilli: Long): Dataset[CusumOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState[CusumState, CusumOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[Event], state: GroupState[CusumState]) =>
          var st = state.getOption.getOrElse(CusumState(0L, 0L, 0L, 0L, -1L))
          rows.toArray.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
            val d = math.floor(e.value * 1000).toLong - muMilli - slackMilli
            val s = math.max(0L, st.s + d)
            val n = st.n + 1
            val alarmed = s > hMilli
            st = CusumState(s, n,
              math.max(st.maxStat, s),
              st.nAlarms + (if (alarmed) 1L else 0L),
              if (st.firstAlarm >= 0 || !alarmed) st.firstAlarm else n)
          }
          state.update(st)
          Iterator.single(CusumOut(key, st.n, st.maxStat, st.nAlarms,
            if (st.firstAlarm >= 0) Some(st.firstAlarm) else None))
      }
  }

  final case class RetState(firstDayUs: Long, mask: Long)
  final case class RetOut(cohort: java.sql.Timestamp, d_off: Long)

  /** Stateful cohort-retention increments — streaming twin of the batch
    * `q_retention`: per user the state is the first-contact day plus a
    * bitmask of already-emitted day offsets (one long each), and every
    * newly observed (cohort, offset) cell emits exactly once; the sink
    * counts rows per cell to materialize the matrix incrementally.
    *
    * First contact pins to the earliest day seen so far; an event that
    * back-dates a user's first contact across micro-batches would
    * re-cohort them, which append-mode cannot retract — the standard
    * deployment bounds that with the source's watermark and corrects
    * drift with a periodic batch recompute (the same snapshot pattern as
    * `detectAnomalies`). Within a single batch processing is day-sorted,
    * so a whole-corpus replay agrees with the batch operator exactly.
    */
  def retentionIncrements(events: Dataset[Event],
                          maxOff: Int = 7): Dataset[RetOut] = {
    // the per-user emitted-cell mask is a single Long bitmap, so offsets
    // must fit in [0, 63] — Scala's << wraps mod 64 and would silently
    // double-mark/drop cells otherwise
    require(maxOff >= 0 && maxOff < 64,
      s"maxOff must be in [0, 63] (bitmask is one Long), got $maxOff")
    import events.sparkSession.implicits._
    val dayUs = 86400L * 1000000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[RetState, RetOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Event], state: GroupState[RetState]) =>
          val days = rows.map(e => micros(e.ts) / dayUs * dayUs)
            .toSeq.distinct.sorted
          var (first, mask) = state.getOption
            .map(s => (s.firstDayUs, s.mask))
            .getOrElse((Long.MaxValue, 0L))
          val out = Seq.newBuilder[RetOut]
          days.foreach { d =>
            if (first == Long.MaxValue) first = d
            val off = (d - first) / dayUs
            if (d >= first && off <= maxOff &&
                (mask & (1L << off)) == 0) {
              mask |= 1L << off
              out += RetOut(toTs(first), off)
            }
          }
          state.update(RetState(first, mask))
          out.result().iterator
      }
  }

  /** Streaming anomaly detection: each micro-batch is scored against a
    * STATIC per-group stats snapshot (mean/sd from the exact batch
    * aggregation, graft.operators.Anomaly.groupStats) via a broadcast
    * join, keeping |z| > threshold rows. Stateless and shuffle-free —
    * the model-snapshot scoring shape: a scheduled batch job refreshes
    * the snapshot; the stream never re-aggregates history.
    */
  def detectAnomalies(events: DataFrame, stats: DataFrame,
                      threshold: Double = 3.0): DataFrame =
    graft.operators.Anomaly.zOutliers(events, stats, "event_type", "value",
      threshold)

  /** Stream-static enrichment join: every micro-batch joins against a
    * static dimension snapshot. Broadcast keeps it stateless and
    * shuffle-free — the standard shape for attaching user/item metadata
    * to an event stream; the dimension is re-broadcast per batch only if
    * it is re-read (a static DataFrame here, so once).
    */
  def enrichWithDim(events: DataFrame, dim: DataFrame,
                    key: String): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(dim), Seq(key))

  /** Run a streaming DataFrame to an in-memory table until the source is
    * drained (file sources are finite here) and return the result —
    * the synchronous smoke-path for tests and local validation.
    *
    * `processAllAvailable + stop` rather than `awaitTermination`: queries
    * with registered state timeouts stay alive waiting for the timeout
    * even under Trigger.AvailableNow.
    *
    * Append mode emits only watermark-closed results (prod semantics);
    * Complete re-emits everything — use it to compare against batch.
    */
  def runToMemory(df: DataFrame, name: String,
                  mode: OutputMode = OutputMode.Append): DataFrame = {
    val q: StreamingQuery = df.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q.stop()
    df.sparkSession.table(name)
  }
}
