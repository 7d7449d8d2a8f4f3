package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Iceberg

/** Streaming Iceberg ingestion law: snapshot-per-batch appends with
  * id-keyed replay idempotence; the current scan equals the distinct
  * union of everything sent, and each batch boundary stays
  * time-travelable.
  */
class IcebergStreamSpec extends SparkSpec {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

  test("WAP streaming sink (appendStaged): batches stage on the branch " +
       "— main frozen — until publishEvery staged commits pass the " +
       "audit; a failing audit quarantines (ingestion continues, main " +
       "never moves), a passing one publishes atomically, replays " +
       "stage nothing, and main only ever equals an audited prefix") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    def shard(lo: Long, hi: Long) = docs
      .filter(col("doc_id") >= lo && col("doc_id") < hi)
      .as[(Long, String, Long)].collect().toSeq
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    def want(hi: Long) = rows(docs.filter(col("doc_id") < hi))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_icewap_spec").toString + "/tbl"
    @volatile var auditPasses = false
    val mem = MemoryStream[(Long, String, Long)]
    val q = IcebergStream.appendStaged(
      mem.toDF().toDF("doc_id", "lang", "n_chars"), dir,
      partCol = "lang", idCol = "doc_id", publishEvery = 2,
      audit = d => { assert(d.count() > 0); auditPasses })
    def send(b: Seq[(Long, String, Long)]): Unit = {
      mem.addData(b: _*); q.processAllAvailable()
    }
    send(shard(0, 100))   // build: the base IS main; branch forks
    assert(rows(Iceberg.scan(spark, dir)) === want(100))
    send(shard(100, 200)) // staged depth 1: below publishEvery
    assert(rows(Iceberg.scan(spark, dir)) === want(100))
    send(shard(200, 300)) // depth 2 -> audit runs -> FAILS -> frozen
    assert(rows(Iceberg.scan(spark, dir)) === want(100),
      "a failing audit must keep main frozen")
    val staged = Iceberg.currentMetadata(dir)
    assert(rows(Iceberg.scan(spark, dir,
      asOf = Some(staged.refs("staging")))) === want(300))
    auditPasses = true
    send(shard(100, 200)) // replay: stages NOTHING, re-audit publishes
    assert(rows(Iceberg.scan(spark, dir)) === want(300))
    // the replay itself committed no snapshot
    assert(Iceberg.currentMetadata(dir).snapshots.size ===
      staged.snapshots.size)
    send(shard(300, 400)) // next round stages again
    assert(rows(Iceberg.scan(spark, dir)) === want(300))
    send(shard(400, 450)) // depth 2 -> publish
    assert(rows(Iceberg.scan(spark, dir)) === want(450))
    q.stop()
  }

  test("appendStaged crash recovery: a table left WITHOUT the branch " +
       "(died between writeTable and createBranch) forks it on the " +
       "next batch instead of failing forever on the missing ref") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_icewap_crash").toString + "/tbl"
    // the crash shape: base table exists, branch was never created
    Iceberg.writeTable(docs.filter(col("doc_id") < 100), dir, "lang")
    val mem = MemoryStream[(Long, String, Long)]
    val q = IcebergStream.appendStaged(
      mem.toDF().toDF("doc_id", "lang", "n_chars"), dir,
      partCol = "lang", idCol = "doc_id", publishEvery = 1)
    mem.addData(docs.filter(col("doc_id") >= 100 && col("doc_id") < 200)
      .as[(Long, String, Long)].collect().toSeq: _*)
    q.processAllAvailable(); q.stop()
    assert(Iceberg.currentMetadata(dir).refTypes("staging") === "branch")
    assert(Iceberg.scan(spark, dir).count() ===
      docs.filter(col("doc_id") < 200).count())
  }

  test("snapshot-per-batch ingestion: union scan, per-batch time travel, " +
       "replayed batch appends nothing") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    def shard(lo: Long, hi: Long) = docs
      .filter(col("doc_id") >= lo && col("doc_id") < hi)
      .as[(Long, String, Long)].collect().toSeq
    val dir = java.nio.file.Files
      .createTempDirectory("graft_icestream_spec").toString + "/tbl"
    val mem = MemoryStream[(Long, String, Long)]
    val q = IcebergStream.appendIncremental(
      mem.toDF().toDF("doc_id", "lang", "n_chars"), dir,
      partCol = "lang", idCol = "doc_id")
    for (b <- Seq(shard(0, 100), shard(100, 300),
                  shard(0, 100) /* replay */, shard(300, 450))) {
      mem.addData(b: _*); q.processAllAvailable()
    }
    q.stop()
    val meta = Iceberg.currentMetadata(dir)
    // replay appended NO snapshot: 1 build + 2 effective appends
    assert(meta.snapshots.map(_._1).sorted === Seq(1L, 2L, 3L))
    val got = Iceberg.scan(spark, dir).collect().map(_.toSeq).toSet
    val want = docs.filter(col("doc_id") < 450)
      .collect().map(_.toSeq).toSet
    assert(got === want)
    // every batch boundary stays addressable
    assert(Iceberg.scan(spark, dir, asOf = Some(1L)).count() ===
      docs.filter(col("doc_id") < 100).count())
    assert(Iceberg.scan(spark, dir, asOf = Some(2L)).count() ===
      docs.filter(col("doc_id") < 300).count())
    // CDC pairing: the incremental read of each snapshot step is
    // exactly that batch's effective rows, from metadata alone
    val inc12 = Iceberg.incrementalScan(spark, dir, 1L, 2L)
      .collect().map(_.toSeq).toSet
    assert(inc12 === docs
      .filter(col("doc_id") >= 100 && col("doc_id") < 300)
      .collect().map(_.toSeq).toSet)
    val inc23 = Iceberg.incrementalScan(spark, dir, 2L, 3L)
      .collect().map(_.toSeq).toSet
    assert(inc23 === docs
      .filter(col("doc_id") >= 300 && col("doc_id") < 450)
      .collect().map(_.toSeq).toSet)
    // full-range incremental == everything after the build snapshot
    assert(Iceberg.incrementalScan(spark, dir, 1L, 3L).count() ===
      docs.filter(col("doc_id") >= 100 && col("doc_id") < 450).count())
  }

  test("upsert twin (upsertIncremental): after any batches + replays " +
       "the scan equals LATEST-WINS over everything sent — updates " +
       "replace, inserts land, in-batch duplicate keys resolve by the " +
       "order column, replays cannot change state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long, Long)]
    val dir = java.nio.file.Files
      .createTempDirectory("graft_iceups_spec").toString + "/tbl"
    val q = IcebergStream.upsertIncremental(
      mem.toDF().toDF("id", "part", "v", "ts"), dir,
      partCol = "part", keyCols = Seq("id"), orderCol = "ts")
    val b1 = Seq((1L, "A", 10L, 1L), (2L, "A", 20L, 1L), (3L, "B", 30L, 1L))
    // b2 updates id=2 TWICE in one batch (ts arbitrates), inserts id=4
    val b2 = Seq((2L, "A", 21L, 2L), (2L, "A", 22L, 3L), (4L, "B", 40L, 2L))
    for (b <- Seq(b1, b2, b2 /* replay */)) {
      mem.addData(b: _*); q.processAllAvailable()
    }
    q.stop()
    val got = Iceberg.scan(spark, dir)
      .select(col("id"), col("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 10L), (2L, 22L), (3L, 30L), (4L, 40L)))
    // the replay committed a snapshot but could not change state; the
    // pre-replay boundary is still time-travelable to the same content
    val meta = Iceberg.currentMetadata(dir)
    val prev = meta.snapshots.map(_._1).sorted.dropRight(1).last
    assert(Iceberg.scan(spark, dir, asOf = Some(prev))
      .select(col("id"), col("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet === got)
    // and compaction folds the upsert history into plain data files
    Iceberg.compactTable(spark, dir)
    assert(Iceberg.scan(spark, dir)
      .select(col("id"), col("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet === got)
    assert(Iceberg.currentDeleteFiles(dir).isEmpty)
  }

  test("bounded merge depth (compactEvery): mid-stream auto-compaction " +
       "changes NO answer — the scan still equals latest-wins, history " +
       "shows replace snapshots, and the row-level commit debt stays " +
       "under the threshold") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long, Long)]
    val dir = java.nio.file.Files
      .createTempDirectory("graft_iceups_compact").toString + "/tbl"
    val q = IcebergStream.upsertIncremental(
      mem.toDF().toDF("id", "part", "v", "ts"), dir,
      partCol = "part", keyCols = Seq("id"), orderCol = "ts",
      compactEvery = 2)
    // 7 batches: build + 6 upserts -> with compactEvery=2 the sink
    // must compact (at least) every second row-level commit
    for (i <- 1 to 7) {
      mem.addData((1L, "A", 10L * i, i.toLong),
        (i.toLong + 10, "B", i.toLong, i.toLong))
      q.processAllAvailable()
    }
    q.stop()
    val got = Iceberg.scan(spark, dir)
      .select(col("id"), col("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = Set((1L, 70L)) ++
      (1 to 7).map(i => (i.toLong + 10, i.toLong)).toSet
    assert(got === want, "latest-wins unaffected by mid-stream compaction")
    val meta = Iceberg.currentMetadata(dir)
    val ops = meta.snapshots.map { case (id, _) =>
      meta.snapshotOps.getOrElse(id, "append")
    }
    assert(ops.contains("replace"),
      s"expected replace snapshots in the history, got $ops")
    val debt = ops.reverse.takeWhile(_ != "replace")
      .count(op => op == "overwrite" || op == "delete")
    assert(debt < 2, s"commit debt $debt must stay under the threshold")
    // the merged scan carries at most the debt's anti-join tiers
    val scan = Iceberg.scan(spark, dir)
    scan.count()
    val tiers = "LeftAnti".r
      .findAllIn(scan.queryExecution.executedPlan.toString).length
    assert(tiers <= 2 * debt + 1,
      s"anti-join tiers $tiers exceed the bounded debt $debt")
  }

  test("snapshot retention (retainLast): expiry during a stream " +
       "changes neither the scan nor pollOnce deltas ahead of a " +
       "cursor inside the retained window; a cursor expired past " +
       "fails loudly, never a silently wrong delta") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long)]
    val base = java.nio.file.Files
      .createTempDirectory("graft_iceretain_spec").toString
    val dir = s"$base/tbl"; val cursor = s"$base/cursor"
    val q = IcebergStream.appendIncremental(
      mem.toDF().toDF("id", "part", "v"), dir,
      partCol = "part", idCol = "id", retainLast = 3)
    def batch(lo: Long): Seq[(Long, String, Long)] =
      (lo until lo + 5).map(i => (i, if (i % 2 == 0) "A" else "B", i * 10))
    // two batches, then a poll pins the cursor at the current snapshot
    mem.addData(batch(0): _*); q.processAllAvailable()
    mem.addData(batch(10): _*); q.processAllAvailable()
    var seen = Set.empty[Long]
    IcebergStream.pollOnce(spark, dir, cursor) { df =>
      seen ++= df.select(col("id")).collect().map(_.getLong(0))
    }
    assert(seen === (batch(0) ++ batch(10)).map(_._1).toSet)
    // two MORE batches: retention (retainLast=3) expires the first
    // snapshot, but the cursor's snapshot stays inside the window
    mem.addData(batch(20): _*); q.processAllAvailable()
    mem.addData(batch(30): _*); q.processAllAvailable()
    q.stop()
    val meta = Iceberg.currentMetadata(dir)
    assert(meta.snapshots.size === 3,
      s"retention must trim history to 3, got ${meta.snapshots.size}")
    // the full scan is unaffected by expiry
    assert(Iceberg.scan(spark, dir).count() === 20L)
    // the poll ahead of the in-window cursor yields exactly the delta
    var delta = Set.empty[Long]
    IcebergStream.pollOnce(spark, dir, cursor) { df =>
      delta ++= df.select(col("id")).collect().map(_.getLong(0))
    }
    assert(delta === (batch(20) ++ batch(30)).map(_._1).toSet)
    // a cursor expired PAST the window fails loudly on the next poll
    java.nio.file.Files.write(java.nio.file.Paths.get(cursor),
      "1".getBytes("UTF-8"))
    intercept[IllegalArgumentException] {
      IcebergStream.pollOnce(spark, dir, cursor)(_ => ())
    }
  }

  test("read-side CDC twin (pollOnce): over ANY poll/commit " +
       "interleaving the union of processed rows equals the final full " +
       "scan; a crash before the cursor advance replays the delta; an " +
       "idle poll never invokes the processor") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    def shard(lo: Long, hi: Long) = docs
      .filter(col("doc_id") >= lo && col("doc_id") < hi)
    val base = java.nio.file.Files
      .createTempDirectory("graft_icepoll_spec").toString
    val dir = s"$base/tbl"; val cursor = s"$base/cursor"
    Iceberg.writeTable(shard(0, 100), dir, "lang")

    var seen = Set.empty[Seq[Any]]
    var calls = 0
    def consume(df: org.apache.spark.sql.DataFrame): Unit = {
      calls += 1; seen ++= df.collect().map(_.toSeq)
    }
    // bootstrap poll reads the full current snapshot
    assert(IcebergStream.pollOnce(spark, dir, cursor)(consume) === 1L)
    assert(calls === 1 &&
      seen === shard(0, 100).collect().map(_.toSeq).toSet)
    // idle poll: no new snapshot -> processor NOT invoked
    assert(IcebergStream.pollOnce(spark, dir, cursor)(consume) === 1L)
    assert(calls === 1)
    // two commits before the next poll fold into ONE delta read
    Iceberg.appendToTable(shard(100, 200), dir)
    Iceberg.appendToTable(shard(200, 300), dir)
    assert(IcebergStream.pollOnce(spark, dir, cursor)(consume) === 3L)
    assert(calls === 2)
    // crash INSIDE the processor: cursor does not advance, the same
    // delta replays on the next poll (at-least-once)
    Iceberg.appendToTable(shard(300, 350), dir)
    intercept[RuntimeException] {
      IcebergStream.pollOnce(spark, dir, cursor) { _ =>
        throw new RuntimeException("sink crashed")
      }
    }
    val replayed = scala.collection.mutable.Set.empty[Seq[Any]]
    IcebergStream.pollOnce(spark, dir, cursor) { df =>
      replayed ++= df.collect().map(_.toSeq); seen ++= replayed
    }
    assert(replayed.toSet ===
      shard(300, 350).collect().map(_.toSeq).toSet)
    // stream == batch: union of everything processed == full scan
    assert(seen === Iceberg.scan(spark, dir).collect().map(_.toSeq).toSet)
    // a NEW consumer instance resumes from the durable cursor, not
    // from scratch
    Iceberg.appendToTable(shard(350, 400), dir)
    var resumed = Set.empty[Seq[Any]]
    IcebergStream.pollOnce(spark, dir, cursor) { df =>
      resumed = df.collect().map(_.toSeq).toSet
    }
    assert(resumed === shard(350, 400).collect().map(_.toSeq).toSet)
  }
}
