package graft.streaming

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The streaming decontamination path must agree exactly with the batch
  * (oracle-checked) q_contamination — same operator, one code path.
  */
class DocStreamSpec extends SparkSpec {

  test("foreachBatch decontamination == batch contamination") {
    val evalSet = spark.read.parquet(sf() + "/documents.parquet")
      .filter(col("doc_id") < 20)
    val stream = DocStream.readDocuments(spark, sf())
      .filter(col("doc_id") >= 20)
    val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
    val q = DocStream.decontaminate(stream, evalSet) { flagged =>
      buf.synchronized { buf ++= flagged.collect() }
    }
    q.processAllAvailable()
    q.stop()
    val got = buf.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    val want = graft.operators.Dedup.contamination(
        spark.read.parquet(sf() + "/documents.parquet")
          .filter(col("doc_id") >= 20),
        evalSet)
      .select("doc_id", "eval_id", "n_shared")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    assert(want.nonEmpty, "batch contamination found nothing at this SF")
    assert(got == want)
  }

  test("blocklistScreen composes on a stream unchanged (narrow map — " +
       "no foreachBatch needed) and equals the batch result") {
    val pats = Seq("dup", "slow", "low", "scan batch")
    val screened = graft.operators.TextAnalysis.blocklistScreen(
      DocStream.readDocuments(spark, sf()), pats, maxHits = 2L)
    assert(screened.isStreaming, "the narrow map must stay a stream")
    val q = screened.writeStream.format("memory")
      .queryName("bl_stream").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("bl_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .sorted.toSeq
    val want = graft.operators.TextAnalysis.blocklistScreen(
        spark.read.parquet(sf() + "/documents.parquet"), pats, maxHits = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .sorted.toSeq
    assert(want.exists(_._3 == 0) && want.exists(_._3 == 1),
      "fixture must exercise both keep outcomes")
    assert(got == want)
  }

  test("foreachBatch span excision == batch exciseSeenSpans") {
    // l=3 so chance trigram matches over the 31-word vocabulary
    // guarantee real excisions at this tiny SF (no constructed dups
    // below doc_id 50)
    val seen = spark.read.parquet(sf() + "/documents.parquet")
      .filter(col("doc_id") < 25)
    val stream = DocStream.readDocuments(spark, sf())
      .filter(col("doc_id") >= 25)
    val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
    val q = DocStream.exciseIncremental(stream, seen, l = 3) { cleaned =>
      buf.synchronized { buf ++= cleaned.collect() }
    }
    q.processAllAvailable()
    q.stop()
    val got = buf.map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sorted.toSeq
    val want = graft.operators.Dedup.exciseSeenSpans(
        spark.read.parquet(sf() + "/documents.parquet")
          .filter(col("doc_id") >= 25),
        seen, l = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sorted.toSeq
    assert(want.exists(_._2 > 0), "no doc lost a span at this SF")
    assert(got == want)
  }

  test("foreachBatch incremental dedup == batch incrementalDedup") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val corpus = docs.filter(col("doc_id") < 450)
    val stream = DocStream.readDocuments(spark, sf())
      .filter(col("doc_id") >= 450)
    val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
    val q = DocStream.dedupIncremental(stream, corpus,
        minShared = 20) { admitted =>
      buf.synchronized { buf ++= admitted.select("doc_id").collect() }
    }
    q.processAllAvailable()
    q.stop()
    val got = buf.map(_.getLong(0)).sorted.toSeq
    val want = graft.operators.Dedup.incrementalDedup(
        docs.filter(col("doc_id") >= 450), corpus, minShared = 20)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(want.nonEmpty, "batch incremental dedup admitted nothing")
    assert(got == want)
  }

  test("foreachBatch DSIR scoring with frozen stats == batch scorer " +
       "over the union") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val stats = graft.operators.Curation.dsirStats(
      docs.filter(col("doc_id") < 300), col("lang") === "en")
    val stream = DocStream.readDocuments(spark, sf())
      .filter(col("doc_id") >= 300)
    val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
    val q = DocStream.dsirIncremental(stream, stats) { scored =>
      buf.synchronized { buf ++= scored.collect() }
    }
    q.processAllAvailable()
    q.stop()
    val got = buf.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getInt(3))).sorted.toSeq
    val want = graft.operators.Curation.dsirScoreWith(
        docs.filter(col("doc_id") >= 300), stats)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3))).sorted.toSeq
    assert(want.nonEmpty && want.exists(_._4 == 1) &&
      want.exists(_._4 == 0), "degenerate keep split at this SF")
    assert(got == want)
  }

  test("incremental packing == batch packShards when the corpus arrives " +
       "in one ordered batch") {
    val streamed = EventStream.runToMemory(
      DocStream.packIncremental(DocStream.readDocuments(spark, sf()),
        shards = 8, budget = 512L).toDF(),
      "pack_out")
      .select("doc_id", "shard", "n_tok", "cum", "bin")
      .collect().map(_.toSeq).toSet
    val batch = graft.operators.Curation.packShards(
        spark.read.parquet(sf() + "/documents.parquet"),
        col("doc_id"), size(split(col("text"), " ")),
        shards = 8, budget = 512L)
      .select("doc_id", "shard", "n_tok", "cum", "bin")
      .collect().map(_.toSeq).toSet
    assert(batch.nonEmpty)
    assert(streamed == batch)
  }

  test("daily-ingest composition: dedup -> decontaminate -> pack over two " +
       "days equals the batch recomputation") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.DataFrame
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val corpus0 = docs.filter(col("doc_id") < 450)
    val evalSet = docs.filter(col("doc_id") < 20)
    def day(lo: Long, hi: Long) = docs
      .filter(col("doc_id") >= lo && col("doc_id") < hi)
    def tuples(df: DataFrame): Seq[(Long, String, String, String, Long)] = df
      .select("doc_id", "text", "lang", "source", "n_chars")
      .as[(Long, String, String, String, Long)].collect().toSeq

    // ---- streaming: two micro-batches through ONE composed job ----
    val mem = MemoryStream[(Long, String, String, String, Long)]
    val stream = mem.toDF()
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val manifests = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
    val q = DocStream.ingestPipeline(stream, corpus0, evalSet,
        shards = 4, budget = 256L, minShared = 20) { packed =>
      manifests.synchronized {
        manifests ++= packed
          .select("doc_id", "shard", "n_tok", "cum", "bin")
          .collect().map(_.toSeq)
      }
    }
    mem.addData(tuples(day(450, 475)): _*)
    q.processAllAvailable()
    mem.addData(tuples(day(475, 500)): _*)
    q.processAllAvailable()
    q.stop()

    // ---- batch recomputation: the same three stages, day-sequential ----
    def admit(d: DataFrame, c: DataFrame) =
      graft.operators.Dedup.incrementalDedup(d, c, minShared = 20)
    val adm1 = admit(day(450, 475), corpus0)
    val adm2 = admit(day(475, 500), corpus0.unionByName(adm1))
    val admitted = adm1.unionByName(adm2)
    val flagged = graft.operators.Dedup
      .contamination(admitted, evalSet, minShared = 20)
      .select("doc_id").distinct()
    val clean = admitted.join(flagged, Seq("doc_id"), "left_anti")
    // days arrive in doc_id order, so one packShards over the union
    // reproduces the appended per-day manifests
    val batchManifest = graft.operators.Curation.packShards(clean,
        col("doc_id"), size(split(col("text"), " ")),
        shards = 4, budget = 256L)
      .select("doc_id", "shard", "n_tok", "cum", "bin")
      .collect().map(_.toSeq).toSet
    assert(batchManifest.nonEmpty)
    // composition did real work: some docs were rejected or flagged
    assert(batchManifest.size < 50)
    assert(manifests.toSet == batchManifest)
  }

  test("ingest resume: a restarted query with a durable stateDir sees " +
       "the prior run's admissions — a day-1 duplicate arriving after " +
       "restart is rejected exactly as it would be in-stream") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.DataFrame
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val corpus0 = docs.filter(col("doc_id") < 450)
    val evalSet = docs.filter(col("doc_id") < 20)
    def tuples(df: DataFrame): Seq[(Long, String, String, String, Long)] = df
      .select("doc_id", "text", "lang", "source", "n_chars")
      .as[(Long, String, String, String, Long)].collect().toSeq
    val state = java.nio.file.Files
      .createTempDirectory("graft_ingest_resume").toString
    def run(batch: DataFrame): (Set[Long], Seq[(Long, Long, Long)]) = {
      val mem = MemoryStream[(Long, String, String, String, Long)]
      val stream = mem.toDF()
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      val ids = scala.collection.mutable.Set.empty[Long]
      val cells =
        scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      val q = DocStream.ingestPipeline(stream, corpus0, evalSet,
          shards = 4, budget = 256L, minShared = 20,
          stateDir = Some(state)) { packed =>
        ids.synchronized {
          val rows = packed.select("doc_id", "shard", "n_tok", "cum")
            .collect()
          ids ++= rows.map(_.getLong(0))
          cells ++= rows.map(r =>
            (r.getLong(1), r.getLong(3) - r.getLong(2), r.getLong(3)))
        }
      }
      mem.addData(tuples(batch): _*)
      q.processAllAvailable()
      q.stop()
      (ids.toSet, cells.toSeq)
    }
    // run 1: day 1 admits (450-475)
    val day1 = docs.filter(col("doc_id") >= 450 && col("doc_id") < 475)
    val (ids1, cells1) = run(day1)
    assert(ids1.nonEmpty)
    // run 2 (RESTARTED query, same stateDir): replay day 1's rows with
    // new ids — every one is a duplicate of a stored admission and must
    // be rejected; genuinely-new docs still admit
    val day2 = day1.withColumn("doc_id", col("doc_id") + 10000)
      .unionByName(docs.filter(col("doc_id") >= 475 &&
        col("doc_id") < 490))
    val (ids2, cells2) = run(day2)
    assert(ids2.forall(_ < 10000), s"replayed duplicates admitted: " +
      s"${ids2.filter(_ >= 10000)}")
    assert(ids2.nonEmpty)
    // pack offsets also resumed: run 2 continues each shard's token
    // stream where run 1 ended — a restart that reset offsets to 0
    // would re-emit run-1's (shard, bin) token ranges
    val hi1 = cells1.groupBy(_._1).view.mapValues(_.map(_._3).max).toMap
    for ((shard, start, _) <- cells2 if hi1.contains(shard))
      assert(start >= hi1(shard),
        s"shard $shard restarted at token $start < run-1 high " +
          s"${hi1(shard)} — offsets were not resumed")
    // and a fresh stateDir does NOT reject them (the resume really came
    // from the store, not from the seed corpus)
    val stateB = java.nio.file.Files
      .createTempDirectory("graft_ingest_resume_b").toString
    val mem3 = MemoryStream[(Long, String, String, String, Long)]
    val stream3 = mem3.toDF()
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val ids3 = scala.collection.mutable.Set.empty[Long]
    val q3 = DocStream.ingestPipeline(stream3, corpus0, evalSet,
        shards = 4, budget = 256L, minShared = 20,
        stateDir = Some(stateB)) { packed =>
      ids3.synchronized {
        ids3 ++= packed.select("doc_id").collect().map(_.getLong(0))
      }
    }
    mem3.addData(tuples(day1.withColumn("doc_id",
      col("doc_id") + 10000)): _*)
    q3.processAllAvailable()
    q3.stop()
    assert(ids3.exists(_ >= 10000))
  }

  test("admissions compaction: folding generations into one is a no-op " +
       "on dedup decisions, resumed offsets, and the admissions set — " +
       "and resume works post-compact") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.DataFrame
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val corpus0 = docs.filter(col("doc_id") < 450)
    val evalSet = docs.filter(col("doc_id") < 20)
    def tuples(df: DataFrame): Seq[(Long, String, String, String, Long)] = df
      .select("doc_id", "text", "lang", "source", "n_chars")
      .as[(Long, String, String, String, Long)].collect().toSeq
    val state = java.nio.file.Files
      .createTempDirectory("graft_ingest_compact").toString
    def run(batches: Seq[DataFrame]): (Set[Long], Map[Long, Long]) = {
      val mem = MemoryStream[(Long, String, String, String, Long)]
      val stream = mem.toDF()
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      val ids = scala.collection.mutable.Set.empty[Long]
      val hi = scala.collection.mutable.Map.empty[Long, Long]
      val q = DocStream.ingestPipeline(stream, corpus0, evalSet,
          shards = 4, budget = 256L, minShared = 20,
          stateDir = Some(state)) { packed =>
        ids.synchronized {
          val rows = packed.select("doc_id", "shard", "cum").collect()
          ids ++= rows.map(_.getLong(0))
          rows.foreach { r =>
            val s = r.getLong(1)
            hi(s) = math.max(hi.getOrElse(s, 0L), r.getLong(2))
          }
        }
      }
      batches.foreach { b =>
        mem.addData(tuples(b): _*)
        q.processAllAvailable()
      }
      q.stop()
      (ids.toSet, hi.toMap)
    }
    def gens(): Seq[String] = {
      val s = java.nio.file.Files.list(java.nio.file.Paths.get(state))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala
          .filter(p => java.nio.file.Files.isDirectory(p) &&
            p.getFileName.toString.matches("b\\d+"))
          .map(_.getFileName.toString).toList.sorted
      } finally s.close()
    }
    def admissionsSet(): Set[Long] = {
      val paths = gens().map(g => s"$state/$g")
      spark.read.schema(DocStream.documentsSchema).parquet(paths: _*)
        .select("doc_id").as[Long].collect().toSet
    }
    // three day-batches build three generations
    val (ids1, hi1) = run(Seq(
      docs.filter(col("doc_id") >= 450 && col("doc_id") < 465),
      docs.filter(col("doc_id") >= 465 && col("doc_id") < 480),
      docs.filter(col("doc_id") >= 480 && col("doc_id") < 490)))
    assert(gens().size == 3, gens())
    val before = admissionsSet()
    assert(before.nonEmpty)
    // quiescent compaction: one generation, same admissions set
    val folded = DocStream.compactAdmissions(spark, state)
    assert(folded == before.size.toLong, s"$folded vs ${before.size}")
    assert(gens().size == 1, gens())
    assert(admissionsSet() == before)
    // idempotent: nothing left to fold
    assert(DocStream.compactAdmissions(spark, state) == 0L)
    assert(admissionsSet() == before)
    // resume post-compact: replayed duplicates (new ids) still rejected,
    // genuinely-new docs admitted, offsets continue past run-1 highs
    val replay = docs.filter(col("doc_id") >= 450 && col("doc_id") < 465)
      .withColumn("doc_id", col("doc_id") + 10000)
    val fresh = docs.filter(col("doc_id") >= 490 && col("doc_id") < 500)
    val (ids2, hi2) = run(Seq(replay.unionByName(fresh)))
    assert(ids2.forall(_ < 10000),
      s"replayed duplicates admitted post-compact: ${ids2.filter(_ >= 10000)}")
    assert(ids2.nonEmpty)
    for ((shard, h) <- hi2 if hi1.contains(shard))
      assert(h >= hi1(shard),
        s"shard $shard offsets reset by compaction: $h < ${hi1(shard)}")
  }

  test("incremental packing: shard offsets continue across micro-batches " +
       "(already-emitted bins never move)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    val out = DocStream.packIncremental(stream, shards = 2, budget = 10L)
    val q = out.toDF().writeStream
      .outputMode("append").format("memory").queryName("pack_inc").start()
    def doc(i: Long) = (i, Seq.fill(4)("w").mkString(" "))  // 4 tokens
    mem.addData((0L until 10L).map(doc): _*)
    q.processAllAvailable()
    mem.addData((10L until 20L).map(doc): _*)
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("pack_inc")
      .select("doc_id", "shard", "cum").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // per shard: cumulative offsets strictly increase across the two
    // batches in arrival order — batch 2 continues where batch 1 ended
    for ((_, rs) <- rows.groupBy(_._2)) {
      val inArrival = rs.sortBy(_._1).map(_._3)
      assert(inArrival.toSeq == inArrival.sorted.toSeq)
      assert(inArrival.last == 4L * rs.length)
    }
  }

  test("streaming snapshot dedup over dumps-in-order == batch " +
       "snapshotDedup over the union on (url, first_snap, keep_fetch); " +
       "revisits to OLD versions are suppressed cross-dump") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Int, String, Long)]
    val stream = mem.toDF().toDF("url", "snap", "text", "fetch_id")
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Long)]
    val q = DocStream.snapshotIncremental(stream, col("url"), col("snap"),
        col("text"), col("fetch_id")) { kept =>
      buf.synchronized {
        buf ++= kept.select("url", "first_snap", "keep_fetch").collect()
          .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      }
    }
    // dump 0: pages a/b/c (+ a same-dump duplicate fetch of a's content)
    val d0 = Seq(("a", 0, "v1", 1L), ("a", 0, "v1", 0L),
      ("b", 0, "v1", 2L), ("c", 0, "v1", 3L))
    // dump 1: a unchanged (suppress), b changed (emit), c changed (emit)
    val d1 = Seq(("a", 1, "v1", 10L), ("b", 1, "v2", 11L),
      ("c", 1, "v2", 12L))
    // dump 2: c reverts to its dump-0 content (suppress — version
    // already seen), b changed again (emit), new page d (emit)
    val d2 = Seq(("c", 2, "v1", 20L), ("b", 2, "v3", 21L),
      ("d", 2, "v1", 22L))
    for (d <- Seq(d0, d1, d2)) { mem.addData(d: _*); q.processAllAvailable() }
    q.stop()
    val want = graft.operators.Dedup.snapshotDedup(
        (d0 ++ d1 ++ d2).toDF("url", "snap", "text", "fetch_id"),
        col("url"), col("snap"), col("text"), col("fetch_id"))
      .select("url", "first_snap", "keep_fetch").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(buf.toSet == want)
    assert(buf.toSet == Set(("a", 0, 0L), ("b", 0, 2L), ("c", 0, 3L),
      ("b", 1, 11L), ("c", 1, 12L), ("b", 2, 21L), ("d", 2, 22L)))
  }

  test("streaming curation audit over id-ordered batches == batch " +
       "curationAudit over the union, including exact_dup across the " +
       "batch boundary") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val rules = Seq(
      "too_short" -> (length(col("text")) < 10),
      "has_x" -> col("text").contains("x"))
    // doc 5 duplicates doc 0 (cross-batch dup), doc 3 duplicates doc 2
    // (same-batch dup), doc 4 is short AND x-ridden
    val docs = Seq(
      (0L, "a long enough document"), (1L, "another long document"),
      (2L, "same words twice here!!"), (3L, "same words twice here!!"),
      (4L, "x!"), (5L, "a long enough document"))
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Int)]
    val q = DocStream.auditIncremental(stream, rules) { audited =>
      buf.synchronized {
        buf ++= audited
          .select(col("doc_id"), array_join(col("fails"), ",").as("f"),
            col("kept")).as[(Long, String, Int)].collect()
      }
    }
    // grouped(4): docs 2,3 share a batch (intra-batch window dup) and
    // doc 5 duplicates batch-1's doc 0 (cross-batch seen-table dup) —
    // both exact_dup resolution paths exercised
    for (b <- docs.grouped(4)) { mem.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val want = graft.operators.Curation.curationAudit(
        docs.toDF("doc_id", "text"), col("doc_id"), col("text"), rules)
      .select(col("doc_id"), array_join(col("fails"), ",").as("f"),
        col("kept")).as[(Long, String, Int)].collect()
    assert(want.exists(_._2 == "exact_dup"), "fixture must have dups")
    assert(buf.sortBy(_._1).toSeq == want.sortBy(_._1).toSeq)
    assert(buf.sortBy(_._1).map(r => (r._1, r._2)).toSeq == Seq(
      0L -> "", 1L -> "", 2L -> "", 3L -> "exact_dup",
      4L -> "has_x,too_short", 5L -> "exact_dup"))
  }

  test("streaming domain screening: the running allow-list after the " +
       "last batch equals batch domainScreen over the union, with " +
       "shards arriving in ANY order (mergeable integer sums)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val mem = MemoryStream[(Long, String, String)]
    val stream = mem.toDF().toDF("doc_id", "text", "source")
    var last: Array[(String, Long, Long, Long, Int)] = Array.empty
    val q = DocStream.domainStatsIncremental(stream) { screen =>
      last = screen.orderBy("source")
        .as[(String, Long, Long, Long, Int)].collect()
    }
    def shard(lo: Long, hi: Long) = docs
      .filter(col("doc_id") >= lo && col("doc_id") < hi)
      .select("doc_id", "text", "source")
      .as[(Long, String, String)].collect().toSeq
    // reverse arrival order on purpose: the law is order-free
    for (s <- Seq(shard(300, 500), shard(100, 300), shard(0, 100))) {
      mem.addData(s: _*); q.processAllAvailable()
    }
    q.stop()
    val want = graft.operators.Curation.domainScreen(docs)
      .orderBy("source").as[(String, Long, Long, Long, Int)]
      .collect()
    assert(want.exists(_._5 == 0) && want.exists(_._5 == 1),
      "fixture must exercise both screen outcomes")
    assert(last.toSeq == want.toSeq)
  }

  test("streaming heavy hitters: merged MG candidates are a certified " +
       "superset across batch boundaries, N is exact, and the finalize " +
       "pass equals batch heavyHitters over the union") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.TextAnalysis
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    def day(lo: Long, hi: Long) = docs
      .filter(col("doc_id") >= lo && col("doc_id") < hi)
    def tuples(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "text", "lang", "source", "n_chars")
      .as[(Long, String, String, String, Long)].collect().toSeq
    val k = 100
    val mem = MemoryStream[(Long, String, String, String, Long)]
    val stream = mem.toDF()
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    var state: (Map[String, Long], Long) = (Map.empty, 0L)
    val q = DocStream.heavyHittersIncremental(stream, k) { (s, n) =>
      state = (s, n)
    }
    Seq((0L, 160L), (160L, 320L), (320L, 500L)).foreach { case (lo, hi) =>
      mem.addData(tuples(day(lo, hi)): _*)
      q.processAllAvailable()
    }
    q.stop()
    val (cands, totalN) = state
    assert(cands.size <= k, "driver state must stay k-bounded")
    val exactN = docs
      .select(explode(split(col("text"), " "))).count()
    assert(totalN === exactN, "token total must be exact")
    val want = TextAnalysis.heavyHitters(docs, k)
      .as[(String, Long)].collect().toMap
    assert(want.nonEmpty, "fixture must have hitters at this k")
    assert(want.keySet.subsetOf(cands.keySet),
      s"MG merge lost true hitters: ${want.keySet -- cands.keySet}")
    val fin = TextAnalysis.heavyHittersExact(docs,
        cands.keys.toSeq, totalN, k)
      .as[(String, Long)].collect().toMap
    assert(fin === want, "finalize must equal batch heavyHitters")
  }

  test("durable heavy-hitters restart-resume: a SECOND stream on the " +
       "same stateDir continues from the committed MG snapshot and ends " +
       "in the same state as one uninterrupted stream") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    def tuples(lo: Long, hi: Long) = docs
      .filter(col("doc_id") >= lo && col("doc_id") < hi)
      .select("doc_id", "text")
      .as[(Long, String)].collect().toSeq
    val k = 100
    val stateDir = java.nio.file.Files
      .createTempDirectory("graft_hh_resume").toString
    // leg 1: two batches, then stop (the "crash")
    val mem1 = MemoryStream[(Long, String)]
    var state1: (Map[String, Long], Long) = (Map.empty, 0L)
    val q1 = DocStream.heavyHittersIncremental(
        mem1.toDF().toDF("doc_id", "text"), k,
        stateDir = Some(stateDir)) { (s, n) => state1 = (s, n) }
    Seq((0L, 160L), (160L, 320L)).foreach { case (lo, hi) =>
      mem1.addData(tuples(lo, hi): _*); q1.processAllAvailable()
    }
    q1.stop()
    // leg 2: a FRESH query resumes from the snapshot, sees batch 3 only
    val mem2 = MemoryStream[(Long, String)]
    var state2: (Map[String, Long], Long) = (Map.empty, 0L)
    val q2 = DocStream.heavyHittersIncremental(
        mem2.toDF().toDF("doc_id", "text"), k,
        stateDir = Some(stateDir)) { (s, n) => state2 = (s, n) }
    mem2.addData(tuples(320L, 500L): _*); q2.processAllAvailable()
    q2.stop()
    // uninterrupted control over the same batch boundaries
    val mem3 = MemoryStream[(Long, String)]
    var state3: (Map[String, Long], Long) = (Map.empty, 0L)
    val q3 = DocStream.heavyHittersIncremental(
        mem3.toDF().toDF("doc_id", "text"), k) { (s, n) => state3 = (s, n) }
    Seq((0L, 160L), (160L, 320L), (320L, 500L)).foreach { case (lo, hi) =>
      mem3.addData(tuples(lo, hi): _*); q3.processAllAvailable()
    }
    q3.stop()
    assert(state2._2 === state3._2, "resumed N must be exact")
    assert(state2._1 === state3._1,
      "resumed merge map must equal the uninterrupted stream's")
    assert(state2._2 > state1._2, "leg 2 must extend leg 1")
  }
}
