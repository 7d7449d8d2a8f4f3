package graft.streaming

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Streaming document-pipeline surface: continuous ingest of document
  * shards with per-micro-batch decontamination.
  *
  * The design point: operators whose unit of work is a WHOLE document
  * (contamination, quality gates, repetition scoring) need no cross-batch
  * streaming state — a document arrives complete inside one file-grain
  * micro-batch, so `foreachBatch` re-uses the EXACT batch operator per
  * batch. That keeps streaming and batch semantics identical by
  * construction (one code path), instead of re-deriving the operator
  * under watermark/output-mode constraints. Cross-document state (the
  * eval-set posting list) is static and broadcast, so each micro-batch
  * is a stateless map-side join at any corpus scale.
  */
object DocStream {

  /** documents schema (see FIXTURES.md) — streaming sources don't infer. */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Open the documents table as a file stream (shared symlink-directory
    * device: FileStreamSource wants a directory, testdata is a single
    * read-only parquet file).
    */
  def readDocuments(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(documentsSchema)
      .parquet(StreamDirs.fileStreamDir(dir, "documents.parquet",
        "graft_docstream").toString)

  /** Continuous decontamination: every micro-batch of arriving documents
    * runs `Dedup.contamination` against the static eval set and hands the
    * flagged (doc, eval, overlap) pairs to `sink` (a JDBC/Delta/parquet
    * append in production). Returns the running query; callers stop it.
    */
  def decontaminate(docsStream: DataFrame, evalSet: DataFrame,
                    k: Int = 3, minShared: Long = 2)
                   (sink: DataFrame => Unit): StreamingQuery =
    docsStream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(graft.operators.Dedup.contamination(batch, evalSet, k, minShared))
      }
      .start()

  /** Continuous decontamination by EXCISION: every arriving micro-batch
    * is rebuilt with any l-token window already present in `seen` (eval
    * set or stored corpus) cut out — `Dedup.exciseSeenSpans` per batch,
    * so stream and batch outputs agree by construction. Same static-
    * snapshot caveat as [[dedupIncremental]].
    */
  def exciseIncremental(docsStream: DataFrame, seen: DataFrame,
                        l: Int = 8, hashKeys: Boolean = false)
                       (sink: DataFrame => Unit): StreamingQuery =
    docsStream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(graft.operators.Dedup.exciseSeenSpans(batch, seen, l, hashKeys))
      }
      .start()

  /** Continuous ingest-time dedup: every arriving shard is admitted only
    * where it duplicates nothing in the STORED corpus
    * (`Dedup.incrementalDedup` per micro-batch — the exact batch
    * operator, so stream and batch admissions agree by construction).
    * Same stateless-per-batch rationale as `decontaminate`: the arriving
    * shard is the small broadcast side; the corpus index streams. Note
    * the corpus snapshot is static per query run — admitting batch A
    * does not block a duplicate in batch B; production re-snapshots the
    * corpus (or unions recent admissions) between runs, the same
    * trade-off every ingest pipeline makes between index freshness and
    * re-index cost.
    */
  def dedupIncremental(docsStream: DataFrame, corpus: DataFrame,
                       k: Int = 3, minShared: Long = 2)
                      (sink: DataFrame => Unit): StreamingQuery =
    docsStream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(graft.operators.Dedup.incrementalDedup(batch, corpus, k,
          minShared))
      }
      .start()

  /** Continuous DSIR scoring against a FROZEN per-bucket score table
    * (`Curation.dsirStats` trained once on the stored corpus): every
    * arriving micro-batch runs `Curation.dsirScoreWith` — one explode,
    * one broadcast join, one doc fold; no cross-batch state at all,
    * because per-doc scores are independent. The law (DocStreamSpec):
    * the union of per-batch outputs equals the batch scorer over the
    * union, in any arrival order. Retraining the stats table is a
    * deliberate batch event (swap the broadcast artifact), exactly how
    * production DSIR pins its selection distribution per snapshot.
    */
  def dsirIncremental(docsStream: DataFrame, stats: DataFrame,
                      buckets: Int = 256)
                     (sink: DataFrame => Unit): StreamingQuery =
    docsStream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(graft.operators.Curation.dsirScoreWith(batch, stats, buckets))
      }
      .start()

  /** The COMPOSED daily-ingest job a production pipeline actually runs:
    * per micro-batch (one "day" of arriving shards), in ONE
    * `foreachBatch` body —
    *
    *   1. incremental dedup against the stored corpus index (which
    *      GROWS by each day's admissions: day-2 duplicates of day-1
    *      admissions are rejected, the production re-snapshot
    *      semantic);
    *   2. decontamination of the admitted docs against the static eval
    *      set (contaminated docs are kept in the dedup index — they ARE
    *      corpus content — but excluded from the training manifest);
    *   3. append-only packing of the clean docs: per-shard token
    *      offsets carry across days, so already-emitted (shard, bin)
    *      cells never move.
    *
    * Cross-day state is tiny and driver-held (`shards` longs of pack
    * offsets) plus an APPEND-ONLY admissions store on disk: each day's
    * admitted docs are written once — O(day), never O(corpus) — into
    * their own parquet subdir of `stateDir`, and the dedup's corpus
    * side is `corpus` unioned with ONE multi-path scan over every
    * prior subdir. Plans stay flat for any number of batches (a single
    * file-scan relation, not a growing union lineage), and per-batch
    * I/O is bounded by the day's admissions — the earlier
    * `localCheckpoint` of the whole accumulated corpus paid
    * O(corpus x batches) write I/O over a long-running stream. Each
    * `sink` call receives that day's manifest rows
    * (doc_id, shard, n_tok, cum, bin).
    *
    * Crash discipline: a batch's admissions are staged in a `tmp_b*`
    * directory and COMMITTED — together with the pack-offsets snapshot
    * the batch produced — by ONE atomic directory rename into the `b*`
    * namespace, and the rename happens only AFTER `sink` returned.
    * A crash before the rename leaves the store exactly as it was
    * (stale `tmp_b*` dirs are swept at startup), so the replayed batch
    * re-admits and re-emits — the standard at-least-once/idempotent-
    * sink foreachBatch contract — instead of finding its own docs
    * already admitted and silently emitting nothing (the lost-manifest
    * window of the earlier write-then-sink order). A crash after the
    * rename replays to zero admissions AND resumes the committed
    * offsets, so nothing is double-packed. Partial parquet writes can
    * never surface: an uncommitted directory is by construction never
    * in the `b*` namespace the corpus scan reads.
    *
    * `stateDir` defaults to a fresh temp directory (the spec/benchmark
    * mode); production passes a durable path so a restarted query
    * resumes against the admissions already stored.
    *
    * When days arrive in doc_id order, the concatenated manifests equal
    * the batch recomputation over the union (asserted in
    * `DocStreamSpec`) — streaming and batch share one code path per
    * stage, so the equivalence is structural, not coincidental.
    */
  def ingestPipeline(docsStream: DataFrame, corpus: DataFrame,
                     evalSet: DataFrame, shards: Int, budget: Long,
                     k: Int = 3, minShared: Long = 2,
                     stateDir: Option[String] = None)
                    (sink: DataFrame => Unit): StreamingQuery = {
    import org.apache.spark.sql.functions._
    require(shards > 0 && budget > 0)
    val offsets = scala.collection.mutable.Map.empty[Long, Long]
    val admitRoot = stateDir.map(Paths.get(_)).getOrElse(
      Files.createTempDirectory("graft_ingest_admitted"))
    Files.createDirectories(admitRoot)
    // sweep stage dirs a crashed batch left behind — they were never
    // committed, so deleting them just re-opens the replay path
    GenStore.sweepStaged(admitRoot)
    // resume support: pre-existing committed subdirs (durable stateDir)
    // are prior admissions; a fresh temp dir starts empty
    def subdirs(): Seq[String] =
      GenStore.committed(admitRoot).map(_.toString)
    // the pack offsets are part of the durable state: without them a
    // restart would re-emit already-used (shard, bin) cells, breaking
    // the append-only manifest invariant. Each committed batch dir
    // carries the offsets snapshot it produced (so admissions + offsets
    // commit in ONE rename); resume loads the newest snapshot. The
    // root-level offsets.tsv is the pre-r11 layout, read as a fallback.
    loadNewestOffsets(admitRoot).foreach { case (s, o) =>
      offsets(s) = o
    }
    var seq = GenStore.nextSeq(admitRoot)
    docsStream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val prior = subdirs()
        val corpusSide =
          if (prior.isEmpty) corpus
          else corpus.unionByName(
            spark.read.schema(batch.schema).parquet(prior: _*)
              .select(corpus.columns.map(col): _*))
        // stage, don't commit: the tmp_ prefix keeps the dir out of the
        // committed namespace until sink + offsets are durable
        val sub = GenStore.stagedPath(admitRoot, seq)
        graft.operators.Dedup
          .incrementalDedup(batch, corpusSide, k, minShared)
          .write.mode("overwrite").parquet(sub.toString)
        // read the day's admissions BACK from the store: downstream
        // stages run off the one materialized copy (flat file-scan
        // lineage — the job the write ran is never recomputed)
        val admitted = spark.read.schema(batch.schema).parquet(sub.toString)
        val flagged = graft.operators.Dedup
          .contamination(admitted, evalSet, k, minShared)
          .select(col("doc_id")).distinct()
        val clean = admitted.join(flagged, Seq("doc_id"), "left_anti")
        // pack this day's clean docs continuing each shard's offset
        import spark.implicits._
        val offDf = offsets.toSeq.toDF("shard", "off")
        val packed = graft.operators.Curation.packShards(clean,
            col("doc_id"), size(split(col("text"), " ")), shards, budget)
          .join(broadcast(offDf), Seq("shard"), "left")
          .withColumn("off", coalesce(col("off"), lit(0L)))
          .withColumn("cum", col("cum") + col("off"))
          .withColumn("bin",
            floor((col("cum") - col("n_tok")).cast("double") / budget)
              .cast("long"))
          .drop("off")
          .localCheckpoint(eager = true)
        packed.groupBy(col("shard")).agg(max(col("cum")).as("hi"))
          .collect()
          .foreach(r => offsets(r.getLong(0)) = r.getLong(1))
        sink(packed)
        // COMMIT POINT: snapshot the offsets into the staged dir, then
        // one atomic rename moves admissions + offsets into the
        // committed namespace together (GenStore's discipline).
        // Everything before this line replays on crash (idempotent-sink
        // contract); after it, the replayed batch dedups to zero and
        // resumes these offsets.
        GenStore.writePairs(sub.resolve("_offsets.tsv"), offsets)
        GenStore.commit(admitRoot, sub, seq)
        seq += 1
      }
      .start()
  }

  /** Offsets resume: newest committed generation's snapshot wins; a
    * pre-r11 root-level offsets.tsv (written per batch, not per commit)
    * is honored when no generation carries one.
    */
  private def loadNewestOffsets(
      root: java.nio.file.Path): Seq[(Long, Long)] = {
    GenStore.loadNewestPairs(GenStore.committed(root), "_offsets.tsv")
      .getOrElse {
        val legacy = root.resolve("offsets.tsv")
        if (Files.exists(legacy)) GenStore.readPairs(legacy)
        else Seq.empty
      }
  }

  /** Fold every committed admission generation of an ingest `stateDir`
    * into ONE — the doc-side LSM compaction (the embedding stream's
    * `compact()` sibling): a year-long daily stream otherwise pays an
    * ever-growing multi-path listing + small-file scan per batch.
    * Quiescent-only by contract (no ingest query may be mid-batch on
    * this stateDir). The compacted generation commits by the SAME
    * atomic-rename device as a batch — it carries the newest offsets
    * snapshot plus a `_replaces.tsv` marker naming the generations it
    * supersedes; stale generations are deleted only after the commit,
    * and a crash between commit and delete is healed on the next
    * compaction/resume by finishing the recorded deletes (the marker is
    * cleared once the replaced dirs are gone). The admissions SET —
    * and therefore every future dedup decision and resumed offset — is
    * invariant under compaction (DocStreamSpec law).
    *
    * `schema` guards the all-generations-empty edge (no footers to
    * infer from); omit it when any admitted batch was non-empty.
    * Returns rows rewritten (0 = nothing to fold).
    */
  def compactAdmissions(spark: SparkSession, stateDir: String,
                        schema: Option[StructType] = None): Long = {
    val root = Paths.get(stateDir)
    require(Files.isDirectory(root), s"no ingest state at $stateDir")
    GenStore.sweepStaged(root)
    GenStore.healReplaces(root)
    val gens = GenStore.committed(root)
    if (gens.size <= 1) return 0L
    val offs = loadNewestOffsets(root)
    val nextSeq = GenStore.nextSeq(root)
    val staged = GenStore.stagedPath(root, nextSeq)
    def reader = schema.map(spark.read.schema(_)).getOrElse(spark.read)
    reader.parquet(gens.map(_.toString): _*).write.mode("overwrite")
      .parquet(staged.toString)
    // read-back honors the caller's schema too: the all-empty-
    // generations fold writes a part-file-less dir that schema
    // inference cannot read — exactly the edge `schema` guards
    val n = reader.parquet(staged.toString).count()
    GenStore.writePairs(staged.resolve("_offsets.tsv"), offs.toMap)
    GenStore.writeReplaces(staged, gens)
    val committedDir = GenStore.commit(root, staged, nextSeq)
    gens.foreach(GenStore.deleteRecursively)
    Files.deleteIfExists(committedDir.resolve("_replaces.tsv"))
    Files.deleteIfExists(root.resolve("offsets.tsv")) // legacy snapshot
    n
  }

  final case class PackState(cum: Long)
  final case class PackOut(doc_id: Long, shard: Long, n_tok: Long,
                           cum: Long, bin: Long)

  /** Ingest-time incremental packing — the streaming twin of
    * `Curation.packShards`: each shard keeps ONE running token offset as
    * state, and every arriving document is appended to the shard's
    * current bin (bin = start offset div budget, the same rule as the
    * batch operator). Documents are assigned in arrival order (doc_id
    * within a micro-batch), which is the production ingest semantic:
    * the loader manifest grows append-only, already-emitted bins never
    * change. When the whole corpus arrives ordered (one batch), the
    * assignment equals the batch operator's exactly.
    *
    * State per shard is a single long — bounded regardless of stream
    * length; shards process independently (hash-partitioned), so the
    * operator scales with executors like its batch twin.
    */
  def packIncremental(docsStream: DataFrame, shards: Int,
                      budget: Long): org.apache.spark.sql.Dataset[PackOut] = {
    require(budget > 0, s"budget must be positive, got $budget")
    import docsStream.sparkSession.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    docsStream
      .select(col("doc_id").cast("long"),
        // a NULL text (quarantined/corrupt record) counts 0 tokens —
        // size(split(NULL)) is NULL and would kill the whole query in
        // the non-nullable tuple encoder
        when(col("text").isNull, lit(0L))
          .otherwise(size(split(col("text"), " ")).cast("long"))
          .as("n_tok"),
        graft.operators.Curation.shardId(col("doc_id"), shards)
          .as("shard"))
      .as[(Long, Long, Long)]
      .groupByKey(_._3)
      .flatMapGroupsWithState[PackState, PackOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (shard, rows, state) =>
          var cum = state.getOption.map(_.cum).getOrElse(0L)
          val out = rows.toSeq.sortBy(_._1).map { case (id, tok, _) =>
            val start = cum
            cum += tok
            PackOut(id, shard, tok, cum, start / budget)
          }
          state.update(PackState(cum))
          out.iterator
      }
  }

  /** Continuous domain screening: the per-source quality stats are
    * pure integer sums ([[graft.operators.Curation.domainStats]]), so
    * each micro-batch's stats MERGE BY ADDITION into a running
    * |sources|-row table — the mergeable-sketch shape (like the HLL
    * rollup) rather than a re-scan. After every batch the sink
    * receives the refreshed allow-list over ALL data so far; by
    * commutativity of the sums the result is identical to batch
    * `domainScreen` over the union, in any arrival order (the
    * spec-locked law — stronger than the in-order-only laws of the
    * dedup twins). State is the stats table itself,
    * lineage-truncated per batch.
    */
  /** Streaming heavy hitters — the incremental twin of
    * `TextAnalysis.heavyHitters`. Each micro-batch's per-partition
    * MG(k) summaries (a bounded (k+1)·partitions-row collect) fold
    * into ONE driver-held k-bounded map via the mergeable-summaries
    * rule (`TextAnalysis.mgMerge` — error bounds add, so the merged
    * map keeps the global guarantee: any token with freq > N/k over
    * EVERYTHING seen survives, whatever the batch boundaries). The
    * exact token total accumulates alongside.
    *
    * After each batch, `sink` receives the current (candidate map,
    * exact N). The candidates are a certified SUPERSET of the true
    * heavy hitters so far; the exact answer at any point is one
    * `TextAnalysis.heavyHittersExact` pass over the stored corpus with
    * these candidates — the spec-locked law is that this finalize
    * EQUALS batch heavyHitters over the union.
    *
    * DURABILITY: pass `stateDir` to snapshot the (merge map, exact N)
    * per commit through [[GenStore]]'s discipline — the snapshot
    * stages under `tmp_b<seq>` and becomes visible only via the atomic
    * commit rename AFTER the sink returned, so a crash mid-batch
    * leaves the last committed state intact and the replayed batch
    * re-merges from it. A restarted call on the same `stateDir`
    * RESUMES from the newest committed snapshot (the restart-resume
    * law in DocStreamSpec); explicit `state0` is the in-memory escape
    * hatch and yields to an on-disk snapshot when both exist.
    */
  def heavyHittersIncremental(docsStream: DataFrame, k: Int,
      state0: Option[(Map[String, Long], Long)] = None,
      stateDir: Option[String] = None)
      (sink: (Map[String, Long], Long) => Unit): StreamingQuery = {
    val root = stateDir.map(Paths.get(_))
    root.foreach { r =>
      Files.createDirectories(r)
      GenStore.sweepStaged(r)
    }
    val resumed = root.flatMap { r =>
      val gens = GenStore.committed(r)
      GenStore.loadNewestTokenCounts(gens, "_mg.tsv").map { toks =>
        val n = GenStore.loadNewestPairs(gens, "_mg_n.tsv")
          .flatMap(_.headOption).map(_._2).getOrElse(0L)
        (toks.toMap, n)
      }
    }
    var summary: Map[String, Long] =
      resumed.map(_._1).orElse(state0.map(_._1)).getOrElse(Map.empty)
    var total: Long =
      resumed.map(_._2).orElse(state0.map(_._2)).getOrElse(0L)
    var seq = root.map(GenStore.nextSeq).getOrElse(0L)
    docsStream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val rows = graft.operators.TextAnalysis.mgSummary(batch, k)
          .collect() // (k+1) rows per batch partition, bounded
        val batchMaps = rows.filter(!_.isNullAt(0))
          .groupBy(_.getString(0))
          .view.mapValues(_.map(_.getLong(1)).sum).toMap
        val batchN = rows.filter(_.isNullAt(0)).map(_.getLong(1)).sum
        summary = graft.operators.TextAnalysis.mgMerge(summary, batchMaps, k)
        total += batchN
        sink(summary, total)
        root.foreach { r =>
          val staged = GenStore.stagedPath(r, seq)
          Files.createDirectories(staged)
          GenStore.writeTokenCounts(staged.resolve("_mg.tsv"), summary)
          GenStore.writePairs(staged.resolve("_mg_n.tsv"), Map(0L -> total))
          GenStore.commit(r, staged, seq)
          // each snapshot is SELF-CONTAINED (full map + total, not a
          // delta), so prior generations are pure growth — prune them
          // after the commit. A crash between commit and prune leaves
          // harmless extras (resume reads the newest).
          GenStore.committed(r).filter(GenStore.seqOf(_) < seq)
            .foreach(GenStore.deleteRecursively)
          seq += 1
        }
      }
      .start()
  }

  def domainStatsIncremental(docsStream: DataFrame,
      minTtrMicro: Long = graft.operators.Curation.DefaultMinTtrMicro,
      minStopMicro: Long = graft.operators.Curation.DefaultMinStopMicro,
      stats0: Option[DataFrame] = None)
                            (sink: DataFrame => Unit): StreamingQuery = {
    var stats: Option[DataFrame] = stats0.map(_.localCheckpoint(true))
    docsStream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = graft.operators.Curation.domainStats(batch)
        val merged = stats.map(s =>
          graft.operators.Curation.mergeDomainStats(s, b)).getOrElse(b)
          .localCheckpoint(true)
        stats = Some(merged)
        sink(graft.operators.Curation.screenFromStats(merged,
          minTtrMicro, minStopMicro))
      }
      .start()
  }

  /** Continuous curation audit: the rule battery is per-document
    * stateless (the same map-side flags projection as the batch
    * audit — shared code), and the one corpus-wide rule, exact_dup,
    * resolves against an accumulated content-hash table: a document
    * fails it when its hash was seen in ANY earlier batch, or earlier
    * (by id) inside its own batch. When batches arrive in id order the
    * concatenated audits equal the batch audit over the union (the
    * spec-locked law — same in-order contract as the dedup twins).
    * State is the distinct-hash table, lineage-truncated per batch.
    */
  def auditIncremental(docsStream: DataFrame,
                       rules: Seq[(String, Column)],
                       seen0: Option[DataFrame] = None)
                      (sink: DataFrame => Unit): StreamingQuery = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{lit, min, when}
    // distinct: a naively-built prior state (hashes with repeats)
    // would fan out the left join and duplicate audit rows
    var seen: Option[DataFrame] = seen0.map(_.select(col("c_hash"))
      .distinct().localCheckpoint(true))
    docsStream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val (slim0, names) = graft.operators.Curation.auditFlags(
          batch, col("doc_id"), col("text"), rules)
        val slim = slim0.localCheckpoint(true) // audited AND folded into state
        val batchDup = col("doc_id") =!=
          min(col("doc_id")).over(Window.partitionBy(col("c_hash")))
        val flagged = seen match {
          case Some(s) => slim
            .join(s.withColumn("__seen", lit(1)), Seq("c_hash"), "left")
            .withColumn("exact_dup", batchDup || col("__seen").isNotNull)
            .drop("__seen")
          case None => slim.withColumn("exact_dup", batchDup)
        }
        sink(graft.operators.Curation.auditFold(flagged, names))
        val keys = slim.select(col("c_hash"))
        seen = Some(seen.map(_.unionAll(keys)).getOrElse(keys)
          .distinct().localCheckpoint(true))
      }
      .start()
  }

  /** Continuous snapshot (recrawl) dedup: each arriving micro-batch is
    * one crawl dump; a fetch is emitted only when its (url, content)
    * version was never seen in ANY earlier dump — the unchanged-recrawl
    * bytes that dominate a new dump at 100 TB are dropped at ingest
    * instead of re-entering every downstream dedup. Per batch: the
    * batch's own version table (`Dedup.snapshotVersions` — the exact
    * batch operator, so within-dump semantics are shared by
    * construction), then one anti-join against the accumulated
    * (url, c_hash) version set. Cross-dump state is that version
    * TABLE, not driver memory — it grows by each dump's new versions
    * and is lineage-truncated per batch; at scale it lives in the
    * lakehouse and the anti-join is bloom-prefilterable
    * (`engine.BloomPrune`), exactly like the incremental text-dedup
    * corpus index.
    *
    * Law (DocStreamSpec): when dumps arrive in snapshot order with
    * fetch ids increasing across dumps, the concatenated emissions
    * equal batch `snapshotDedup` over the union on
    * (url, first_snap, keep_fetch); `n_fetches` counts only the
    * EMITTING dump's fetches (later identical recrawls were suppressed,
    * not merged — the one field where stream and batch views differ,
    * by design: the stream answers "what was new in dump d").
    *
    * `seen0` seeds prior state (re-starting against an existing
    * version store); pass None for a cold start.
    */
  def snapshotIncremental(crawlStream: DataFrame, urlCol: Column,
                          snapCol: Column, contentCol: Column,
                          fetchIdCol: Column,
                          seen0: Option[DataFrame] = None)
                         (sink: DataFrame => Unit): StreamingQuery = {
    var seen: Option[DataFrame] = seen0.map(_.select(col("url"),
      col("c_hash")).localCheckpoint(true))
    crawlStream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val versions = graft.operators.Dedup.snapshotVersions(
          batch, urlCol, snapCol, contentCol, fetchIdCol)
        val fresh = seen match {
          case Some(s) => versions.join(s, Seq("url", "c_hash"),
            "left_anti")
          case None => versions
        }
        // one pass: emit + fold the new version keys into the state
        val kept = fresh.localCheckpoint(true)
        sink(kept.drop("c_hash"))
        val keys = kept.select(col("url"), col("c_hash"))
        seen = Some(seen.map(_.unionAll(keys)).getOrElse(keys)
          .localCheckpoint(true))
      }
      .start()
  }
}
