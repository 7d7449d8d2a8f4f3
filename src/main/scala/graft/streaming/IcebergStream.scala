package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sources.Iceberg

/** Continuous LAKEHOUSE INGESTION: each micro-batch lands as one
  * Iceberg SNAPSHOT via [[Iceberg.appendToTable]] — the streaming twin
  * of the batch composer, and the natural sink for the curation
  * twins' outputs (a downstream job time-travels to any batch
  * boundary, `scan(asOf = …)`).
  *
  * Durability comes from the table format itself: a snapshot becomes
  * visible only when `version-hint.text` flips to the new metadata
  * version — the LAST write of the append — so a crash mid-append
  * leaves the table at the previous snapshot with only unreferenced
  * files on disk (the next [[Iceberg.expireSnapshots]] sweep is the
  * GC). Idempotence is ID-KEYED (the ivfAppendIncremental device): a
  * batch replay's rows already present in the current snapshot are
  * dropped by one anti-join before the append, and a replay that
  * empties out appends NO snapshot at all. At 100 TB the anti-join
  * probe reads only the id column (parquet-pruned) and is
  * bloom-prefilterable (engine.BloomPrune).
  *
  * The law (IcebergStreamSpec): after any batches + replays, the
  * current scan equals the distinct union of everything sent, and the
  * snapshot history has one entry per NON-EMPTY effective batch.
  */
object IcebergStream {

  /** `retainLast` (0 = keep all) trims snapshot history behind the
    * sink: after each committed batch, [[Iceberg.expireSnapshots]]
    * keeps the last N snapshots — at a batch per minute a week of
    * history is 10k metadata entries unless the sink GCs behind
    * itself. Lagging pollOnce consumers keep working while their
    * cursor stays inside the retained window; older cursors fail
    * loudly (the IcebergStreamSpec retention law).
    */
  def appendIncremental(stream: DataFrame, tableDir: String,
                        partCol: String, idCol: String,
                        retainLast: Int = 0): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val cols = batch.columns.toSeq
        // Hadoop-FS probe for a READABLE table (version hint or a
        // vN.metadata.json) — a bare metadata/ dir left by a crash
        // inside the first batch's writeTable must take the build
        // branch again, not fail forever in currentMetadata
        val tableExists = Iceberg.tableExists(tableDir)
        val fresh =
          if (!tableExists) batch
          else {
            val seen = Iceberg.scan(spark, tableDir)
              .select(col(s"`$idCol`"))
            batch.join(seen, Seq(idCol), "left_anti")
          }
        // column order survives the anti-join reorder
        val out = fresh.select(cols.map(c => col(s"`$c`")): _*)
        if (!tableExists) Iceberg.writeTable(out, tableDir, partCol)
        else if (!out.isEmpty) {
          Iceberg.appendToTable(out, tableDir)
          if (retainLast > 0)
            Iceberg.expireSnapshots(tableDir, retainLast)
        }
      }
      .start()

  /** WRITE-AUDIT-PUBLISH streaming sink: each micro-batch stages as a
    * BRANCH snapshot ([[Iceberg.appendToTable]] with `branch`), so
    * main-line readers and pollOnce consumers see NOTHING until the
    * sink publishes — then every `publishEvery` staged commits the
    * `audit` hook runs over the BRANCH HEAD scan and, if it passes,
    * [[Iceberg.fastForward]] flips main to the audited state in one
    * metadata commit. A failing audit leaves the batches staged (main
    * frozen, ingestion continues) and re-audits at the next batch —
    * quarantine-by-default ingestion: bad data can land, it just
    * cannot PUBLISH.
    *
    * Batch-replay idempotence is the id-keyed anti-join against the
    * BRANCH head (staged rows included), so a replayed batch stages
    * nothing new. The first batch builds the table (that base state
    * is main — an empty table would give consumers nothing to
    * bootstrap from) and forks the branch.
    *
    * The law (IcebergBranchSpec): under any batch/replay sequence,
    * main only ever equals an AUDITED prefix of the staged history,
    * and the final publish makes scan == distinct union of all sent.
    */
  def appendStaged(stream: DataFrame, tableDir: String,
                   partCol: String, idCol: String,
                   branch: String = "staging",
                   publishEvery: Int = 1,
                   audit: DataFrame => Boolean = _ => true)
      : StreamingQuery = {
    require(publishEvery >= 1, "appendStaged: publishEvery must be >= 1")
    stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val cols = batch.columns.toSeq
        if (!Iceberg.tableExists(tableDir)) {
          Iceberg.writeTable(batch, tableDir, partCol)
          Iceberg.createBranch(tableDir, branch)
        } else {
          // crash window: a restart that died between the first
          // batch's writeTable and createBranch must fork the branch
          // now, not fail forever on the missing ref
          if (!Iceberg.currentMetadata(tableDir).refs.contains(branch))
            Iceberg.createBranch(tableDir, branch)
          val meta = Iceberg.currentMetadata(tableDir)
          val seen = Iceberg.scan(spark, tableDir,
              asOf = Some(meta.refs(branch)))
            .select(col(s"`$idCol`"))
          val fresh = batch.join(seen, Seq(idCol), "left_anti")
            .select(cols.map(c => col(s"`$c`")): _*)
          if (!fresh.isEmpty)
            Iceberg.appendToTable(fresh, tableDir,
              branch = Some(branch))
          // staged depth = parent-chain distance from the branch head
          // back to main (stateless — derived from metadata alone)
          val m2 = Iceberg.currentMetadata(tableDir)
          var cur = m2.refs(branch)
          var depth = 0
          while (cur != m2.currentSnapshotId &&
                 m2.parents.contains(cur)) {
            cur = m2.parents(cur); depth += 1
          }
          if (depth >= publishEvery &&
              audit(Iceberg.scan(spark, tableDir,
                asOf = Some(m2.refs(branch)))))
            Iceberg.fastForward(tableDir, branch)
        }
      }
      .start()
  }

  /** UPDATE-capable streaming sink: each micro-batch UPSERTS into the
    * table ([[Iceberg.upsertTable]] — one snapshot whose equality
    * delete retires older versions of the batch's keys while the
    * batch's own rows land as appended files; nothing rewritten).
    * Within a batch, `orderCol` arbitrates duplicates of a key
    * (latest wins, ties to the larger row for determinism) — the
    * standard CDC change-feed shape where a key may change twice
    * between triggers.
    *
    * Replay idempotence here is SEMANTIC: re-upserting the same rows
    * commits a snapshot but cannot change table state (the replay's
    * delete retires the first attempt's identical rows). The law in
    * IcebergStreamSpec: after any batches + replays, the scan equals
    * latest-wins over everything sent.
    *
    * `compactEvery` bounds the MERGE-ON-READ DEPTH of a long-running
    * feed: each upsert commit adds one anti-join tier to the scan
    * until compaction folds them, so with the knob set the sink calls
    * [[Iceberg.compactIfStacked]] after each batch — at most N
    * row-level commits ever stack (the IcebergStreamSpec law:
    * mid-stream compaction changes no answer). 0 = never (callers run
    * their own maintenance); compaction breaks incremental diffs
    * across it, so pair a compacting writer with re-bootstrappable
    * consumers.
    */
  def upsertIncremental(stream: DataFrame, tableDir: String,
                        partCol: String, keyCols: Seq[String],
                        orderCol: String,
                        compactEvery: Int = 0,
                        retainLast: Int = 0): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        import org.apache.spark.sql.expressions.Window
        import org.apache.spark.sql.functions.row_number
        val cols = batch.columns.toSeq
        val tieBreak = cols
          .filterNot(c => keyCols.contains(c) || c == orderCol)
          .sorted.map(c => col(s"`$c`").desc)
        val latest = batch
          .withColumn("__rn", row_number().over(Window
            .partitionBy(keyCols.map(c => col(s"`$c`")): _*)
            .orderBy(col(s"`$orderCol`").desc +: tieBreak: _*)))
          .filter(col("__rn") === 1)
          .select(cols.map(c => col(s"`$c`")): _*)
        if (!Iceberg.tableExists(tableDir))
          Iceberg.writeTable(latest, tableDir, partCol)
        else if (!latest.isEmpty) {
          Iceberg.upsertTable(latest, tableDir, keyCols)
          if (compactEvery > 0) {
            Iceberg.compactIfStacked(batch.sparkSession, tableDir,
              compactEvery)
            ()
          }
          if (retainLast > 0)
            Iceberg.expireSnapshots(tableDir, retainLast)
        }
      }
      .start()

  /** READ-side CDC twin of the snapshot-per-batch sink: process every
    * row committed since the durable cursor, exactly the shape of a
    * foreachBatch consumer polling a lakehouse table. One poll =
    *
    *   - resolve the current snapshot (one metadata read);
    *   - no cursor yet → BOOTSTRAP: the full current scan;
    *   - cursor behind → [[Iceberg.incrementalScan]](cursor, current):
    *     the added data files only, resolved from METADATA alone (two
    *     manifest-list walks), so each poll costs O(delta) reads at
    *     any table size;
    *   - cursor current → NO-OP, `process` is not invoked.
    *
    * The cursor advances with an atomic temp+rename AFTER `process`
    * returns — a crash mid-process replays the same delta next poll
    * (at-least-once, the foreachBatch contract; pair with id-keyed
    * sinks for effective exactly-once). Returns the snapshot id the
    * cursor rests on after the poll.
    *
    * The stream==batch law (IcebergStreamSpec): over ANY poll/commit
    * interleaving, the union of everything processed equals the final
    * full scan. Snapshots must not be expired past an idle consumer's
    * cursor — the incremental read of an expired boundary fails
    * loudly, never returns a silently-wrong delta.
    */
  def pollOnce(spark: org.apache.spark.sql.SparkSession,
               tableDir: String, cursorFile: String)
              (process: DataFrame => Unit): Long = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val meta = Iceberg.currentMetadata(tableDir)
    val current = meta.currentSnapshotId
    val cursor = Paths.get(cursorFile)
    val last: Option[Long] =
      if (Files.exists(cursor))
        Some(new String(Files.readAllBytes(cursor), "UTF-8").trim.toLong)
      else None
    require(last.forall(_ <= current),
      s"iceberg poll: cursor ${last.get} is ahead of snapshot $current")
    if (!last.contains(current)) {
      val delta = last match {
        case None    => Iceberg.scan(spark, tableDir)
        case Some(f) => Iceberg.incrementalScan(spark, tableDir, f, current)
      }
      process(delta)
      // commit the cursor only after the processor returned
      val tmp = Paths.get(cursorFile + ".tmp")
      Files.createDirectories(cursor.toAbsolutePath.getParent)
      Files.write(tmp, current.toString.getBytes("UTF-8"))
      Files.move(tmp, cursor, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }
    current
  }
}
