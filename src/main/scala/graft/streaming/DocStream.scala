package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
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
}
