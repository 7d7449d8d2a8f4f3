package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Streaming embedding-pipeline surface: continuous ingest of embedding
  * shards with incremental semantic dedup — the embedding-side twin of
  * [[DocStream]]'s text ingest (the r8 gap: text had a daily-shard
  * incremental path, embeddings recomputed the full SemDeDup).
  *
  * Production IVF practice shapes the design: the quantizer is trained
  * ONCE on the stored-corpus snapshot and FROZEN — arriving vectors are
  * assigned to the existing cells (faiss trains on a sample, assigns
  * forever; retraining would reshuffle every stored vector's cell).
  * Per micro-batch the work is:
  *
  *   1. assign the shard to the frozen centroids (broadcast argmin —
  *      the exact batch rule, [[graft.operators.Dedup.assignToCentroids]]);
  *   2. gate new×new pairs (cell-blocked self-join over the SHARD only)
  *      and new×stored pairs ([[graft.operators.Dedup.embeddingPairsAcross]]
  *      — the stored side streams, only the shard exchanges);
  *   3. fold the new edges into the accumulated duplicate graph and
  *      re-close connected components — the graph holds only NEAR-DUP
  *      PAIRS (the corpus' duplication volume, not its size), so the
  *      re-closure is bounded by dup density, never by corpus scale;
  *   4. emit the DELTA: the shard's canonical assignments plus any
  *      stored vector whose canonical changed (a new vector can bridge
  *      two old components — min-id canonicals then move; append-only
  *      emission of new rows alone would silently disagree with batch).
  *
  * EXACT by construction, for ANY arrival order: every within-cell
  * gated pair {u, v} is found either at init (both stored), in v's
  * batch (u stored or same batch), so the accumulated edge set equals
  * the batch edge set over the union, assignments are per-vector
  * identical (same frozen centroids, same tie rule), and the final
  * canonical table EQUALS [[graft.operators.Dedup.semanticDedupWith]]
  * (union, same centroids) — spec-locked in `EmbStreamSpec`, measured
  * at sf1 by `StreamScale -emb`. Callers must feed fresh vec_ids
  * (re-sends would double rows, as in every append-only ingest).
  */
object EmbStream {

  /** embeddings schema (FIXTURES.md) — streaming sources don't infer. */
  val embeddingsSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  /** Open the embeddings table as a file stream (same symlink-directory
    * device as [[DocStream.readDocuments]]).
    */
  def readEmbeddings(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(embeddingsSchema)
      .parquet(StreamDirs.fileStreamDir(dir, "embeddings.parquet",
        "graft_embstream").toString)

  /** `baseline` is the stored corpus' canonical table (vec_id, cent_id,
    * canonical) the sink's deltas apply on top of; `query` is the
    * running stream.
    */
  final case class Incremental(baseline: DataFrame, query: StreamingQuery)

  /** Continuous incremental semantic dedup (see object doc). `sink`
    * receives one delta frame per micro-batch: (vec_id, cent_id,
    * canonical) for every NEW vector and every stored vector whose
    * canonical CHANGED; last-write-wins over baseline+deltas is the
    * live canonical table.
    *
    * Driver-held cross-batch state is three localCheckpointed frames:
    * assignments (grows with corpus — partitioned, never collected),
    * the duplicate-pair graph (dup density, not corpus size), and the
    * previous canonical table (for delta detection). All three truncate
    * lineage each batch, the [[DocStream.ingestPipeline]] discipline.
    */
  def semanticDedupIncremental(embStream: DataFrame, corpus: DataFrame,
                               nlist: Int = 0, iters: Int = 2,
                               tauNum: Int = 4, tauDen: Int = 10)
                              (sink: DataFrame => Unit): Incremental = {
    import graft.operators.{Dedup, Similarity}
    // the count only feeds nlist auto-sizing — callers with an explicit
    // nlist must not pay a full corpus scan at stream setup
    val sizedNlist =
      if (nlist > 0) nlist
      else math.max(1L,
        math.ceil(math.sqrt(corpus.count().toDouble)).toLong).toInt
    val cents = Similarity.trainCentroids(corpus, sizedNlist, iters)
      .localCheckpoint(true)

    def canonOf(assigned: DataFrame, edges: DataFrame): DataFrame =
      assigned.select(col("vec_id"), col("cent_id"))
        .join(Dedup.connectedComponents(edges)
          .withColumnRenamed("node", "vec_id"), Seq("vec_id"), "left")
        .select(col("vec_id"), col("cent_id"),
          coalesce(col("component"), col("vec_id")).as("canonical"))

    var assignedNow = Dedup.assignToCentroids(corpus, cents)
    var edgesNow = Dedup.embeddingPairs(assignedNow, tauNum, tauDen,
        blockCol = "cent_id")
      .select(col("v1").as("d1"), col("v2").as("d2"))
      .localCheckpoint(true)
    var canonNow = canonOf(assignedNow, edgesNow).localCheckpoint(true)
    val baseline = canonNow

    val query = embStream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val newAssigned = Dedup.assignToCentroids(
          batch.select(col("vec_id"), col("embedding")), cents)
        val newEdges = Dedup.embeddingPairs(newAssigned, tauNum, tauDen,
            blockCol = "cent_id")
          .select(col("v1").as("d1"), col("v2").as("d2"))
          .unionByName(Dedup.embeddingPairsAcross(newAssigned,
              assignedNow, tauNum, tauDen, blockCol = "cent_id")
            .select(col("v1").as("d1"), col("v2").as("d2")))
        edgesNow = edgesNow.unionByName(newEdges).localCheckpoint(true)
        assignedNow = assignedNow.unionByName(newAssigned)
          .localCheckpoint(true)
        val canonNext = canonOf(assignedNow, edgesNow)
          .localCheckpoint(true)
        val delta = canonNext
          .join(canonNow.select(col("vec_id"),
            col("canonical").as("prev")), Seq("vec_id"), "left")
          .filter(col("prev").isNull || col("prev") =!= col("canonical"))
          .select(col("vec_id"), col("cent_id"), col("canonical"))
        sink(delta)
        canonNow = canonNext
      }
      .start()
    Incremental(baseline, query)
  }
}
