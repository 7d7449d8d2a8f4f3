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

  def appendIncremental(stream: DataFrame, tableDir: String,
                        partCol: String, idCol: String): StreamingQuery =
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
        else if (!out.isEmpty) Iceberg.appendToTable(out, tableDir)
      }
      .start()
}
