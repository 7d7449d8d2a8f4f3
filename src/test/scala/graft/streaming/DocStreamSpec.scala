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
}
