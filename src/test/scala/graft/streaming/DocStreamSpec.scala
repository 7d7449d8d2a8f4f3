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
}
