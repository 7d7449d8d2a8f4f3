package graft.tools

import org.apache.spark.sql.functions._

/** Duplication-stress CLI (the PLANS.md scaling table): replicate the
  * documents corpus N times with shifted doc_ids (every original doc
  * becomes an N-clique of exact duplicates) and time the near-dup /
  * decontamination operators on the inflated corpus. Usage:
  *   scripts/run.sh graft.tools.Stress <sfDir> <replication>
  */
object Stress {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rep = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = graft.engine.GraftSession.build("graft-stress",
      cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val dup = (0 until rep)
      .map(i => docs.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
        col("text")))
      .reduce(_ unionAll _)
      .repartition(spark.sparkContext.defaultParallelism)
      .localCheckpoint(true) // timings exclude the read/replicate cost
    println(s"corpus: ${dup.count()} docs (${rep}x)")
    val evalSet = docs.filter(col("doc_id") < 20).localCheckpoint(true)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($rows rows)")
    }
    import graft.operators.{Dedup, TextAnalysis}
    time("contamination")(Dedup.contamination(dup, evalSet).count())
    time("minhash_pairs")(Dedup.minhashPairs(dup, tau = 0.3).count())
    time("simhash_pairs")(Dedup.simhashPairs(dup).count())
    time("containment_pairs")(Dedup.containmentPairs(dup, tau = 0.5).count())
    // CDC family: chunking is per-doc (linear in corpus); the shared-
    // chunk census and the boilerplate anti-gate see the duplicated
    // chunks collapse into fewer, hotter groups
    time("cdc_shared_chunks")(TextAnalysis.cdcChunks(dup)
      .groupBy(col("chunk")).agg(count_distinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2).count())
    time("strip_boilerplate")(
      TextAnalysis.stripBoilerplate(dup, minDocs = 3).count())
    // the documented composition: exact-hash dedup FIRST collapses the
    // duplicate flood, then template excision sees real df counts
    time("dedup+boilerplate")({
      val canon = dup.groupBy(col("text"))
        .agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id"), col("text"))
      TextAnalysis.stripBoilerplate(canon, minDocs = 3)
        .filter(length(col("clean_text")) > 0).count()
    })
    spark.stop()
  }
}
