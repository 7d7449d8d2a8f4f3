package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale validation for `DocStream.ingestPipeline`: runs the composed
  * streaming ingest (incremental dedup -> decontaminate -> append-only
  * pack) over a real corpus split into N day-batches, then recomputes
  * the same three stages in batch over the union and asserts the
  * manifests are IDENTICAL — the `DocStreamSpec` equivalence, executed
  * at benchmark scale instead of the 50-doc spec fixture.
  *
  * The spec proves the composition law; this proves the law survives
  * real data volume (state growth across micro-batches, checkpoint
  * lineage truncation, shard-offset carry at thousands of bins/shard).
  *
  * Usage: StreamScale <sfDir> [days=4] [corpusFrac=0.6]
  * Prints one JSON line: {"metric":"stream_manifest","rows":N,
  * "match":true|false,"stream_sec":...,"batch_sec":...}
  */
object StreamScale {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: StreamScale <sfDir> [days] [corpusFrac] | " +
        "StreamScale <sfDir> -emb [days] [compactEvery]")
    if (args.lift(1).contains("-emb")) {
      embDedup(args(0), args.lift(2).map(_.toInt).getOrElse(4),
        args.lift(3).map(_.toInt).getOrElse(0))
      return
    }
    if (args.lift(1).contains("-compact")) {
      compactDemo(args(0), args.lift(2).map(_.toInt).getOrElse(50))
      return
    }
    val sfDir = args(0)
    val days = if (args.length > 1) args(1).toInt else 4
    val corpusFrac = if (args.length > 2) args(2).toDouble else 0.6
    val spark = graft.engine.GraftSession.build("graft-streamscale",
      cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._

    val docs = graft.engine.Readers
      .table(spark, sfDir, "documents")
      .select("doc_id", "text", "lang", "source", "n_chars")
    val n = docs.count()
    val cut = (n * corpusFrac).toLong
    val corpus0 = docs.filter(col("doc_id") < cut).localCheckpoint(true)
    // eval set: a slice of the seed corpus, as in the spec — large
    // enough that decontamination really excises docs at this scale
    val evalSet = docs.filter(col("doc_id") < math.max(20L, n / 25))
      .localCheckpoint(true)
    val perDay = math.max(1L, (n - cut) / days)
    def day(i: Int): DataFrame = {
      val lo = cut + i * perDay
      val hi = if (i == days - 1) n else cut + (i + 1) * perDay
      docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
    }
    val shards = 8
    val budget = 4096L
    val minShared = 20L

    // ---- streaming: `days` micro-batches through ONE composed job ----
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String, String, Long)]
    val stream = mem.toDF()
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val manifests = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
    val t0 = System.nanoTime()
    val q = graft.streaming.DocStream.ingestPipeline(stream, corpus0,
        evalSet, shards = shards, budget = budget,
        minShared = minShared) { packed =>
      manifests.synchronized {
        manifests ++= packed
          .select("doc_id", "shard", "n_tok", "cum", "bin")
          .collect().map(_.toSeq)
      }
    }
    // per-batch wall: the state-carry regression detector — with the
    // append-only admissions store this must stay ~flat as batches
    // accumulate (the old full-corpus localCheckpoint grew linearly)
    val batchSecs = (0 until days).map { i =>
      val rows = day(i)
        .as[(Long, String, String, String, Long)].collect().toSeq
      val tb = System.nanoTime()
      mem.addData(rows: _*)
      q.processAllAvailable()
      (System.nanoTime() - tb) / 1e9
    }
    q.stop()
    val streamSec = (System.nanoTime() - t0) / 1e9

    // ---- batch recomputation: same stages, day-sequential admission ----
    val t1 = System.nanoTime()
    var corpusNow = corpus0
    var admitted: DataFrame = null
    (0 until days).foreach { i =>
      val adm = graft.operators.Dedup
        .incrementalDedup(day(i), corpusNow, minShared = minShared)
        .localCheckpoint(true)
      admitted = if (admitted == null) adm else admitted.unionByName(adm)
      corpusNow = corpusNow.unionByName(adm).localCheckpoint(true)
    }
    val flagged = graft.operators.Dedup
      .contamination(admitted, evalSet, minShared = minShared)
      .select("doc_id").distinct()
    val clean = admitted.join(flagged, Seq("doc_id"), "left_anti")
    val batchManifest = graft.operators.Curation.packShards(clean,
        col("doc_id"), size(split(col("text"), " ")),
        shards = shards, budget = budget)
      .select("doc_id", "shard", "n_tok", "cum", "bin")
      .collect().map(_.toSeq).toSet
    val batchSec = (System.nanoTime() - t1) / 1e9

    val streamSet = manifests.toSet
    val ok = streamSet == batchManifest && batchManifest.nonEmpty
    if (!ok) {
      val onlyS = streamSet -- batchManifest
      val onlyB = batchManifest -- streamSet
      System.err.println(s"[streamscale] stream-only=${onlyS.size} " +
        s"batch-only=${onlyB.size} sampleS=${onlyS.take(3)} " +
        s"sampleB=${onlyB.take(3)}")
    }
    def f1(v: Double) = "%.1f".formatLocal(java.util.Locale.ROOT, v)
    spark.stop()
    println(s"""{"metric":"stream_manifest","rows":${batchManifest.size},""" +
      s""""days":$days,"match":$ok,"stream_sec":${f1(streamSec)},""" +
      s""""batch_sec":${f1(batchSec)},""" +
      s""""per_batch_sec":[${batchSecs.map(f1).mkString(",")}],""" +
      s""""sf":"$sfDir"}""")
    if (!ok) sys.exit(1)
  }

  /** Scale cost of admission-store COMPACTION
    * (`DocStream.compactAdmissions`): a long-running daily ingest
    * accumulates one parquet generation per batch, so every later
    * batch pays a growing multi-path listing + small-file scan.
    * This runs `days` day-batches against a durable stateDir
    * (measuring per-batch wall as generations accumulate), then
    * stops the query, compacts, restarts, and feeds 3 more batches —
    * the post-compact per-batch wall should fall back to the
    * few-generation regime, and the admissions SET (every future
    * dedup decision) must be invariant. Usage:
    *   StreamScale <sfDir> -compact [days=50]
    */
  def compactDemo(sfDir: String, days: Int): Unit = {
    val spark = graft.engine.GraftSession.build("graft-streamscale",
      cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.engine.Readers.table(spark, sfDir, "documents")
      .select("doc_id", "text", "lang", "source", "n_chars")
    val n = docs.count()
    val cut = (n * 0.4).toLong
    val corpus0 = docs.filter(col("doc_id") < cut).localCheckpoint(true)
    val evalSet = docs.filter(col("doc_id") < math.max(20L, n / 25))
      .localCheckpoint(true)
    val slices = days + 3
    val perDay = math.max(1L, (n - cut) / slices)
    def day(i: Int): DataFrame = {
      val lo = cut + i * perDay
      val hi = if (i == slices - 1) n else cut + (i + 1) * perDay
      docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
    }
    val state = java.nio.file.Files
      .createTempDirectory("graft_streamscale_compact").toString
    def runDays(ids: Range): Seq[Double] = {
      val mem = MemoryStream[(Long, String, String, String, Long)]
      val stream = mem.toDF()
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      val q = graft.streaming.DocStream.ingestPipeline(stream, corpus0,
          evalSet, shards = 8, budget = 4096L, minShared = 20,
          stateDir = Some(state)) { packed => packed.count(); () }
      val walls = ids.map { i =>
        val rows = day(i)
          .as[(Long, String, String, String, Long)].collect().toSeq
        val tb = System.nanoTime()
        mem.addData(rows: _*)
        q.processAllAvailable()
        (System.nanoTime() - tb) / 1e9
      }
      q.stop()
      walls
    }
    def gens(): Seq[String] = graft.streaming.GenStore
      .committed(java.nio.file.Paths.get(state)).map(_.toString)
    def admissionsSet(): Set[Long] = {
      val g = gens()
      if (g.isEmpty) Set.empty
      else spark.read
        .schema(graft.streaming.DocStream.documentsSchema)
        .parquet(g: _*).select("doc_id").as[Long].collect().toSet
    }
    val pre = runDays(0 until days)
    val gensBefore = gens().size
    val before = admissionsSet()
    val t0 = System.nanoTime()
    val folded = graft.streaming.DocStream.compactAdmissions(spark, state)
    val compactSec = (System.nanoTime() - t0) / 1e9
    val invariant = admissionsSet() == before
    val post = runDays(days until slices)
    def f2(v: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    spark.stop()
    println(s"""{"metric":"ingest_compact","days":$days,""" +
      s""""gens_before":$gensBefore,"gens_after_compact":1,""" +
      s""""folded_rows":$folded,"admissions_invariant":$invariant,""" +
      s""""compact_sec":${f2(compactSec)},""" +
      s""""per_batch_first3":[${pre.take(3).map(f2).mkString(",")}],""" +
      s""""per_batch_last3":[${pre.takeRight(3).map(f2).mkString(",")}],""" +
      s""""per_batch_post_compact":[${post.map(f2).mkString(",")}],""" +
      s""""sf":"$sfDir"}""")
    if (!invariant) sys.exit(1)
  }

  /** Scale validation for `EmbStream.semanticDedupIncremental`: half the
    * embeddings table is the stored corpus (frozen quantizer), the rest
    * streams in as `days` shards; asserts baseline+deltas
    * (last-write-wins) equals batch `semanticDedupWith` over the union
    * on the same centroids — the `EmbStreamSpec` law at benchmark scale
    * (state growth across batches, re-closure over the accumulated dup
    * graph, delta detection against a corpus-sized canonical table).
    */
  def embDedup(sfDir: String, days: Int, compactEvery: Int = 0): Unit = {
    val spark = graft.engine.GraftSession.build("graft-streamscale-emb",
      cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._
    val all = graft.engine.Readers.table(spark, sfDir, "embeddings")
      .select("vec_id", "embedding", "label").localCheckpoint(true)
    val n = all.count()
    val cut = n / 2
    val corpus = all.filter(col("vec_id") < cut).localCheckpoint(true)
    val nlist = math.max(1L,
      math.ceil(math.sqrt(cut.toDouble)).toLong).toInt

    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Array[Float], Int)]
    val stream = mem.toDF().toDF("vec_id", "embedding", "label")
    val deltas =
      scala.collection.mutable.ArrayBuffer.empty[Array[(Long, Long, Long)]]
    val t0 = System.nanoTime()
    val inc = graft.streaming.EmbStream.semanticDedupIncremental(
        stream, corpus, nlist = nlist) { d =>
      deltas.synchronized {
        deltas += d.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      }
    }
    val perDay = math.max(1L, (n - cut) / days)
    // (rewrittenRows, wallSec) per compaction, when compactEvery > 0 —
    // the LSM step runs between micro-batches (quiescent by contract)
    val compacts =
      scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    val embBatchSecs = (0 until days).map { i =>
      val lo = cut + i * perDay
      val hi = if (i == days - 1) n else math.min(n, lo + perDay)
      val rows = all.filter(col("vec_id") >= lo && col("vec_id") < hi)
        .as[(Long, Array[Float], Int)].collect().toSeq
      val tb = System.nanoTime()
      mem.addData(rows: _*)
      inc.query.processAllAvailable()
      val sec = (System.nanoTime() - tb) / 1e9
      if (compactEvery > 0 && (i + 1) % compactEvery == 0 &&
          i != days - 1) {
        val tc = System.nanoTime()
        val nrw = inc.compact()
        compacts += ((nrw, (System.nanoTime() - tc) / 1e9))
      }
      sec
    }
    inc.query.stop()
    val streamSec = (System.nanoTime() - t0) / 1e9
    val got = {
      val base = inc.baseline.collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      deltas.flatten.foldLeft(base) { case (m, (v, c, cn)) =>
        m.updated(v, (c, cn))
      }
    }
    val t1 = System.nanoTime()
    val cents = graft.operators.Similarity.trainCentroids(corpus, nlist, 2)
    val want = graft.operators.Dedup.semanticDedupWith(all, cents)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val batchSec = (System.nanoTime() - t1) / 1e9
    val ok = got == want && want.nonEmpty
    if (!ok) {
      val diff = (got.toSet diff want.toSet) ++ (want.toSet diff got.toSet)
      System.err.println(s"[streamscale-emb] mismatch rows=${diff.size} " +
        s"sample=${diff.take(3)}")
    }
    val merged = want.count { case (v, (_, c)) => v != c }
    def f1(v: Double) = "%.1f".formatLocal(java.util.Locale.ROOT, v)
    spark.stop()
    val compactJson =
      if (compacts.isEmpty) ""
      else s""""compactions":[${compacts.map { case (r, s) =>
        s"""[$r,${f1(s)}]""" }.mkString(",")}],"""
    println(s"""{"metric":"stream_embdedup","rows":${want.size},""" +
      s""""merged":$merged,"days":$days,"match":$ok,""" +
      s""""stream_sec":${f1(streamSec)},"batch_sec":${f1(batchSec)},""" +
      s""""per_batch_sec":[${embBatchSecs.map(f1).mkString(",")}],""" +
      compactJson +
      s""""sf":"$sfDir"}""")
    if (!ok) sys.exit(1)
  }
}
