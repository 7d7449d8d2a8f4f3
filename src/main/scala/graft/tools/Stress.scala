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
    val spark = graft.engine.GraftSession.build("graft-stress",
      cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    if (args.lift(1).contains("-lshsweep")) {
      lshBitsSweep(spark, sfDir); spark.stop(); return
    }
    if (args.lift(1).contains("-postcap")) {
      postingCap(spark, sfDir, args.lift(2).map(_.toInt).getOrElse(2000))
      spark.stop(); return
    }
    if (args.lift(1).contains("-semdedup")) {
      semDedup(spark, sfDir, args.lift(2).map(_.toInt).getOrElse(0))
      spark.stop(); return
    }
    if (args.lift(1).contains("-semdedup2")) {
      semDedup2(spark, sfDir,
        args.lift(2).map(_.split(",").toSeq.map(_.toInt)).getOrElse(Seq(2)),
        skipExact = args.contains("only2"))
      spark.stop(); return
    }
    if (args.lift(1).contains("-blocklist")) {
      blocklist(spark, sfDir)
      spark.stop(); return
    }
    if (args.lift(1).contains("-audit")) {
      audit(spark, sfDir)
      spark.stop(); return
    }
    if (args.lift(1).contains("-quantile")) {
      quantile(spark, sfDir, args.lift(2).map(_.toLong))
      spark.stop(); return
    }
    if (args.lift(1).contains("-gif")) {
      gif(spark, sfDir)
      spark.stop(); return
    }
    if (args.lift(1).contains("-entity")) {
      entity(spark, sfDir)
      spark.stop(); return
    }
    if (args.lift(1).contains("-unigram")) {
      unigram(spark, sfDir)
      spark.stop(); return
    }
    if (args.lift(1).contains("-tokencjk")) {
      tokenCjk(spark, sfDir)
      spark.stop(); return
    }
    if (args.lift(1).contains("-wordpiece")) {
      wordpiece(spark, sfDir,
        args.lift(2).flatMap(_.toIntOption).getOrElse(10))
      spark.stop(); return
    }
    if (args.lift(1).contains("-zorder")) {
      zorder(spark, sfDir)
      spark.stop(); return
    }
    if (args.lift(1).contains("-png")) {
      png(spark, sfDir)
      spark.stop(); return
    }
    if (args.lift(1).contains("-dhash")) {
      dhash(spark, sfDir)
      spark.stop(); return
    }
    if (args.lift(1).contains("-semtiers")) {
      semTiers(spark, sfDir)
      spark.stop(); return
    }
    if (args.lift(1).contains("-ccdense")) {
      // both trailing args are independently optional: a numeric arg 2
      // is nEdges, a non-numeric one is the arm selector
      val nEdges = args.lift(2).flatMap(_.toLongOption)
      val arm = if (nEdges.isEmpty) args.lift(2) else args.lift(3)
      ccDense(spark, nEdges.getOrElse(40000000L), arm)
      spark.stop(); return
    }
    if (args.lift(1).contains("-pagerank")) {
      val nNodes = args.lift(2).flatMap(_.toLongOption).getOrElse(2000000L)
      val k = args.lift(3).flatMap(_.toIntOption).getOrElse(6)
      val arm = args.lift(4).orElse(
        args.lift(3).filter(_.toIntOption.isEmpty)).orElse(
        args.lift(2).filter(_.toLongOption.isEmpty))
      pagerankStress(spark, nNodes, k, arm)
      spark.stop(); return
    }
    if (args.lift(1).contains("-cellprofile")) {
      cellProfile(spark, sfDir)
      spark.stop(); return
    }
    if (args.lift(1).contains("-kcenter")) {
      kcenter(spark, sfDir, args.lift(2).map(_.toInt).getOrElse(8))
      spark.stop(); return
    }
    if (args.lift(1).contains("-annidx")) {
      annIdx(spark, sfDir)
      spark.stop(); return
    }
    val rep = args.lift(1).map(_.toInt).getOrElse(8)
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
    // span excision joins each POSTING to its gram's min-holder row —
    // per-posting fan-out is exactly 1, so an N-clique duplicate flood
    // costs O(N * tokens), never the O(N^2) a pair enumeration pays on
    // the same corpus (the property that makes it the safe first pass
    // on boilerplate-heavy crawls)
    time("span_excise")(Dedup.exciseDuplicateSpans(dup, l = 8)
      .filter(col("n_removed") > 0).count())
    time("span_decontam")(Dedup.exciseSeenSpans(dup, evalSet, l = 8)
      .filter(col("n_removed") > 0).count())
    // the documented composition: exact-hash dedup FIRST collapses the
    // duplicate flood, then template excision sees real df counts
    time("dedup+boilerplate")({
      val canon = dup.groupBy(col("text"))
        .agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id"), col("text"))
      TextAnalysis.stripBoilerplate(canon, minDocs = 3)
        .filter(length(col("clean_text")) > 0).count()
    })
    lshSkewStress(spark, nVec = 40000, hotFrac = 10)
    spark.stop()
  }

  /** The production banding knob, measured: at a FIXED bits/bands the
    * per-bucket occupancy grows with the corpus and candidates grow
    * ~n²/buckets — the super-linear term the sf3 bench exposes on the
    * embedding-LSH family. bits must grow with the corpus
    * (bits ≈ log2(n / targetBucket)); this sweep pins time AND output
    * rows per bits setting so the recall/cost trade is explicit.
    * Usage: scripts/run.sh graft.tools.Stress <sfDir> -lshsweep
    */
  /** Probe of the ubiquitous-shingle cap against a vocabulary-saturated
    * corpus. MEASURED NEGATIVE RESULT (sf10 driver-shape, 500k docs):
    * caps of 2000 AND 200 both still exhaust ~70 GB of shuffle disk —
    * on a corpus whose whole df distribution is elevated (31-word
    * vocabulary: average char-16-gram df ≈ 5000), even the sub-cap
    * "rare" grams collectively enumerate ~1e10 candidate pairs
    * (~1M grams x df² ≈ 1e4). The cap defends against SKEW (a few
    * ubiquitous shingles on an otherwise sparse corpus); it cannot
    * rescue uniform saturation, which violates the sparsity premise of
    * every inverted-index near-dup method. Production path on such
    * data is the bounded-signature sketch family — minhashPairs
    * (49.5 s at the same sf10, linear), simhash, or embedding LSH.
    * Usage: Stress <sfDir> -postcap [cap=2000]
    */
  def postingCap(spark: org.apache.spark.sql.SparkSession,
                 sfDir: String, cap: Int): Unit = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    println(s"corpus: ${docs.count()} docs, charJaccardPairs k=16 " +
      s"tau=0.8 maxPostings=$cap")
    val t0 = System.nanoTime()
    val rows = graft.operators.Dedup
      .charJaccardPairs(docs, tau = 0.8, k = 16, maxPostings = cap)
      .count()
    println(f"postcap_chargram       ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($rows rows)")
  }

  /** SemDeDup at scale through the DEFAULT entry point — corpus-sized
    * nlist (0 = auto = ceil(sqrt(n))), and since r9 the corpus-count
    * regime switch: past [[graft.operators.Dedup.SemanticTwoLevelVectors]]
    * the call auto-routes to the two-level quantizer, so this tool now
    * measures what a user actually gets at 200k vectors (r8: the forced
    * single-level path spilled — 125 s warm / 899 s cold).
    * Usage: Stress <sfDir> -semdedup [nlist=0]
    */
  def semDedup(spark: org.apache.spark.sql.SparkSession,
               sfDir: String, nlist: Int): Unit = {
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .localCheckpoint(true)
    val n = embs.count()
    val resolved = if (nlist > 0) nlist
      else math.max(1L, math.ceil(math.sqrt(n.toDouble)).toLong).toInt
    println(s"vectors: $n  nlist=$resolved" +
      (if (nlist == 0) " (auto)" else ""))
    for (rep <- 1 to 2) {
      val t0 = System.nanoTime()
      // ONE evaluation of the DAG (checkpoint), both counts from cache —
      // the semDedup2 measurement discipline
      val out = graft.operators.Dedup
        .semanticDedup(embs, nlist = nlist, n = n).localCheckpoint(true)
      val rows = out.count()
      val merged = out.filter(col("canonical") =!= col("vec_id")).count()
      println(f"semdedup rep$rep         ${(System.nanoTime() - t0) / 1e9}%7.2f s" +
        f"  ($rows rows, $merged merged)")
    }
  }

  /** Two-level (coarse x fine) SemDeDup vs the single-level operator on
    * the same corpus: wall time, merged counts (recall proxy — single-
    * level is the exact-within-cell reference), and canonical-map
    * agreement. `nprobes` sweeps the probe knob against ONE single-level
    * reference run (the r8 form re-ran the expensive exact reference per
    * nprobe point). Usage: Stress <sfDir> -semdedup2 [np1,np2,...] [only2]
    */
  def semDedup2(spark: org.apache.spark.sql.SparkSession,
                sfDir: String, nprobes: Seq[Int] = Seq(2),
                skipExact: Boolean = false): Unit = {
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .localCheckpoint(true)
    val n = embs.count()
    println(s"vectors: $n  nprobes=${nprobes.mkString(",")}")
    def run(name: String)(f: => org.apache.spark.sql.DataFrame): Long = {
      var merged = 0L
      for (rep <- 1 to 2) {
        val t0 = System.nanoTime()
        val out = f.localCheckpoint(true)
        merged = out.filter(col("canonical") =!= col("vec_id")).count()
        println(f"$name rep$rep      ${(System.nanoTime() - t0) / 1e9}%7.2f s" +
          f"  ($merged merged)")
      }
      merged
    }
    // the single-level reference must stay the EXACT path — disable
    // the corpus-count auto-route so recall is measured against it
    val m1 = if (skipExact) 0L else run("single-level")(
      graft.operators.Dedup.semanticDedup(embs, n = n,
        autoTwoLevel = Long.MaxValue))
    for (np <- nprobes) {
      val m2 = run(f"two-level np=$np%-2d")(
        graft.operators.Dedup.semanticDedupTwoLevel(embs, n = n,
          nprobe = np))
      if (!skipExact)
        println(f"nprobe=$np merge recall vs single-level: " +
          f"${m2.toDouble / math.max(m1, 1)}%.4f")
    }
  }

  /** Dense-merge-graph connected components: star-only vs
    * spanning-forest contraction on the same synthetic graph — the
    * topology a heavily-duplicated corpus produces (edges >> nodes,
    * most nodes in a few big components). nEdges edges over 2M nodes
    * in 1000 planted components (node % 1000); both arms must produce
    * the identical labeling (count + XOR checksum compared).
    * Usage: Stress <sfDir> -ccdense [nEdges] [star|cdriver|cstar]
    * With no arm selector all three run in one JVM (cross-checks the
    * checksums but run order confounds timings — later arms are
    * JIT-warm); pass an arm for fresh-JVM honest timing.
    */
  /** PageRank regime stress: a deterministic kNN-shaped graph (every
    * node emits k pseudo-random edges — the out-degree profile
    * Similarity.knnGraph produces) at a chosen node count, ranked by
    * both regimes. With no arm selector both run in one JVM and the
    * quantized-checksum equality is asserted (the GraphSpec boundary
    * law at scale); pass `driver`/`join` for fresh-JVM honest timing.
    * Usage: Stress <sfDir> -pagerank [nNodes] [k] [driver|join]
    */
  def pagerankStress(spark: org.apache.spark.sql.SparkSession,
                     nNodes: Long, k: Int,
                     arm: Option[String] = None): Unit = {
    import org.apache.spark.sql.functions._
    import graft.operators.Graph
    val edges = spark.range(nNodes * k).select(
        (col("id") / k).cast("long").as("src"),
        pmod(xxhash64(col("id"), lit(7)), lit(nNodes)).as("dst"))
      .localCheckpoint(true)
    println(s"graph: ${edges.count()} edges, $nNodes nodes, outdeg=$k")
    def run(name: String, limit: Long): Long = {
      val t0 = System.nanoTime()
      val out = Graph.pageRank(edges, iters = 10, driverNodeLimit = limit)
      val r = out.agg(count(lit(1)), expr(
        "bit_xor(xxhash64(id, CAST(pr * 1000000000.0 AS LONG)))")).head()
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%8.1f s  " +
        s"rows=${r.getLong(0)} chk=${r.getLong(1)}")
      r.getLong(1)
    }
    arm match {
      case Some("driver") => run("broadcast-rank", Long.MaxValue)
      case Some("join")   => run("join-path", 0L)
      case Some(other) =>
        sys.error(s"unknown -pagerank arm '$other' (driver|join)")
      case None =>
        val a = run("broadcast-rank", Long.MaxValue)
        val b = run("join-path", 0L)
        require(a == b, "regimes diverged: ranks must be bit-identical")
    }
  }

  def ccDense(spark: org.apache.spark.sql.SparkSession,
              nEdges: Long, arm: Option[String] = None): Unit = {
    import org.apache.spark.sql.functions._
    import graft.operators.Dedup
    val nNodes = 2000000L
    val comps = 1000L
    val stride = nNodes / comps
    val edges = spark.range(nEdges).select(
        (pmod(xxhash64(col("id"), lit(1)), lit(stride)) * comps +
          pmod(col("id"), lit(comps))).as("d1"),
        (pmod(xxhash64(col("id"), lit(2)), lit(stride)) * comps +
          pmod(col("id"), lit(comps))).as("d2"))
      .localCheckpoint(true)
    println(s"graph: ${edges.count()} raw edges, $nNodes nodes, " +
      s"$comps planted components")
    def run(name: String, contraction: Boolean, threshold: Long): Long = {
      val t0 = System.nanoTime()
      val out = Dedup.connectedComponents(edges,
        smallGraphThreshold = threshold, contraction = contraction)
      val r = out.agg(count(lit(1)),
        expr("bit_xor(xxhash64(node, component))")).head()
      val chk = r.getLong(1)
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%8.1f s  " +
        s"rows=${r.getLong(0)} chk=$chk")
      chk
    }
    arm match {
      case Some("star") =>
        run("star-only", contraction = false, threshold = 4000000L)
      case Some("cdriver") =>
        run("contract+driver", contraction = true, threshold = 4000000L)
      case Some("cstar") =>
        run("contract+star", contraction = true, threshold = 100000L)
      case Some(other) =>
        sys.error(s"unknown -ccdense arm '$other' (star|cdriver|cstar)")
      case None =>
        // star-only baseline: large/small-star rounds on the full edges
        val a = run("star-only", contraction = false, threshold = 4000000L)
        // contraction -> forest (~nNodes edges) -> driver union-find
        val b = run("contract+driver", contraction = true,
          threshold = 4000000L)
        // contraction floor below forest size -> star loop on the forest
        val c = run("contract+star", contraction = true, threshold = 100000L)
        require(a == b && b == c, "labelings diverged across paths")
    }
  }

  /** A/B for the persisted ANN index: inline IVF/PQ (which re-derive
    * the cell assignment / code table on EVERY query) vs build-once +
    * query-many against the stored artifacts. The expected shape: the
    * indexed query drops to probe + pruned-cell scan (IVF) / code-table
    * scan (PQ) — the build cost amortizes across queries, which is the
    * production ANN serving model. Usage: Stress <sfDir> -annidx
    */
  def annIdx(spark: org.apache.spark.sql.SparkSession,
             sfDir: String): Unit = {
    import graft.operators.Similarity
    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-16s ${(System.nanoTime() - t0) / 1e9}%8.2f s" +
        (if (n >= 0) s"  ($n rows)" else ""))
    }
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .localCheckpoint(true)
    println(s"corpus: ${embs.count()} vectors")
    val queries = embs.filter(col("vec_id") < 10).localCheckpoint(true)
    for (i <- 1 to 3)
      timed(s"ivf_inline_$i") {
        Similarity.ivfTopK(queries, embs, k = 5, nlist = 64,
          nprobe = 8).count()
      }
    val ivfPath = java.nio.file.Files
      .createTempDirectory("graft_stress_ivfidx").toString
    timed("ivf_build") {
      Similarity.buildIvfIndex(embs, ivfPath, nlist = 64); -1L
    }
    for (i <- 1 to 3)
      timed(s"ivf_indexed_$i") {
        Similarity.ivfTopKIndexed(queries, ivfPath, k = 5,
          nprobe = 8).count()
      }
    for (i <- 1 to 3)
      timed(s"pq_inline_$i") {
        Similarity.pqTopK(queries, embs, k = 5).count()
      }
    val pqPath = java.nio.file.Files
      .createTempDirectory("graft_stress_pqidx").toString
    timed("pq_build") { Similarity.buildPqIndex(embs, pqPath); -1L }
    for (i <- 1 to 3)
      timed(s"pq_indexed_$i") {
        Similarity.pqTopKIndexed(queries, pqPath, k = 5).count()
      }
    for (i <- 1 to 3)
      timed(s"sq_inline_$i") {
        Similarity.sqTopK(queries, embs, k = 5).count()
      }
    val sqPath = java.nio.file.Files
      .createTempDirectory("graft_stress_sqidx").toString
    timed("sq_build") { Similarity.buildSqIndex(embs, sqPath); -1L }
    for (i <- 1 to 3)
      timed(s"sq_indexed_$i") {
        Similarity.sqTopKIndexed(queries, sqPath, k = 5).count()
      }
  }

  /** Wall-clock per TIER of the semantic-dedup pipeline, isolating
    * which tier owns a scale jump: sampled training, single-level
    * assignment (structural stand-in for the two-level assignment),
    * the in-cell pair gate, and component closure.
    * Usage: Stress <sfDir> -semtiers
    */
  def semTiers(spark: org.apache.spark.sql.SparkSession,
               sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    import graft.operators.{Dedup, Similarity}
    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-10s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
      r
    }
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .localCheckpoint(true)
    val n = embs.count()
    val nlist = math.ceil(math.sqrt(n.toDouble)).toInt
    val m = Dedup.SemanticSampleFactor * nlist
    println(s"n=$n nlist=$nlist sample=$m")
    val sample = timed("sample") {
      embs.orderBy(col("vec_id")).limit(m)
        .repartition(spark.sparkContext.defaultParallelism)
        .localCheckpoint(true)
    }
    val cents = timed("train") {
      Similarity.trainCentroids(sample, nlist, 2).localCheckpoint(true)
    }
    val assigned = timed("assign") {
      Dedup.assignToCentroids(embs, cents)
    }
    import graft.functions.VectorFunctions.quantize
    import graft.plans.{LongArrayDot, QCosineGateExpr}
    val withV = timed("prep") {
      assigned
        .select(col("vec_id"), col("cent_id"),
          quantize(col("embedding")).as("qv"))
        .withColumn("qn", LongArrayDot(col("qv"), col("qv")))
        .localCheckpoint(true)
    }
    val edges = timed("pairs") {
      withV.select(col("cent_id"), col("vec_id").as("v1"),
          col("qv").as("qv1"), col("qn").as("qn1"))
        .join(withV.select(col("cent_id"), col("vec_id").as("v2"),
          col("qv").as("qv2"), col("qn").as("qn2")), Seq("cent_id"))
        .filter(col("v1") < col("v2"))
        .filter(QCosineGateExpr(col("qv1"), col("qv2"),
          col("qn1"), col("qn2"), 4, 10))
        .select(col("v1").as("a"), col("v2").as("b"))
        .localCheckpoint(true)
    }
    println(s"edges=${edges.count()}")
    timed("closure") {
      Dedup.connectedComponents(
          edges.select(col("a").as("d1"), col("b").as("d2")))
        .count()
    }
  }

  /** Two-level assignment cell-occupancy profile: where does the
    * in-cell pair work concentrate? Prints cell-count percentiles, the
    * max cell, and the Σ cell² pair-work share of the top cells — the
    * straggler diagnostic for the pair-gate stage.
    * Usage: Stress <sfDir> -cellprofile
    */
  def cellProfile(spark: org.apache.spark.sql.SparkSession,
                  sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    // stage attribution: which stage owns the wall at this scale
    final case class StageRow(id: Int, name: String, runMs: Long,
                              tasks: Int)
    val stages =
      new java.util.concurrent.ConcurrentLinkedQueue[StageRow]()
    // AQE materializes every exchange through a thread-pool job whose
    // own stack is CompletableFuture plumbing — but the job PROPERTIES
    // are captured from the submitting thread, so callSite.short still
    // names the user-level action that owns the stage. Map stage ids to
    // it at job start.
    val stageSite = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val p = Option(j.properties)
          val site = p.flatMap(x => Option(x.getProperty("spark.job.description")))
            .orElse(p.flatMap(x => Option(x.getProperty("callSite.short"))))
          site.foreach(s => j.stageIds.foreach(id => stageSite.put(id, s)))
        }
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          val m = s.stageInfo.taskMetrics
          val site = stageSite.getOrDefault(s.stageInfo.stageId,
            s.stageInfo.name.linesIterator.next().trim)
          if (m != null) stages.add(StageRow(s.stageInfo.stageId,
            site, m.executorRunTime, s.stageInfo.numTasks))
        }
      })
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .localCheckpoint(true)
    val n = embs.count()
    val t0 = System.nanoTime()
    val out = graft.operators.Dedup.semanticDedupTwoLevel(embs, n = n)
      .localCheckpoint(true)
    println(f"semdedup2 wall ${(System.nanoTime() - t0) / 1e9}%.1f s")
    import scala.jdk.CollectionConverters._
    stages.asScala.toSeq.sortBy(-_.runMs).take(10).foreach { st =>
      println(f"stage ${st.id}%4d  ${st.runMs / 1000.0}%8.1f cpu-s  " +
        f"tasks=${st.tasks}%-4d ${st.name.take(90)}")
    }
    val cells = out.groupBy(col("cent_id")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    // closure-tier inputs: gated edge volume (re-derived from the
    // output cells — Σc² gates, one extra job) and component census
    val withV = out.join(embs, Seq("vec_id"))
      .select(col("vec_id"), col("cent_id"),
        graft.functions.VectorFunctions.quantize(col("embedding"))
          .as("qv"))
      .withColumn("qn", graft.plans.LongArrayDot(col("qv"), col("qv")))
      .localCheckpoint(true)
    val e1 = withV.select(col("cent_id"), col("vec_id").as("v1"),
      col("qv").as("qv1"), col("qn").as("qn1"))
    val e2 = withV.select(col("cent_id"), col("vec_id").as("v2"),
      col("qv").as("qv2"), col("qn").as("qn2"))
    val nEdges = e1.join(e2, Seq("cent_id"))
      .filter(col("v1") < col("v2"))
      .filter(graft.plans.QCosineGateExpr(col("qv1"), col("qv2"),
        col("qn1"), col("qn2"), 4, 10))
      .count()
    val nComp = out.filter(col("canonical") =!= col("vec_id"))
      .select(col("canonical")).distinct().count()
    println(s"edges=$nEdges merged_components=$nComp")
    val stats = cells.agg(count(lit(1)).as("ncells"), max(col("c")),
      expr("approx_percentile(c, array(0.5, 0.9, 0.99))"),
      sum(col("c") * col("c")).as("sum_c2")).collect()(0)
    val top = cells.orderBy(col("c").desc).limit(10)
      .collect().map(_.getLong(1))
    println(s"n=$n cells=${stats.getLong(0)} max=${stats.getLong(1)} " +
      s"p50/p90/p99=${stats.getSeq[Long](2).mkString("/")} " +
      s"sum_c2=${stats.getLong(3)} top10=${top.mkString(",")}")
  }

  /** k-Center greedy wall time at scale: k linear passes + k 1-row
    * collects — the expectation is k × assignment-scan-rate, flat in k
    * per pass. Usage: Stress <sfDir> -kcenter [k]
    */
  def kcenter(spark: org.apache.spark.sql.SparkSession,
              sfDir: String, k: Int): Unit = {
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .localCheckpoint(true)
    println(s"vectors: ${embs.count()}  k=$k")
    for (rep <- 1 to 2) {
      val t0 = System.nanoTime()
      val out = graft.operators.Similarity.kCenterSelect(embs, k).collect()
      println(f"kcenter k=$k rep$rep   ${(System.nanoTime() - t0) / 1e9}%7.2f s" +
        f"  (last radius2=${out.last.getLong(2)})")
    }
  }

  /** Blocklist screen wall time at scale — a narrow codegen'd map, so
    * the expectation is scan-rate. Usage: Stress <sfDir> -blocklist
    */
  def blocklist(spark: org.apache.spark.sql.SparkSession,
                sfDir: String): Unit = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .localCheckpoint(true)
    println(s"docs: ${docs.count()}")
    for (rep <- 1 to 2) {
      val t0 = System.nanoTime()
      val kept = graft.operators.TextAnalysis.blocklistScreen(docs,
          Seq("dup", "slow", "low", "scan batch"), maxHits = 2L)
        .filter(col("keep") === 1).count()
      println(f"blocklist rep$rep        ${(System.nanoTime() - t0) / 1e9}%7.2f s" +
        f"  ($kept kept)")
    }
  }

  /** Scale walls for the round-9 audit/snapshot operators: the full
    * q_curation_audit rule battery + auditSummary, and snapshotDedup
    * over the two-dump crawl simulation (2n fetches). Both are
    * one-shuffle slim-row pipelines — expected scan-rate/linear.
    */
  def audit(spark: org.apache.spark.sql.SparkSession,
            sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .localCheckpoint(true)
    println(s"docs: ${docs.count()}")
    // the ONE rule battery / crawl simulation (shared with the
    // oracle-gated queries, so the bench measures the shipped shape)
    val rules = graft.SparkEntry.auditRules
    for (rep <- 1 to 2) {
      var t0 = System.nanoTime()
      val aud = graft.operators.Curation.curationAudit(
        docs, col("doc_id"), col("text"), rules)
      val kept = aud.filter(col("kept") === 1).count()
      println(f"audit rep$rep       ${(System.nanoTime() - t0) / 1e9}%7.2f s" +
        f"  ($kept kept)")
      t0 = System.nanoTime()
      val solo = graft.operators.Curation.auditSummary(aud)
        .agg(sum(col("n_solo"))).collect()(0).getLong(0)
      println(f"audit+summary rep$rep ${(System.nanoTime() - t0) / 1e9}%5.2f s" +
        f"  ($solo solo-dropped)")
      t0 = System.nanoTime()
      val crawl = graft.SparkEntry.simulatedCrawl(docs)
      val rows = graft.operators.Dedup.snapshotDedup(crawl, col("url"),
        col("snap"), col("text"), col("fetch_id")).count()
      println(f"snapshot rep$rep    ${(System.nanoTime() - t0) / 1e9}%7.2f s" +
        f"  ($rows versions kept)")
    }
  }

  /** Blocked entity resolution at corpus scale: the q_entity_dedup
    * shape (substr-16 blocking on customer names, Levenshtein <= 1,
    * CC). Work = sum over blocks of |b|^2 Levenshtein gates + the
    * merge-graph CC — the blocking key bounds the quadratic.
    */
  def entity(spark: org.apache.spark.sql.SparkSession,
             sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      .localCheckpoint(true)
    println(s"customers: ${cust.count()}")
    // A/B: the r10 cheap gates (length pre-filter + thresholded 3-arg
    // levenshtein, output-invariant — DedupSpec law) vs the ungated
    // full-DP form they replaced. Interleaved reps so one contention
    // window can't poison a side.
    def ungated(): org.apache.spark.sql.DataFrame = {
      val a = cust.select(substring(col("c_name"), 1, 16).as("blk"),
        col("c_custkey").as("d1"), col("c_name").as("n1"))
      val b = cust.select(substring(col("c_name"), 1, 16).as("blk"),
        col("c_custkey").as("d2"), col("c_name").as("n2"))
      graft.operators.Dedup.connectedComponents(a.join(b, Seq("blk"))
        .filter(col("d1") < col("d2") &&
          levenshtein(col("n1"), col("n2")) <= 1))
    }
    for (rep <- 1 to 2) {
      var t0 = System.nanoTime()
      val comps = graft.operators.Dedup.fuzzyRecordClusters(cust,
          col("c_custkey"), col("c_name"),
          substring(col("c_name"), 1, 16), maxDist = 1)
        .agg(count(lit(1)), countDistinct(col("component"))).collect()(0)
      println(f"entity gated   rep$rep  ${(System.nanoTime() - t0) / 1e9}%7.2f s" +
        f"  (${comps.getLong(0)} nodes, ${comps.getLong(1)} components)")
      t0 = System.nanoTime()
      val u = ungated()
        .agg(count(lit(1)), countDistinct(col("component"))).collect()(0)
      println(f"entity ungated rep$rep  ${(System.nanoTime() - t0) / 1e9}%7.2f s" +
        f"  (${u.getLong(0)} nodes, ${u.getLong(1)} components)")
    }
    // variable-length names (the real-web regime the length pre-gate
    // exists for: TPC-H c_name is fixed-width, so above it never
    // fires): pad each name by custkey%8 chars — most within-block
    // pairs now differ in length by >1 and skip the DP entirely
    val vcust = cust.select(col("c_custkey"),
        concat(col("c_name"),
          substring(lit("xxxxxxxx"), lit(1), (col("c_custkey") % 8)
            .cast("int"))).as("c_name"))
      .localCheckpoint(true)
    def vgated() = graft.operators.Dedup.fuzzyRecordClusters(vcust,
      col("c_custkey"), col("c_name"),
      substring(col("c_name"), 1, 16), maxDist = 1)
    def vungated() = {
      val a = vcust.select(substring(col("c_name"), 1, 16).as("blk"),
        col("c_custkey").as("d1"), col("c_name").as("n1"))
      val b = vcust.select(substring(col("c_name"), 1, 16).as("blk"),
        col("c_custkey").as("d2"), col("c_name").as("n2"))
      graft.operators.Dedup.connectedComponents(a.join(b, Seq("blk"))
        .filter(col("d1") < col("d2") &&
          levenshtein(col("n1"), col("n2")) <= 1))
    }
    for (rep <- 1 to 2) {
      var t0 = System.nanoTime()
      val g = vgated()
        .agg(count(lit(1)), countDistinct(col("component"))).collect()(0)
      println(f"varlen gated   rep$rep  ${(System.nanoTime() - t0) / 1e9}%7.2f s" +
        f"  (${g.getLong(0)} nodes, ${g.getLong(1)} components)")
      t0 = System.nanoTime()
      val u = vungated()
        .agg(count(lit(1)), countDistinct(col("component"))).collect()(0)
      println(f"varlen ungated rep$rep  ${(System.nanoTime() - t0) / 1e9}%7.2f s" +
        f"  (${u.getLong(0)} nodes, ${u.getLong(1)} components)")
    }
  }

  /** Unigram-LM training wall at corpus scale: the claim under test is
    * that the corpus enters ONCE (the word-frequency aggregation) and
    * the EM loop is vocab-bounded — so 10x docs should cost roughly
    * one extra word-count pass, not 10x the loop.
    */
  def unigram(spark: org.apache.spark.sql.SparkSession,
              sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .localCheckpoint(true)
    val nWords = graft.operators.Bpe.wordFreq(docs).count()
    println(s"docs: ${docs.count()}  distinct words: $nWords")
    for (rep <- 1 to 2) {
      val t0 = System.nanoTime()
      val v = graft.operators.Unigram.train(docs, vocabSize = 60)
        .agg(count(lit(1)), sum(col("cnt"))).collect()(0)
      println(f"unigram rep$rep  ${(System.nanoTime() - t0) / 1e9}%7.2f s" +
        f"  (${v.getLong(0)} tokens, mass ${v.getLong(1)})")
    }
  }

  /** WordPiece training at 1x vs Rx corpus (doc_id-shifted replicas:
    * distinct words CONSTANT, corpus R times larger) — the corpus-
    * enters-once law: only the word-frequency aggregation sees the
    * corpus, so wall should grow far sublinearly in R.
    */
  def wordpiece(spark: org.apache.spark.sql.SparkSession,
                sfDir: String, repl: Int): Unit = {
    import org.apache.spark.sql.functions._
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val n = base.count()
    for ((mult, label) <- Seq(1 -> "1x", repl -> s"${repl}x")) {
      val docs = (0 until mult).map(k =>
          base.select((col("doc_id") + lit(k.toLong * n)).as("doc_id"),
            col("text")))
        .reduce(_ unionByName _).localCheckpoint(true)
      val words = graft.operators.Bpe.wordFreq(docs).count()
      for (rep <- 1 to 2) {
        val t0 = System.nanoTime()
        val (m, _) = graft.operators.WordPiece.trainMerges(docs, iters = 8)
        val last = m.orderBy(col("iter").desc).limit(1)
          .select("merged").collect()(0).getString(0)
        println(f"wordpiece $label%4s rep$rep  " +
          f"${(System.nanoTime() - t0) / 1e9}%7.2f s" +
          f"  (${docs.count()} docs, $words words, last merge '$last')")
      }
    }
  }

  /** Z-order layout at table scale: lineitem laid out by the Morton
    * code of (l_orderkey, l_partkey) vs a single-key orderkey sort —
    * files holding matches for a 1/32 range predicate on EACH
    * dimension (the pruning table), plus the layout-write wall (one
    * range exchange either way).
    */
  def zorder(spark: org.apache.spark.sql.SparkSession,
             sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    import graft.engine.Layout
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
      .localCheckpoint(true)
    val nRows = li.count()
    val files = 32
    val maxO = li.agg(max("l_orderkey")).collect()(0).getLong(0)
    val maxP = li.agg(max("l_partkey")).collect()(0).getLong(0)
    val zDir = java.nio.file.Files.createTempDirectory("graft_z").toString
    val oDir = java.nio.file.Files.createTempDirectory("graft_o").toString
    var t0 = System.nanoTime()
    Layout.zorderBy(li, col("l_orderkey"), col("l_partkey"), files)
      .write.mode("overwrite").parquet(zDir)
    val zWall = (System.nanoTime() - t0) / 1e9
    t0 = System.nanoTime()
    Layout.orderByKey(li, col("l_orderkey"), files)
      .write.mode("overwrite").parquet(oDir)
    val oWall = (System.nanoTime() - t0) / 1e9
    println(f"rows $nRows  files $files  write: zorder $zWall%.2f s, " +
      f"orderkey-sort $oWall%.2f s")
    val oPred = col("l_orderkey").between(maxO / 2, maxO / 2 + maxO / 32)
    val pPred = col("l_partkey").between(maxP / 2, maxP / 2 + maxP / 32)
    for ((name, pred) <- Seq("orderkey-range" -> oPred,
        "partkey-range" -> pPred, "2-D box" -> (oPred && pPred))) {
      val z = Layout.filesTouched(spark, zDir, pred)
      val o = Layout.filesTouched(spark, oDir, pred)
      println(f"$name%15s  zorder $z%3d / $files   orderkey-sort " +
        f"$o%3d / $files")
    }
  }

  /** PNG codec wall at corpus scale: encode + inflate + unfilter +
    * features per document, zero shuffles (the gif() twin; encode
    * rides along, so the number upper-bounds decode).
    */
  def png(spark: org.apache.spark.sql.SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    println(s"docs: ${spark.read.parquet(s"$sfDir/documents.parquet").count()}")
    for (rep <- 1 to 2) {
      val t0 = System.nanoTime()
      val sums = graft.multimodal.Multimodal.pngFeatures(
          graft.multimodal.Multimodal.syntheticPngMedia(spark, sfDir))
        .toDF().agg(count(lit(1)), sum(col("sum_gray"))).collect()(0)
      println(f"png rep$rep  ${(System.nanoTime() - t0) / 1e9}%7.2f s" +
        f"  (${sums.getLong(0)} images, graysum ${sums.getLong(1)})")
    }
  }

  /** Image near-dup at corpus scale: decode + dHash + Hamming-banded
    * self-join + bit_count verify over the planted-twin PNG corpus —
    * one (band, key) exchange, never images². Reports pair counts
    * (planted twins land at distance 0).
    */
  def dhash(spark: org.apache.spark.sql.SparkSession,
            sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    import graft.multimodal.Multimodal
    val media = Multimodal.syntheticPngNearDupMedia(spark, sfDir)
    println(s"images: ${media.count()}")
    for (rep <- 1 to 2) {
      val t0 = System.nanoTime()
      val pairs = Multimodal.nearDupImagePairs(
          Multimodal.pngDHashes(media).toDF(), maxDist = 3)
        .agg(count(lit(1)), sum(when(col("dist") === 0, 1L).otherwise(0L)))
        .collect()(0)
      println(f"dhash rep$rep  ${(System.nanoTime() - t0) / 1e9}%7.2f s" +
        f"  (${pairs.getLong(0)} pairs, ${pairs.getLong(1)} at dist 0)")
    }
  }

  /** Script-aware tokenization + langid throughput at corpus scale:
    * one regexp explode + one hash aggregation — the q_langid shape
    * with the char-level CJK fallback on a mixed-script corpus.
    */
  def tokenCjk(spark: org.apache.spark.sql.SparkSession,
               sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    val docs = graft.operators.TextAnalysis
      .syntheticMixedDocs(spark, sfDir).localCheckpoint(true)
    println(s"mixed-script docs: ${docs.count()}")
    for (rep <- 1 to 2) {
      val t0 = System.nanoTime()
      val v = graft.operators.TextAnalysis.scriptTokenProfile(docs)
        .agg(count(lit(1)), sum(col("n_tokens")), sum(col("n_han")),
          sum(col("n_kana"))).collect()(0)
      println(f"tokencjk rep$rep  ${(System.nanoTime() - t0) / 1e9}%7.2f s" +
        f"  (${v.getLong(0)} docs, ${v.getLong(1)} tokens, " +
        f"${v.getLong(2)} han, ${v.getLong(3)} kana)")
    }
  }

  /** GIF codec wall at corpus scale: encode + LZW decode + features
    * per document, zero shuffles — expected scan-rate (the encode side
    * rides along, so the number is an upper bound on decode).
    */
  def gif(spark: org.apache.spark.sql.SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    println(s"docs: ${spark.read.parquet(s"$sfDir/documents.parquet").count()}")
    for (rep <- 1 to 2) {
      val t0 = System.nanoTime()
      val sums = graft.multimodal.Multimodal.gifFeatures(
          graft.multimodal.Multimodal.syntheticGifMedia(spark, sfDir))
        .toDF().agg(count(lit(1)), sum(col("sum_gray"))).collect()(0)
      println(f"gif rep$rep  ${(System.nanoTime() - t0) / 1e9}%7.2f s" +
        f"  (${sums.getLong(0)} images, graysum ${sums.getLong(1)})")
    }
  }

  /** Radix exact per-group quantile selection vs the window-rank
    * form, on (a) the uniform 20-source corpus and (b) a 90%-hot
    * synthetic group — the case the radix path exists for (the window
    * form sorts the whole hot group in one task). Keep-sets must be
    * identical (count + id-sum checksums).
    */
  def quantile(spark: org.apache.spark.sql.SparkSession,
               sfDir: String, synthetic: Option[Long] = None): Unit = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // synthetic N: doc_id = row id, n_chars = decorrelated pseudo-score
    // (same distribution per group), source uniform over 20
    val docs = synthetic.map { n =>
      spark.range(0, n, 1, 32).toDF("doc_id")
        .withColumn("source", concat(lit("src"), pmod(
          graft.functions.StableHash.stableHash60(
            col("doc_id").cast("string")), lit(20))))
        .withColumn("n_chars", pmod(col("doc_id") * 2654435761L, lit(100000L)))
    }.getOrElse(
      spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("source"), col("n_chars")))
      .withColumn("hot", when(col("doc_id") % 10 < 9, lit("hot"))
        .otherwise(concat(lit("cold"), col("doc_id") % 10)))
      .localCheckpoint(true)
    println(s"docs: ${docs.count()}")
    def sums(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), sum(col("doc_id"))).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    def windowed(g: org.apache.spark.sql.Column) = {
      val w = Window.partitionBy(g).orderBy(-col("n_chars"), col("doc_id"))
      docs.withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(g)))
        .filter((col("rn") - 1) * 5 < col("n") * 3)
    }
    for (rep <- 1 to 2; (label, g) <- Seq(
        "uniform" -> col("source"), "hot90" -> col("hot"))) {
      var t0 = System.nanoTime()
      val r = sums(graft.operators.Sampling.topFractionByGroup(
        docs, g, -col("n_chars"), col("doc_id"), 3, 5,
        windowMaxGroup = 0L)) // pin radix: this A/B IS the router input
      val tR = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val ww = sums(windowed(g))
      val tW = (System.nanoTime() - t0) / 1e9
      require(r == ww, s"$label keep-sets diverge: $r vs $ww")
      println(f"$label%-8s rep$rep  radix $tR%7.2f s   window $tW%7.2f s" +
        f"   (${r._1} kept, checksum ${r._2})")
    }
  }

  def lshBitsSweep(spark: org.apache.spark.sql.SparkSession,
                   sfDir: String): Unit = {
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .localCheckpoint(true)
    println(s"vectors: ${embs.count()}")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($rows rows)")
    }
    // bits must split evenly into the 4 bands: 12/16/20/24 total bits
    // = 8/16/32/64 buckets per band
    for (bits <- Seq(16, 20, 24))
      time(s"lsh_pairs bits=$bits")(
        graft.operators.Dedup.lshCosinePairs(embs, 4, 10, bits = bits).count())
    for (bits <- Seq(16, 24))
      time(s"knn_graph bits=$bits")(
        graft.operators.Similarity.knnGraph(embs, k = 3, bits = bits).count())
  }

  /** Adversarial LSH-banding skew: a power-law corpus where 1/hotFrac of
    * all vectors are near-clones of ONE vector — identical hyperplane
    * signs, so every band hashes them into the SAME bucket (the
    * worst case the rarity-balanced random corpus never shows). Pins:
    *   - the max band-bucket size (≈ nVec/hotFrac) and the quadratic
    *     in-bucket candidate count the hot bucket alone contributes;
    *   - the HOF (groupBy + in-place expansion) vs codegen'd self-join
    *     candidate paths on the SAME banded input — the join streams
    *     the hot bucket's pair blow-up instead of buffering it, which
    *     is why `lshCosinePairs` uses it;
    *   - the full operator wall time under the skew.
    */
  def lshSkewStress(spark: org.apache.spark.sql.SparkSession, nVec: Int,
                    hotFrac: Int): Unit = {
    import spark.implicits._
    import graft.functions.VectorFunctions.{quantize, lshBandKeys}
    import graft.plans.LongArrayDot
    import graft.operators.Dedup
    // deterministic corpus: id % hotFrac == 0 -> clone of vector 0 with
    // sign-preserving noise (1e-4); else an independent random unit vec.
    // bits=24 (6/band, 64 buckets/band) keeps the RANDOM mass spread so
    // the hot clones are the only concentration — with the operator
    // default (3 bits/band = 8 buckets) the cold mass alone overflows
    // the HOF path's guardedBucket, which is itself a finding: bucket
    // count must grow with the corpus (bits ~ log2(n/target)).
    def unitVec(seed: Long): Array[Float] = {
      val r = new java.util.Random(seed * 0x9E3779B97F4A7C15L + 42L)
      val v = Array.fill(64)(r.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val base = unitVec(0L)
    val emb = spark.range(0, nVec, 1, 32).map { id =>
      if (id % hotFrac == 0) {
        val r = new java.util.Random(id)
        (id, base.map(x => x + (r.nextGaussian() * 1e-4).toFloat))
      } else (id, unitVec(id))
    }.toDF("vec_id", "embedding").localCheckpoint(true)
    val banded = emb
      .select(col("vec_id"), quantize(col("embedding")).as("qv"))
      .withColumn("bks", array(lshBandKeys(col("qv"), 24, 4, 64): _*))
      .select(col("vec_id"),
        posexplode(col("bks")).as(Seq("band", "bk")))
      .localCheckpoint(true)
    val maxBucket = banded.groupBy(col("band"), col("bk"))
      .agg(count(lit(1)).as("n")).agg(max(col("n"))).head().getLong(0)
    println(s"lsh_skew: nVec=$nVec hot=1/$hotFrac maxBucket=$maxBucket")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($rows rows)")
    }
    time("lsh_cands_hof")(
      Dedup.bandCandidatePairs(banded, "vec_id", "v1", "v2").count())
    time("lsh_cands_join")(
      Dedup.bandCandidatePairsJoin(banded, "vec_id", "v1", "v2").count())
    time("lsh_pairs_full")(
      Dedup.lshCosinePairs(emb, tauNum = 9, tauDen = 10, bits = 24).count())
  }
}
