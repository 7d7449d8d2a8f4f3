package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The streaming incremental semantic dedup must agree EXACTLY with the
  * batch operator over the union on the same frozen quantizer — the
  * structural law of EmbStream.semanticDedupIncremental.
  */
class EmbStreamSpec extends SparkSpec {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

  private def vecsDf(rows: Seq[(Long, Array[Float], Int)]): DataFrame = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "label")
  }

  private def runStream(corpus: DataFrame, nlist: Int,
                        batches: Seq[Seq[(Long, Array[Float], Int)]])
      : (DataFrame, Seq[Seq[(Long, Long, Long)]]) = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Array[Float], Int)]
    val stream = mem.toDF().toDF("vec_id", "embedding", "label")
    val deltas =
      scala.collection.mutable.ArrayBuffer.empty[Seq[(Long, Long, Long)]]
    val inc = EmbStream.semanticDedupIncremental(stream, corpus,
        nlist = nlist, iters = 2, tauNum = 9, tauDen = 10) { d =>
      deltas.synchronized {
        deltas += d.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      }
    }
    batches.foreach { b =>
      mem.addData(b: _*)
      inc.query.processAllAvailable()
    }
    inc.query.stop()
    (inc.baseline, deltas.toSeq)
  }

  private def lastWriteWins(baseline: DataFrame,
                            deltas: Seq[Seq[(Long, Long, Long)]])
      : Map[Long, (Long, Long)] = {
    val base = baseline.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    deltas.flatten.foldLeft(base) { case (m, (v, c, cn)) =>
      m.updated(v, (c, cn))
    }
  }

  test("streaming IVF index maintenance: batches append against frozen " +
       "centroids, a replayed batch is a no-op (id-keyed idempotence), " +
       "and the maintained index answers exactly as inline over the union") {
    import spark.implicits._
    import graft.operators.Similarity
    implicit val sqlCtx = spark.sqlContext
    val e = spark.read.parquet(sf() + "/embeddings.parquet")
    val queries = e.filter(col("vec_id") < 5)
    val build = e.filter(col("vec_id") < 16 || col("vec_id") % 2 === 0)
    def shard(m: Long) = e
      .filter(col("vec_id") >= 16 && col("vec_id") % 4 === m)
      .select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().toSeq
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivfstream_spec").toString
    Similarity.buildIvfIndex(build, path, nlist = 16)
    val mem = MemoryStream[(Long, Array[Float])]
    val q = EmbStream.ivfAppendIncremental(
      mem.toDF().toDF("vec_id", "embedding"), path)
    for (b <- Seq(shard(1), shard(3), shard(1) /* replay */ )) {
      mem.addData(b: _*); q.processAllAvailable()
    }
    q.stop()
    val idx = Similarity.ivfTopKIndexed(queries, path, k = 5, nprobe = 4)
      .collect().map(_.toSeq).toSet
    val inline = Similarity.ivfTopK(queries, e, k = 5, nprobe = 4)
      .collect().map(_.toSeq).toSet
    assert(idx.nonEmpty && idx === inline)
    // the replay really was dropped: one assignment row per vector
    assert(spark.read.parquet(s"$path/assigned").count() === e.count())
  }

  // two orthogonal direction groups + singles, as in DedupSpec
  private val corpusRows = Seq(
    (0L, Array(1000f, 0f, 0f, 0f), 0),
    (1L, Array(999f, 10f, 0f, 0f), 1),
    (2L, Array(0f, 1000f, 0f, 0f), 2),
    (3L, Array(0f, 997f, 0f, 9f), 3),
    (4L, Array(0f, 0f, 1000f, 0f), 4),
    (5L, Array(0f, 0f, 0f, 1000f), 5))

  // batch 1: a dup of stored 0, a new singleton direction
  private val batch1 = Seq(
    (6L, Array(998f, 0f, 12f, 0f), 6),
    (7L, Array(500f, 500f, 500f, 500f), 7))
  // batch 2: a dup of batch-1's 7, a dup of stored 2, a lone vector
  private val batch2 = Seq(
    (8L, Array(501f, 499f, 500f, 500f), 8),
    (9L, Array(0f, 998f, 0f, 20f), 9),
    (10L, Array(0f, 0f, -1000f, 0f), 10))

  test("stream baseline+deltas (last-write-wins) == batch " +
       "semanticDedupWith over the union on the frozen quantizer") {
    val corpus = vecsDf(corpusRows)
    val (baseline, deltas) = runStream(corpus, nlist = 3,
      Seq(batch1, batch2))
    val got = lastWriteWins(baseline, deltas)
    val cents = graft.operators.Similarity.trainCentroids(corpus, 3, 2)
    val want = graft.operators.Dedup.semanticDedupWith(
        vecsDf(corpusRows ++ batch1 ++ batch2), cents,
        tauNum = 9, tauDen = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got == want)
    // the fixture must really exercise merging across arrival epochs
    assert(want(6L)._2 == 0L, "batch-1 vector must merge with stored 0")
    assert(want(8L)._2 == 7L, "batch-2 vector must merge with batch-1 7")
    assert(want(9L)._2 == 2L, "batch-2 vector must merge with stored 2")
  }

  test("a bridging vector merges two STORED components and the delta " +
       "carries the changed old canonical (append-only-new would miss it)") {
    // 0 at 0°, 1 at 36° (cos 0.809 < 0.9: separate components);
    // the arriving 2 at 18° is within 0.951 of BOTH -> bridge
    val corpus = vecsDf(Seq(
      (0L, Array(1000f, 0f, 0f, 0f), 0),
      (1L, Array(809f, 588f, 0f, 0f), 1)))
    val (baseline, deltas) = runStream(corpus, nlist = 1,
      Seq(Seq((2L, Array(951f, 309f, 0f, 0f), 2))))
    val base = baseline.collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(base == Map(0L -> 0L, 1L -> 1L),
      s"baseline must hold two separate components, got $base")
    val delta = deltas.head.map(t => t._1 -> t._3).toMap
    assert(delta == Map(2L -> 0L, 1L -> 0L),
      s"delta must carry the new vector AND the re-canonicalized old " +
        s"one, got $delta")
  }

  test("compaction between batches is invisible to the law: " +
       "baseline+deltas still equals batch over the union, and a " +
       "post-compact batch resolves through the rewritten store") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // bridge fixture: stored 0 at 0° and 1 at 36° are separate
    // components; the batch-1 vector 2 at 18° bridges them, moving
    // stored 1's canonical to 0 — the only event the merge map records
    val corpus = vecsDf(Seq(
      (0L, Array(1000f, 0f, 0f, 0f), 0),
      (1L, Array(809f, 588f, 0f, 0f), 1)))
    val b1 = Seq((2L, Array(951f, 309f, 0f, 0f), 2))
    // batch 2, post-compact: 3 at 40° pairs with stored 1 (cos≈0.998);
    // with the merge map cleared, its canonical 0 can only come from
    // the REWRITTEN base_canon in the compacted store
    val b2 = Seq((3L, Array(766f, 643f, 0f, 0f), 3))
    val mem = MemoryStream[(Long, Array[Float], Int)]
    val stream = mem.toDF().toDF("vec_id", "embedding", "label")
    val deltas =
      scala.collection.mutable.ArrayBuffer.empty[Seq[(Long, Long, Long)]]
    val inc = EmbStream.semanticDedupIncremental(stream, corpus,
        nlist = 1, iters = 2, tauNum = 9, tauDen = 10) { d =>
      deltas.synchronized {
        deltas += d.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      }
    }
    mem.addData(b1: _*)
    inc.query.processAllAvailable()
    // the bridge moved stored 1's canonical -> compaction rewrites the
    // whole canon store (3 rows) with the merge folded in
    assert(inc.compact() == 3L)
    // second compact is a no-op (map cleared)
    assert(inc.compact() == 0L)
    mem.addData(b2: _*)
    inc.query.processAllAvailable()
    inc.query.stop()
    val got = lastWriteWins(inc.baseline, deltas.toSeq)
    val cents = graft.operators.Similarity.trainCentroids(corpus, 1, 2)
    val want = graft.operators.Dedup.semanticDedupWith(
        vecsDf(corpus.as[(Long, Array[Float], Int)].collect().toSeq
          ++ b1 ++ b2), cents, tauNum = 9, tauDen = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got == want)
    assert(want(3L)._2 == 0L, "post-compact arrival must resolve to " +
      "the pre-compact merged canonical via the rewritten store")
  }

  test("durable restart-resume: a SECOND stream on the same stateDir " +
       "reloads centroids + merge map, drops re-sent vec_ids, and its " +
       "baseline+deltas equal batch over the full union") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = vecsDf(corpusRows)
    val state = java.nio.file.Files
      .createTempDirectory("graft_embstream_resume").toString
    def run(batches: Seq[Seq[(Long, Array[Float], Int)]])
        : (DataFrame, Seq[Seq[(Long, Long, Long)]]) = {
      val mem = MemoryStream[(Long, Array[Float], Int)]
      val stream = mem.toDF().toDF("vec_id", "embedding", "label")
      val deltas =
        scala.collection.mutable.ArrayBuffer.empty[Seq[(Long, Long, Long)]]
      val inc = EmbStream.semanticDedupIncremental(stream, corpus,
          nlist = 3, iters = 2, tauNum = 9, tauDen = 10,
          stateDir = Some(state)) { d =>
        deltas.synchronized {
          deltas += d.collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
        }
      }
      batches.foreach { b =>
        mem.addData(b: _*)
        inc.query.processAllAvailable()
      }
      inc.query.stop()
      (inc.baseline, deltas.toSeq)
    }
    // run 1: batch1 through a durable stateDir
    val (_, d1) = run(Seq(batch1))
    assert(d1.flatten.nonEmpty)
    // run 2 (RESTARTED): batch2 plus a RE-SEND of a batch-1 row — the
    // idempotence guard must drop it (id-keyed at-most-once admission)
    val resend = Seq(batch1.head)
    val (base2, d2) = run(Seq(resend ++ batch2))
    val resent = d2.flatten.map(_._1).filter(_ == batch1.head._1)
    assert(resent.isEmpty, s"re-sent vec_id admitted twice: $resent")
    // run-2's baseline is the WHOLE accumulated canon (merges folded),
    // so baseline + run-2 deltas alone equal batch over the union —
    // no replay of run-1's deltas needed
    val got = lastWriteWins(base2, d2)
    val cents = graft.operators.Similarity.trainCentroids(corpus, 3, 2)
    val want = graft.operators.Dedup.semanticDedupWith(
        vecsDf(corpusRows ++ batch1 ++ batch2), cents,
        tauNum = 9, tauDen = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got == want)
    // the cross-epoch merges still land: batch-2's 8 joins run-1's 7,
    // and 9 joins stored 2
    assert(got(8L)._2 == 7L && got(9L)._2 == 2L)
  }

  test("file-stream reader: incremental over day-split embeddings " +
       "shards equals batch over the union (real parquet path)") {
    val all = spark.read.parquet(sf() + "/embeddings.parquet")
    val n = all.count()
    val cut = n / 2
    val corpus = all.filter(col("vec_id") < cut).localCheckpoint(true)
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Array[Float], Int)]
    val stream = mem.toDF().toDF("vec_id", "embedding", "label")
    val deltas =
      scala.collection.mutable.ArrayBuffer.empty[Seq[(Long, Long, Long)]]
    val inc = EmbStream.semanticDedupIncremental(stream, corpus,
        nlist = 8, iters = 2, tauNum = 4, tauDen = 10) { d =>
      deltas.synchronized {
        deltas += d.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      }
    }
    val rest = all.filter(col("vec_id") >= cut)
      .select("vec_id", "embedding", "label")
      .as[(Long, Array[Float], Int)].collect()
    val half = cut + (n - cut) / 2
    mem.addData(rest.filter(_._1 < half).toSeq: _*)
    inc.query.processAllAvailable()
    mem.addData(rest.filter(_._1 >= half).toSeq: _*)
    inc.query.processAllAvailable()
    inc.query.stop()
    val got = lastWriteWins(inc.baseline, deltas.toSeq)
    val cents = graft.operators.Similarity.trainCentroids(corpus, 8, 2)
    val want = graft.operators.Dedup.semanticDedupWith(all, cents,
        tauNum = 4, tauDen = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got == want)
    assert(want.exists { case (v, (_, c)) => v != c },
      "fixture must contain at least one real merge")
  }
}
