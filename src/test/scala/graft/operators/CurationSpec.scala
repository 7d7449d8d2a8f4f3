package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int) =
    (0 until n).map(i => (i.toLong, ("w " * (10 + i % 20)).trim))
      .toDF("doc_id", "text")

  test("packShards: bins partition each shard's stream in order") {
    val d = docs(200)
    val out = Curation.packShards(d, col("doc_id"),
      size(split(col("text"), " ")), shards = 4, budget = 64L)
      .collect()
    assert(out.length == 200)
    // per (shard, bin): the docs are a contiguous doc_id run within the
    // shard's stream, and every bin except a shard's last one starts
    // within budget of its boundary
    val byShard = out.groupBy(_.getAs[Long]("shard"))
    for ((_, rows) <- byShard) {
      val sorted = rows.sortBy(_.getAs[Long]("doc_id"))
      // running offsets are consistent: cum = prefix sum of n_tok
      var run = 0L
      for (r <- sorted) {
        run += r.getAs[Long]("n_tok")
        assert(r.getAs[Long]("cum") == run)
        // bin = start offset div budget
        val start = r.getAs[Long]("cum") - r.getAs[Long]("n_tok")
        assert(r.getAs[Long]("bin") == start / 64L)
      }
      // bins are non-decreasing along the stream
      val bins = sorted.map(_.getAs[Long]("bin")).toSeq
      assert(bins == bins.sorted)
    }
  }

  test("packShards is deterministic under repartitioning") {
    val d = docs(100)
    val a = Curation.packShards(d, col("doc_id"),
      size(split(col("text"), " ")), 4, 64L).collect().toSet
    val b = Curation.packShards(d.repartition(7), col("doc_id"),
      size(split(col("text"), " ")), 4, 64L).collect().toSet
    assert(a == b)
  }

  test("interleave: global positions are a permutation, round-robin by shard") {
    val d = docs(97)
    val out = Curation.interleave(d, col("doc_id"), shards = 4).collect()
    assert(out.length == 97)
    // every global_pos decodes back to (shard, pos_in_shard)
    for (r <- out) {
      val g = r.getAs[Long]("global_pos")
      assert(g % 4 == r.getAs[Long]("shard"))
      assert(g / 4 + 1 == r.getAs[Long]("pos_in_shard"))
    }
    // positions within a shard are 1..n with no gaps
    for ((_, rows) <- out.groupBy(_.getAs[Long]("shard"))) {
      val ps = rows.map(_.getAs[Long]("pos_in_shard")).sorted.toSeq
      assert(ps == (1L to rows.length.toLong))
    }
  }

  test("interleaveDense: positions are dense 0..n-1 and order-preserving") {
    val d = docs(97)
    val sparse = Curation.interleave(d, col("doc_id"), shards = 4).collect()
    val dense = Curation.interleaveDense(d, col("doc_id"), shards = 4)
      .collect()
    // dense positions are exactly 0..96
    val gs = dense.map(_.getAs[Long]("global_pos")).sorted.toSeq
    assert(gs == (0L until 97L))
    // dense order == rank of the sparse order (same loader walk)
    val sparseRank = sparse.sortBy(_.getAs[Long]("global_pos"))
      .map(_.getAs[Long]("doc_id")).toSeq
    val denseOrder = dense.sortBy(_.getAs[Long]("global_pos"))
      .map(_.getAs[Long]("doc_id")).toSeq
    assert(denseOrder == sparseRank)
  }

  test("equalCountBins: the unpartitioned window runs over the value " +
       "HISTOGRAM, never the corpus (the expected WindowExec warning)") {
    val d = (0 until 400).map(i => (i.toLong, (i % 5).toLong))
      .toDF("doc_id", "score")
    val out = Curation.equalCountBins(d, col("score"), col("doc_id"), 4)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    // exactly one global (unpartitioned) window...
    val windows = plan.linesIterator.filter(_.contains("Window")).toSeq
    assert(windows.nonEmpty)
    // ...and the corpus side reaches the result through a broadcast
    // join of the tiny offsets table, so the single-partition stage
    // holds |distinct values| rows (5 here), not the 400-row corpus
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"), plan)
    // histogram cardinality == distinct values
    val hist = d.select(col("score")).distinct().count()
    assert(hist == 5)
  }

  test("equalCountBins survives a caller column named 'v'") {
    // internal names are __ecb_-prefixed, so a user column "v" neither
    // makes the histogram join ambiguous nor gets dropped
    val d = (0 until 40).map(i => (i.toLong, (i % 7).toLong, s"keep$i"))
      .toDF("doc_id", "score", "v")
    val out = Curation.equalCountBins(d, col("score"), col("doc_id"), 4)
    assert(out.columns.contains("v"))
    val rows = out.collect()
    assert(rows.length == 40)
    assert(rows.map(_.getAs[Long]("bin")).distinct.sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L))
    // exact ntile sizes: 40/4 = 10 each
    assert(rows.groupBy(_.getAs[Long]("bin")).values.forall(_.length == 10))
  }

  test("cvFold: salted folds differ from unsalted, stable across calls") {
    val d = docs(50)
    val cv = d.select(col("doc_id"),
      Curation.cvFold(col("doc_id"), 5).as("f")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cv2 = d.select(col("doc_id"),
      Curation.cvFold(col("doc_id"), 5).as("f")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cv == cv2)
    assert(cv.values.forall(f => f >= 0 && f < 5))
    // decoupled from the unsalted sampling folds: not identical mod 5
    val plain = d.select(col("doc_id"),
      Sampling.foldId(col("doc_id"), 5).as("f")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cv != plain)
  }

  test("halfDrift: halves are exhaustive and skew is |n_a - n_b|") {
    val d = (0 until 60).map(i => (i.toLong, s"g${i % 3}"))
      .toDF("doc_id", "grp0")
    val out = Curation.halfDrift(d, col("doc_id"), col("grp0")).collect()
    assert(out.map(r => r.getAs[Long]("n_a") + r.getAs[Long]("n_b")).sum == 60)
    for (r <- out)
      assert(r.getAs[Long]("skew") ==
        math.abs(r.getAs[Long]("n_a") - r.getAs[Long]("n_b")))
  }

  // skewed corpus: source s0 has 50 docs, s1 has 7, s2 has 2
  private def quotaDocs = (0 until 59).map { i =>
    val src = if (i < 50) "s0" else if (i < 57) "s1" else "s2"
    (i.toLong, src, "en")
  }.toDF("doc_id", "source", "lang")

  test("sourceQuota caps each source at k, keeps short sources whole, " +
       "and ranks 1..kept within each source") {
    val out = Curation.sourceQuota(quotaDocs, k = 5).collect()
    val bySrc = out.groupBy(_.getAs[String]("source"))
    assert(bySrc("s0").length == 5)   // capped
    assert(bySrc("s1").length == 5)   // capped
    assert(bySrc("s2").length == 2)   // whole (under quota)
    for ((_, rows) <- bySrc)
      assert(rows.map(_.getAs[Long]("qrank")).sorted.toSeq ==
        (1L to rows.length).toSeq)
  }

  test("sourceQuota is deterministic, repartition-invariant, and " +
       "monotone in k (smaller quota's picks nest inside larger)") {
    def picks(df: org.apache.spark.sql.DataFrame, k: Int): Set[Long] =
      Curation.sourceQuota(df, k).select("doc_id").collect()
        .map(_.getLong(0)).toSet
    val base = picks(quotaDocs, 5)
    assert(picks(quotaDocs.repartition(13), 5) == base)
    val wider = picks(quotaDocs, 9)
    assert(base.subsetOf(wider))
    // and the selection is by the salted hash order, not doc_id order:
    // s0's keeps are NOT simply ids 0..4
    assert(base.intersect((0L until 50L).toSet) != (0L until 5L).toSet)
  }

  test("dsirScores: target-only vocabulary scores positive, raw-only " +
    "negative; weights are exact integer micro-nat sums") {
    import spark.implicits._
    // target docs speak {aa bb}, raw docs speak {cc dd}; "xx" is shared
    val docs = Seq(
      (0L, "aa bb aa", "en"), (1L, "bb aa xx", "en"),
      (2L, "cc dd cc", "zh"), (3L, "dd xx cc", "zh")
    ).toDF("doc_id", "text", "lang")
    val out = Curation.dsirScores(docs, col("lang") === "en", buckets = 64)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "w_micro", "keep")
      .as[(Long, Long, Long, Int)].collect()
    assert(out.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(out.forall(_._2 == 3L))
    // docs of target-exclusive tokens keep; raw-exclusive drop
    assert(out(0)._3 > 0 && out(0)._4 == 1)
    assert(out(2)._3 < 0 && out(2)._4 == 0)
    // the shared token contributes the SAME per-bucket score to both
    // sides, so doc1 - doc0 differences come only from the swap of one
    // target token for the shared one
    assert(out(1)._4 == 1 && out(3)._4 == 0)
  }

  test("curationAudit: every rule evaluated on every doc (no " +
       "short-circuit), exact_dup fails non-canonical copies, and " +
       "auditSummary separates total from solo attribution") {
    val docs = Seq(
      (0L, "good long document with many distinct words here"), // clean
      (1L, "bad"),                       // too_short only (solo)
      (2L, "good long document with many distinct words here"), // dup of 0
      (3L, "x x x x x x x x x x x x")    // too_short AND low_ttr
    ).toDF("doc_id", "text")
    val rules = Seq(
      "too_short" -> (length(col("text")) < 30),
      "low_ttr" -> (size(array_distinct(split(col("text"), " ")))
        .cast("double") / size(split(col("text"), " ")) < 0.3))
    val audit = Curation.curationAudit(docs, col("doc_id"), col("text"),
      rules).orderBy("doc_id")
      .select(col("doc_id"), array_join(col("fails"), ",").as("f"),
        col("kept")).as[(Long, String, Int)].collect()
    assert(audit.toSeq == Seq(
      (0L, "", 1),
      (1L, "too_short", 0),
      (2L, "exact_dup", 0),
      (3L, "low_ttr,too_short", 0)))  // sorted names, both rules present
    val summ = Curation.auditSummary(Curation.curationAudit(docs,
        col("doc_id"), col("text"), rules))
      .orderBy("rule").as[(String, Long, Long)].collect()
    assert(summ.toSeq == Seq(
      ("exact_dup", 1L, 1L),          // doc 2: fails only exact_dup
      ("low_ttr", 1L, 0L),            // doc 3 also fails too_short
      ("too_short", 2L, 1L)))         // docs 1 (solo) and 3
  }

  test("domainScreen: integer micro-sums, threshold rule exact at the " +
       "boundary, both outcomes reachable") {
    // src A: ttr 1.0 stop 0.5 per doc; src B: ttr floor(1e6/3) stop 0
    val docs = Seq(
      (0L, "the x", "A"), (1L, "the y", "A"),
      (2L, "z z z", "B")).toDF("doc_id", "text", "source")
    val out = Curation.domainScreen(docs, minTtrMicro = 500000L,
        minStopMicro = 60000L).orderBy("source")
      .as[(String, Long, Long, Long, Int)].collect().toSeq
    assert(out == Seq(
      ("A", 2L, 2000000L, 1000000L, 1),
      ("B", 1L, 333333L, 0L, 0)))
    // boundary exactness: threshold exactly at the mean keeps (>=)
    val boundary = Curation.domainScreen(docs, minTtrMicro = 1000000L,
        minStopMicro = 500000L).filter(col("source") === "A")
      .select(col("keep")).as[Int].head()
    assert(boundary == 1)
  }

  test("spanCorrupt: de-corruption reconstructs the original text " +
       "exactly (every token lands in input or target, spans " +
       "non-overlapping, sentinels numbered in order)") {
    val docs = (0L until 20L).map(i =>
      (i, (0 until (10 + i).toInt).map(t => s"w$t").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Curation.spanCorrupt(docs, period = 8, spanLen = 2)
      .join(docs, "doc_id")
      .select("doc_id", "input_text", "target_text", "text")
      .as[(Long, String, String, String)].collect()
    assert(out.length == 20)
    for ((id, inp, tgt, orig) <- out) {
      // parse target into sentinel -> tokens
      val spans = scala.collection.mutable.Map.empty[String, Vector[String]]
      var cur: String = null
      for (t <- tgt.split(" ") if t.nonEmpty)
        if (t.startsWith("<extra_id_")) { cur = t; spans(cur) = Vector() }
        else spans(cur) = spans(cur) :+ t
      // substitute back
      val rebuilt = inp.split(" ").flatMap(t =>
        if (t.startsWith("<extra_id_")) spans(t) else Vector(t))
      assert(rebuilt.mkString(" ") == orig, s"doc $id")
      // every masked span has exactly spanLen tokens except a possible
      // truncated final span
      val lens = spans.values.map(_.length).toSeq
      assert(lens.forall(l => l >= 1 && l <= 2), s"doc $id: $lens")
      assert(lens.count(_ < 2) <= 1, s"doc $id: $lens")
    }
    // determinism: same content, different partitioning -> same pairs
    val again = Curation.spanCorrupt(docs.repartition(7), 8, 2)
      .select("doc_id", "input_text").as[(Long, String)].collect().toMap
    assert(out.forall { case (id, inp, _, _) => again(id) == inp })
  }

  test("curationAudit: duplicate rule names rejected") {
    val docs = Seq((0L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Curation.curationAudit(docs, col("doc_id"), col("text"),
        Seq("r" -> lit(true), "r" -> lit(false)))
    }
    intercept[IllegalArgumentException] {
      Curation.curationAudit(docs, col("doc_id"), col("text"),
        Seq("doc_id" -> lit(true)))
    }
  }

  test("cusum: the two-window closed form equals the direct clamped " +
       "recursion on a planted level shift, alarms fire just after the " +
       "shift, and a flat series never alarms") {
    import spark.implicits._
    // key "shift": 50 points at 10.0 then 50 at 20.0; key "flat": all 7.5
    val rows =
      (1 to 100).map(i =>
        ("shift", i, i.toLong, if (i <= 50) 10.0 else 20.0)) ++
      (1 to 60).map(i => ("flat", i, i.toLong, 7.5))
    val df = rows.toDF("k", "o", "tie", "v")
    val hMilli = 100000L // 100 value-units of n-scaled excursion
    val out = Curation.cusum(df, col("k"), col("o"), col("tie"), col("v"),
        slackMilli = 0L, hMilli = hMilli)
      .collect().map(r => r.getString(0) -> r).toMap

    // direct recursion, same integer milli arithmetic
    def direct(xs: Seq[Long]): (Long, Long, Option[Int]) = {
      val n = xs.length.toLong
      val sTot = xs.sum
      var s = 0L; var mx = 0L; var alarms = 0L
      var first: Option[Int] = None
      xs.zipWithIndex.foreach { case (x, i) =>
        s = math.max(0L, s + (n * x - sTot))
        mx = math.max(mx, s)
        if (s > n * hMilli) {
          alarms += 1
          if (first.isEmpty) first = Some(i + 1)
        }
      }
      (mx, alarms, first)
    }
    val (mxS, alS, fpS) = direct(
      (1 to 100).map(i => if (i <= 50) 10000L else 20000L))
    val shift = out("shift")
    assert(shift.getAs[Long]("max_stat") === mxS)
    assert(shift.getAs[Long]("n_alarms") === alS)
    assert(Option(shift.getAs[Integer]("first_alarm_pos")).map(_.toInt)
      === fpS)
    // the shift alarms, and only after the change point
    assert(alS > 0 && fpS.get > 50)
    val flat = out("flat")
    assert(flat.getAs[Long]("n_alarms") === 0L)
    assert(flat.getAs[Long]("max_stat") === 0L)
  }

  test("k-anonymity: kAnonymize output is k-anonymous BY RE-AUDIT " +
       "(one suppression pass reaches the fixpoint), drops exactly the " +
       "violating classes, and lDiversityAudit flags the planted " +
       "single-sensitive class") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 3 classes: big (20 rows), borderline (5), tiny (2); sensitive
    // value constant inside class C — diverse in A only
    val rows =
      (1 to 20).map(i => (i.toLong, "A", "x", i % 7)) ++
      (21 to 25).map(i => (i.toLong, "B", "y", i % 2)) ++
      (26 to 27).map(i => (i.toLong, "C", "z", 1))
    val df = rows.toDF("id", "q1", "q2", "sens")
    val audit = Curation.kAnonymityAudit(df,
        Seq(col("q1"), col("q2")), k = 5)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getBoolean(3)))
      .toSet
    assert(audit === Set(("A", 20L, true), ("B", 5L, true),
      ("C", 2L, false)))
    val anon = Curation.kAnonymize(df, Seq("q1", "q2"), k = 5)
    assert(anon.count() === 25)
    assert(anon.filter(col("q1") === "C").count() === 0)
    // fixpoint: re-auditing the suppressed output finds NO violations
    val re = Curation.kAnonymityAudit(anon, Seq(col("q1"), col("q2")), 5)
    assert(re.filter(!col("anonymous")).count() === 0)
    val ldiv = Curation.lDiversityAudit(df, Seq(col("q1")),
        col("sens"), l = 3)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getBoolean(3)))
      .toSet
    assert(ldiv === Set(("A", 7L, true), ("B", 2L, false),
      ("C", 1L, false)))
  }

  test("tClosenessAudit: a class mirroring the global sensitive " +
       "distribution scores tv=0; a single-value class scores " +
       "1 - p_global(v); tv is symmetric-bounded in [0,1]") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // global: 24 rows, sensitive values x:12, y:12 (p = 1/2 each).
    // class M mirrors it exactly (6/6); class S is all-x (8 rows);
    // class T is 3:1 (3 x, 1 y)
    val rows =
      (1 to 6).map(i => (i.toLong, "M", "x")) ++
      (7 to 12).map(i => (i.toLong, "M", "y")) ++
      (13 to 20).map(i => (i.toLong, "S", "x")) ++
      (21 to 23).map(i => (i.toLong, "T", "x")) ++
      Seq((24L, "T", "y"))
    // global: x = 17/24, y = 7/24
    val df = rows.toDF("id", "grp", "sens")
    val out = Curation.tClosenessAudit(df, Seq("grp"), col("sens"),
        t = 0.25)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap
    def tvOf(nx: Long, ny: Long): Double = {
      val (nc, n) = (nx + ny, 24L)
      (math.abs(nx * n - 17L * nc) + math.abs(ny * n - 7L * nc))
        .toDouble / (2.0 * nc * n)
    }
    assert(out("M") === ((12L, tvOf(6, 6), tvOf(6, 6) <= 0.25)))
    assert(out("S") === ((8L, tvOf(8, 0), tvOf(8, 0) <= 0.25)))
    assert(out("T") === ((4L, tvOf(3, 1), tvOf(3, 1) <= 0.25)))
    // the all-x class's distance is exactly the global mass it misses
    assert(math.abs(out("S")._2 - 7.0 / 24.0) < 1e-15)
    out.values.foreach { case (_, tv, _) =>
      assert(tv >= 0.0 && tv <= 1.0)
    }
  }

  test("kGeneralize: picks the FIRST ladder level whose smallest class " +
       "reaches k, keeps EVERY row (count >= suppression's), re-audits " +
       "k-anonymous, and fails loudly when no level reaches k") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, floor, lit}
    // ages spread so exact age classes are tiny but decade buckets
    // all reach k=5
    val rows = (1 to 40).map(i => (i.toLong, 20 + i % 8, "x")) ++
      (41 to 44).map(i => (i.toLong, 90 + i, "y")) // 4 singleton ages
    val df = rows.toDF("id", "age", "grp")
    val ladder = Seq(
      Seq("age_g" -> col("age").cast("string")),
      Seq("age_g" -> (floor(col("age") / 10) * 10)
        .cast("long").cast("string")),
      Seq("age_g" -> lit("*")))
    val gen = Curation.kGeneralize(df, ladder, k = 5)
    assert(gen.count() === df.count(), "generalization keeps every row")
    // exact ages can't reach k=5 (the 131..134 singletons) and decades
    // can't either (they bucket to one decade class of 4) -> level 2
    val re = Curation.kAnonymityAudit(gen, Seq(col("age_g")), 5)
    assert(re.filter(!col("anonymous")).count() === 0,
      "output must re-audit k-anonymous")
    // suppression on the same data drops the tail; generalization wins
    // on retained rows
    val sup = Curation.kAnonymize(
      df.select(col("id"), col("age").cast("string").as("age_g")),
      Seq("age_g"), k = 5)
    assert(gen.count() >= sup.count())
    // a ladder whose top level still can't reach k fails loudly
    intercept[IllegalArgumentException] {
      Curation.kGeneralize(df.limit(3), ladder.take(1), k = 5)
    }
    // and a level that DOES reach k is chosen over coarser ones: with
    // k=2 the decade level suffices, so values keep decade precision
    val gen2 = Curation.kGeneralize(df, ladder, k = 2)
    assert(gen2.select(col("age_g")).distinct().count() > 1,
      "must not over-generalize past the first passing level")
  }

  test("kAnonymize agrees with the audit on NULL-bearing classes: a " +
       "NULL quasi class of size >= k is KEPT (null-safe join), one " +
       "below k is suppressed") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rows =
      (1 to 8).map(i => (i.toLong, Option.empty[String], "x")) ++ // NULL class, n=8
      (9 to 10).map(i => (i.toLong, Option.empty[String], "y")) ++ // NULL class, n=2
      (11 to 20).map(i => (i.toLong, Some("A"), "x"))
    val df = rows.toDF("id", "q1", "q2")
    val audit = Curation.kAnonymityAudit(df,
        Seq(col("q1"), col("q2")), k = 5)
    assert(audit.filter(col("q1").isNull && col("anonymous")).count() === 1)
    val anon = Curation.kAnonymize(df, Seq("q1", "q2"), k = 5)
    assert(anon.count() === 18, "the n=8 NULL class must survive")
    assert(anon.filter(col("q1").isNull).count() === 8)
    assert(anon.filter(col("q2") === "y").count() === 0)
  }
}
