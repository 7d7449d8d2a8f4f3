package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.SparkSpec

/** Laws for the radix exact per-group quantile selection: equality
  * with the window-rank reference definition on adversarial inputs
  * (heavy ties at the boundary, negative scores, singleton and
  * all-equal groups), exact-k cardinality, and integer-ceil k.
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def rankReference(df: org.apache.spark.sql.DataFrame,
                            num: Int, den: Int): Set[(String, Long)] = {
    val w = Window.partitionBy("g").orderBy(col("s"), col("i"))
    df.withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("g")))
      .filter((col("rn") - 1) * den < col("n") * num)
      .select(col("g"), col("i")).as[(String, Long)].collect().toSet
  }

  private def radix(df: org.apache.spark.sql.DataFrame,
                    num: Int, den: Int): Set[(String, Long)] =
    Sampling.topFractionByGroup(df, col("g"), col("s"), col("i"),
        num, den, windowMaxGroup = 0L) // pin the radix regime
      .select(col("g"), col("i")).as[(String, Long)].collect().toSet

  test("topFractionByGroup equals the window-rank definition on a " +
       "deterministic pseudo-random corpus with heavy ties and " +
       "negative scores, across fractions") {
    // scores collide a lot (mod 7) and cross zero; ids unique
    val rows = (0 until 500).map { i =>
      val g = s"g${i % 4}"
      val s = ((i * 2654435761L) % 7) - 3 // in [-3, 3], many ties
      (g, s, i.toLong)
    }
    val df = rows.toDF("g", "s", "i")
    for ((num, den) <- Seq((1, 2), (3, 5), (1, 500), (499, 500), (1, 1)))
      assert(radix(df, num, den) == rankReference(df, num, den),
        s"mismatch at $num/$den")
    // regime law: the auto-routed call (window regime at this size)
    // returns the same rows as the pinned radix path
    val auto = Sampling.topFractionByGroup(df, col("g"), col("s"),
        col("i"), 3, 5)
      .select(col("g"), col("i")).as[(String, Long)].collect().toSet
    assert(auto == radix(df, 3, 5))
  }

  test("exact-k cardinality with integer-ceil semantics (the IEEE " +
       "ceil(0.6*25)=16 trap) plus singleton and all-equal groups") {
    val df = ((0 until 25).map(i => ("a", 10L, i.toLong)) ++ // all tied
      Seq(("b", -5L, 100L)) ++                               // singleton
      (0 until 10).map(i => ("c", i.toLong, i.toLong))).toDF("g", "s", "i")
    val kept = Sampling.topFractionByGroup(df, col("g"), col("s"),
        col("i"), 3, 5)
      .groupBy("g").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().toMap
    // ceil(3*25/5)=15 (not the double-ceil 16), ceil(3/5)=1, ceil(6)=6
    assert(kept == Map("a" -> 15L, "b" -> 1L, "c" -> 6L))
    // all-equal group admits the 15 SMALLEST ids — the id radix phase
    val aIds = radix(df, 3, 5).filter(_._1 == "a").map(_._2)
    assert(aIds == (0 until 15).map(_.toLong).toSet)
  }

  test("quantileThresholds: thr_id is MaxValue exactly when the k-th " +
       "score's ties are all admitted; extreme Long scores survive " +
       "the bit walk") {
    val df = Seq(
      ("x", Long.MinValue, 1L), ("x", Long.MaxValue, 2L),
      ("x", 0L, 3L), ("x", 0L, 4L),
      ("y", 7L, 9L), ("y", 7L, 2L), ("y", 7L, 5L), ("y", 7L, 1L))
      .toDF("g", "s", "i")
    // x at 3/4: k=ceil(12/4)=3 -> thr_s=0, both score-0 ties admitted
    // (need=2=ties) -> thr_id=MaxValue
    val tx = Sampling.quantileThresholds(df, col("g"), col("s"),
        col("i"), 3, 4).orderBy("g")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(tx(0) == (("x", 4L, 3L, 0L, Long.MaxValue)))
    // y at 3/4: k=ceil(12/4)=3, ties=4 > need=3 -> id phase pins the
    // 3rd-smallest id among {1,2,5,9}
    assert(tx(1) == (("y", 4L, 3L, 7L, 5L)))
  }

  test("rows with a NULL group or NULL score are not selected (both " +
       "regimes, and they don't count toward n_g); fraction bounds " +
       "validated") {
    val df = Seq((Option("a"), Option(1L), 1L), (None, Option(0L), 2L),
        (Option("a"), Option(2L), 3L), (Option("a"), None, 4L))
      .toDF("g", "s", "i")
    // k over non-null rows only: ceil(2/2)=1 -> just the best row —
    // if the NULL-score row counted, k would be 2
    assert(radix(df, 1, 2) == Set(("a", 1L)))
    val auto = Sampling.topFractionByGroup(df, col("g"), col("s"),
        col("i"), 1, 2)
      .select(col("g"), col("i")).as[(String, Long)].collect().toSet
    assert(auto == Set(("a", 1L)))
    intercept[IllegalArgumentException] {
      Sampling.quantileThresholds(df, col("g"), col("s"), col("i"), 0, 1)
    }
    intercept[IllegalArgumentException] {
      Sampling.quantileThresholds(df, col("g"), col("s"), col("i"), 3, 2)
    }
  }

  test("keepByThresholds: a frozen threshold table scores a NEW shard " +
       "streaming-style — rows strictly better than the pinned k-th " +
       "keep, worse drop, unknown groups drop; composes on a stream " +
       "unchanged (narrow broadcast join, no aggregation)") {
    val train = Seq(("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 3L),
      ("a", 4L, 4L)).toDF("g", "s", "i")
    val thr = Sampling.quantileThresholds(train, col("g"), col("s"),
      col("i"), 1, 2) // k=2: thr_s=2
    val shard = Seq(("a", 1L, 10L), ("a", 2L, 11L), ("a", 3L, 12L),
      ("zz", -99L, 13L)).toDF("g", "s", "i")
    val kept = Sampling.keepByThresholds(shard, col("g"), col("s"),
        col("i"), thr)
      .select(col("i")).as[Long].collect().toSet
    // s=1 < thr keeps; s=2 == thr_s keeps too (training needed no id
    // tie-break, so thr_id = MaxValue and the score class decides);
    // s=3 drops; group zz has no mandate
    assert(kept == Set(10L, 11L))
    // streaming composition: the scorer is a narrow map over a stream
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Long)]
    val scored = Sampling.keepByThresholds(
      mem.toDF().toDF("g", "s", "i"), col("g"), col("s"), col("i"), thr)
    assert(scored.isStreaming, "the frozen scorer must stay a stream")
    val q = scored.writeStream.format("memory")
      .queryName("qt_stream").outputMode("append").start()
    mem.addData(("a", 1L, 10L), ("a", 3L, 12L), ("zz", -99L, 13L))
    q.processAllAvailable(); q.stop()
    assert(spark.table("qt_stream").select(col("i")).as[Long]
      .collect().toSet == Set(10L))
  }

  test("exactSampleByGroup: exactly ceil(n_g*num/den) rows per group, " +
       "identical sample under repartitioning") {
    val spark2 = spark
    import spark2.implicits._
    val df = (0 until 1000).map(i => (s"g${i % 3}", i.toLong))
      .toDF("g", "i")
    def sample(d: org.apache.spark.sql.DataFrame) =
      Sampling.exactSampleByGroup(d, col("g"), col("i"), col("i"), 1, 3,
        windowMaxGroup = 0L)
    val counts = sample(df).groupBy("g").count()
      .as[(String, Long)].collect().toMap
    // group sizes 334/333/333 -> ceil(/3) = 112/111/111
    assert(counts == Map("g0" -> 112L, "g1" -> 111L, "g2" -> 111L))
    val a = sample(df).select("i").as[Long].collect().toSet
    val b = sample(df.repartition(17)).select("i").as[Long].collect().toSet
    assert(a == b) // the sample is a pure function of content
  }

  test("window regime: rank arithmetic stays in longs (a 3M-row group " +
       "at den=1000 would wrap 32-bit (rn-1)*den and keep tail rows)") {
    val spark2 = spark
    import spark2.implicits._
    val df = spark.range(0, 3000000L, 1, 8)
      .select(lit("a").as("g"), (col("id") % 97).as("s"), col("id").as("i"))
    val kept = Sampling.topFractionByGroup(df, col("g"), col("s"),
      col("i"), 1, 1000).count() // window-routed (3M < 4M default)
    assert(kept == 3000L) // ceil(3e6/1000)
  }
}
