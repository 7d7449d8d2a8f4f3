package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

class TopKPairsAggSpec extends SparkSpec {
  import spark.implicits._

  private def scores(n: Int) = (0 until n).map { i =>
    (i % 7L, (i * 2654435761L) % 1000L, i.toLong) // (grp, score, id)
  }.toDF("grp", "score", "id").repartition(8)

  test("native top-k == window row_number ranking (ties: score desc, " +
       "id asc) across a real shuffle") {
    val df = scores(2000)
    val viaAgg = df.groupBy(col("grp"))
      .agg(TopKPairsAgg(col("score"), col("id"), 5,
        distinctIds = false).as("topk"))
      .select(col("grp"), posexplode(col("topk")).as(Seq("pos", "sc")))
      .select(col("grp"), (col("pos") + 1).as("rnk"),
        col("sc.id").as("id"), col("sc.score").as("score"))
      .collect().map(_.toSeq).toSet
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("score").desc, col("id"))
    val viaWindow = df.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("grp"), col("rnk"), col("id"), col("score"))
      .collect().map(_.toSeq).toSet
    assert(viaAgg == viaWindow)
    assert(viaAgg.nonEmpty)
  }

  test("distinctIds absorbs duplicate (score, id) entries") {
    val dup = scores(200).unionAll(scores(200)).unionAll(scores(200))
    val got = dup.groupBy(col("grp"))
      .agg(TopKPairsAgg(col("score"), col("id"), 3,
        distinctIds = true).as("topk"))
      .select(col("grp"), explode(col("topk")).as("sc"))
      .select(col("grp"), col("sc.id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // no id appears twice within a group's top-k
    assert(got.distinct.length == got.length)
    val want = scores(200).groupBy(col("grp"))
      .agg(TopKPairsAgg(col("score"), col("id"), 3,
        distinctIds = true).as("topk"))
      .select(col("grp"), explode(col("topk")).as("sc"))
      .select(col("grp"), col("sc.id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.sorted.sameElements(want.sorted))
  }

  test("distinctIds with UNEQUAL scores per id keeps the best copy, " +
       "order-independently") {
    // id 7 appears with scores 5, 50, 20 (in varying arrival orders via
    // repartition); the surviving copy must always be 50
    val rows = Seq((1L, 5L, 7L), (1L, 50L, 7L), (1L, 20L, 7L),
      (1L, 40L, 8L), (1L, 30L, 9L), (1L, 10L, 10L))
      .toDF("grp", "score", "id").repartition(4)
    val got = rows.groupBy(col("grp"))
      .agg(TopKPairsAgg(col("score"), col("id"), 3,
        distinctIds = true).as("topk"))
      .select(posexplode(col("topk")).as(Seq("pos", "sc")))
      .select(col("sc.score"), col("sc.id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((50L, 7L), (40L, 8L), (30L, 9L)))
    // typed aggregator agrees (same replace-on-better semantics)
    val buf = Seq((5L, 7L), (50L, 7L), (20L, 7L), (40L, 8L), (30L, 9L),
      (10L, 10L))
    val agg = new graft.functions.TopKAggregator(3, distinctIds = true)
    assert(buf.permutations.take(24).forall { p =>
      p.foldLeft(agg.zero)(agg.reduce) ==
        Seq((50L, 7L), (40L, 8L), (30L, 9L))
    })
  }

  test("groups with fewer than k rows emit all their rows") {
    val tiny = Seq((1L, 10L, 100L), (1L, 20L, 101L)).toDF("grp", "score", "id")
    val out = tiny.groupBy(col("grp"))
      .agg(TopKPairsAgg(col("score"), col("id"), 5,
        distinctIds = false).as("topk"))
      .select(size(col("topk"))).head().getInt(0)
    assert(out == 2)
  }
}
