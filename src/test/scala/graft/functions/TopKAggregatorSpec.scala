package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

class TopKAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("typed top-k aggregator == window row_number form") {
    // (group, score, id): 3 groups x 100 rows with score ties
    val rows = for {
      g <- 0L until 3L; i <- 0L until 100L
    } yield (g, (i * 37) % 50, i)
    val ds = rows.toDF("g", "score", "id")

    val byWindow = ds
      .withColumn("rn", row_number().over(
        Window.partitionBy($"g").orderBy($"score".desc, $"id")))
      .filter($"rn" <= 5)
      .select($"g", $"score", $"id")
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSeq).toMap

    val agg = new TopKAggregator(5).toColumn
    val byAgg = ds.as[(Long, Long, Long)]
      .groupByKey(_._1)
      .mapValues { case (_, s, i) => (s, i) }
      .agg(agg)
      .collect().toMap

    assert(byAgg.keySet == byWindow.keySet)
    byAgg.foreach { case (g, topk) =>
      assert(topk == byWindow(g), s"group $g diverged")
    }
  }

  test("merge respects k bound and ordering across partial buffers") {
    val a = new TopKAggregator(3)
    val m = a.merge(
      a.reduce(a.reduce(a.zero, (10L, 1L)), (5L, 2L)),
      a.reduce(a.reduce(a.zero, (10L, 0L)), (99L, 7L)))
    assert(m == Seq((99L, 7L), (10L, 0L), (10L, 1L)))
  }
}
