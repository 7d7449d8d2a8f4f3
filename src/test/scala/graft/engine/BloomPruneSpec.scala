package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  test("bloom-pruned semi join equals the plain semi join") {
    val fact = (1L to 2000L).map(i => (i, i % 97)).toDF("k", "payload")
    val dim = Seq(3L, 41L, 500L, 1999L, 2500L).toDF("dk")
    val pruned = BloomPrune.semiJoin(fact, dim, "k", "dk",
        expectedItems = 5L, numBits = 64L) // tiny bloom -> real FPs
      .select("k").as[Long].collect().sorted
    val plain = fact.join(dim.select(col("dk").as("k")), Seq("k"),
        "left_semi")
      .select("k").as[Long].collect().sorted
    assert(pruned.sameElements(plain))
    assert(plain.sameElements(Array(3L, 41L, 500L, 1999L)))
  }

  test("empty dimension yields an empty (not failing) pruned join") {
    val fact = (1L to 100L).toDF("k")
    val dim = Seq.empty[Long].toDF("dk")
    // bloomOf aggregates nothing -> null bloom; might_contain(null) is
    // null -> all rows filtered, which matches the empty semi join
    assert(BloomPrune.semiJoin(fact, dim, "k", "dk").count() == 0)
  }

  test("pre-filter never drops a true match (no false negatives)") {
    val fact = (1L to 5000L).toDF("k")
    val dimKeys = (1L to 5000L by 7).toSeq
    val bf = BloomPrune.bloomOf(dimKeys.toDF("dk"), col("dk"), 1000L, 4096L)
    val kept = fact.filter(BloomPrune.mightContain(bf, col("k")))
      .as[Long].collect().toSet
    assert(dimKeys.forall(kept.contains))
  }
}
