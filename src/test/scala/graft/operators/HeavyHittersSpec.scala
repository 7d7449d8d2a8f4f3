package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The Misra–Gries law: two-pass heavyHitters is EXACT — equal to the
  * brute-force strict-threshold computation — for any k and ANY
  * partitioning of the input, because the per-partition MG summaries
  * union to a candidate superset and pass 2 counts exactly.
  */
class HeavyHittersSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"${sf()}/documents.parquet")

  private def exact(k: Int): Set[(String, Long)] = {
    val tok = docs.select(explode(split(col("text"), " ")).as("tok"))
    val n = tok.count()
    tok.groupBy("tok").count()
      .where(col("count") * k > n)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
  }

  private def mg(k: Int, parts: Int): Set[(String, Long)] =
    TextAnalysis.heavyHitters(docs.repartition(parts), k)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet

  test("equals brute force for several k, under skewed and fine partitioning") {
    Seq(5, 20, 100).foreach { k =>
      val want = exact(k)
      Seq(1, 3, 17).foreach { parts =>
        assert(mg(k, parts) === want, s"k=$k parts=$parts")
      }
      // testdata has ~30 tokens above N/100, none above N/20 — the law
      // must hold in both the empty and populated regimes
      assert(want.nonEmpty || k < 100, s"k=$k oracle unexpectedly empty")
    }
  }

  test("pass 1 stays bounded: each partition contributes at most k candidates") {
    // planted stream: one dominant token + long unique tail, one partition
    import spark.implicits._
    val rows = (1 to 5000).map(i =>
      if (i % 3 == 0) "the the the" else s"u$i v$i") // 'the' freq ~1/3 of tokens
    val df = rows.toDF("text").repartition(1)
    val hh = TextAnalysis.heavyHitters(df, k = 10)
      .collect().map(_.getString(0)).toSet
    assert(hh === Set("the"))
  }

  test("strictness: a token at exactly N/k is excluded") {
    import spark.implicits._
    // 4 tokens, each exactly 25% of the stream; k=4 means need > N/4
    val df = Seq.fill(25)("a b c d").toDF("text")
    assert(TextAnalysis.heavyHitters(df, 4).count() === 0)
    // k=5: need > 20% — all four qualify
    assert(TextAnalysis.heavyHitters(df, 5).count() === 4)
  }
}
