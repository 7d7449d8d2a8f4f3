package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.StableHash.stableHash60
import graft.operators.TextAnalysis

class WordShingleHashesSpec extends SparkSpec {
  import spark.implicits._

  private def hofForm(text: org.apache.spark.sql.Column, k: Int) =
    array_distinct(transform(TextAnalysis.shingles(text, k), stableHash60(_)))

  test("kernel == interpreted HOF+md5 form on real documents") {
    val docs = spark.read.parquet(sf() + "/documents.parquet").limit(200)
    val both = docs.select(
      WordShingleHashes(col("text"), 3).as("fast"),
      hofForm(col("text"), 3).as("slow"))
    assert(both.filter(not(col("fast") === col("slow"))).count() == 0)
  }

  test("edge cases: short text, duplicate shingles, multiple/trailing spaces") {
    val df = Seq(
      "a b",                       // fewer than k tokens -> empty
      "a b c a b c a b c",         // duplicate shingles -> dedup, order kept
      "a  b c ",                   // empty tokens from double/trailing space
      "").toDF("s")
    val rows = df.select(col("s"),
      WordShingleHashes(col("s"), 3).as("fast"),
      hofForm(col("s"), 3).as("slow")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"on '${r.getString(0)}'")
    }
    assert(rows.head.getSeq[Long](1).isEmpty)
  }

  test("property: kernel == HOF form on random spacey strings and widths") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val strGen = for {
      n <- Gen.choose(0, 12)
      toks <- Gen.listOfN(n, Gen.oneOf("a", "bb", "ccc", "", "dd"))
    } yield toks.mkString(" ")
    val prop = Prop.forAll(Gen.listOfN(15, strGen), Gen.choose(1, 4)) {
      (strs, k) =>
        val rows = strs.toDF("s").select(
          WordShingleHashes(col("s"), k).as("fast"),
          hofForm(col("s"), k).as("slow")).collect()
        rows.forall(r => r.getSeq[Long](0) == r.getSeq[Long](1))
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("null input propagates") {
    val rows = Seq(Option("a b c d"), None).toDF("s")
      .select(WordShingleHashes(col("s"), 2).as("h")).collect()
    assert(rows.count(_.isNullAt(0)) == 1)
    assert(rows.exists(r => !r.isNullAt(0) && r.getSeq[Long](0).size == 3))
  }
}
