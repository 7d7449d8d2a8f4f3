package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultiPatternCountSpec extends SparkSpec {
  import spark.implicits._

  /** Reference implementation: per-pattern overlapping sliding-window
    * count, summed — the semantics MultiPatternCount promises.
    */
  private def naive(s: String, patterns: Seq[String]): Long =
    patterns.map { p =>
      (0 to s.length - p.length).count(i => s.regionMatches(i, p, 0, p.length))
        .toLong
    }.sum

  test("overlaps and nested patterns all count ('aa' twice in 'aaa'; " +
       "'a' and 'ab' both fire on 'ab')") {
    val pats = Seq("aa", "a", "ab")
    val rows = Seq("aaa", "ab", "", "bbb").toDF("s")
      .select(col("s"), MultiPatternCount(col("s"), pats).as("n")).collect()
    val got = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("aaa") == 2L + 3L)      // "aa"x2 + "a"x3
    assert(got("ab") == 1L + 1L)       // "a" + "ab"
    assert(got("") == 0L)
    assert(got("bbb") == 0L)
    rows.foreach(r =>
      assert(r.getLong(1) == naive(r.getString(0), pats), r.getString(0)))
  }

  test("matches the sliding-window reference on real documents (codegen)") {
    val pats = Seq("dup", "slow", "low", "scan batch")
    val docs = spark.read.parquet(sf() + "/documents.parquet").limit(100)
    val rows = docs.select(col("text"),
      MultiPatternCount(col("text"), pats).as("n")).collect()
    assert(rows.exists(_.getLong(1) > 0))
    rows.foreach(r =>
      assert(r.getLong(1) == naive(r.getString(0), pats)))
  }

  test("property: automaton == reference on random strings over a " +
       "small alphabet (worst case for overlap handling)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val pats = Seq("ab", "aba", "b", "baab")
    val gen = Gen.listOf(Gen.oneOf('a', 'b')).map(_.mkString)
    val prop = Prop.forAll(gen) { s =>
      val e = MultiPatternCount(
        org.apache.spark.sql.catalyst.expressions.Literal(
          org.apache.spark.unsafe.types.UTF8String.fromString(s)),
        pats)
      e.eval(null).asInstanceOf[Long] == naive(s, pats)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("null propagates; SQL registration accepts an array literal") {
    val rows = Seq(Some("xaax"), None).toDF("s")
      .select(MultiPatternCount(col("s"), Seq("aa")).as("n")).collect()
    assert(rows.exists(_.isNullAt(0)))
    assert(rows.exists(r => !r.isNullAt(0) && r.getLong(0) == 1L))
    GraftExtensions.register(spark)
    Seq("zaaz").toDF("s").createOrReplaceTempView("mpc_t")
    val viaSql = spark.sql(
      "SELECT multi_pattern_count(s, array('aa', 'z')) AS n FROM mpc_t")
      .head().getLong(0)
    assert(viaSql == 1L + 2L)
  }

  test("constructor rejects empty, non-ASCII, and duplicate patterns") {
    val lit = org.apache.spark.sql.catalyst.expressions.Literal(
      org.apache.spark.unsafe.types.UTF8String.fromString("x"))
    intercept[IllegalArgumentException](MultiPatternCount(lit, Seq.empty))
    intercept[IllegalArgumentException](MultiPatternCount(lit, Seq("")))
    intercept[IllegalArgumentException](MultiPatternCount(lit, Seq("café")))
    intercept[IllegalArgumentException](MultiPatternCount(lit, Seq("a", "a")))
  }
}
