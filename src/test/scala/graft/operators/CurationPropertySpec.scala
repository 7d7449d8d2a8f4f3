package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.SparkSpec

/** Property checks for the curation operators against their sequential
  * reference definitions on random inputs.
  */
class CurationPropertySpec extends SparkSpec {
  import spark.implicits._

  private val docGen: Gen[(Long, Int)] = for {
    id <- Gen.choose(0L, 100000L)
    tok <- Gen.choose(1, 40)
  } yield (id, tok)

  test("packShards == sequential per-shard fold on random corpora") {
    val prop = Prop.forAll(Gen.listOfN(40, docGen)) { docs0 =>
      val docs = docs0.distinctBy(_._1)
      val df = docs.map { case (id, tok) =>
        (id, Seq.fill(tok)("w").mkString(" "))
      }.toDF("doc_id", "text")
      val got = Curation.packShards(df, col("doc_id"),
          size(split(col("text"), " ")), shards = 3, budget = 32L)
        .collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("shard"), r.getAs[Long]("cum"),
            r.getAs[Long]("bin"))).toMap
      // sequential reference: per shard, walk docs in id order keeping a
      // running offset; bin = start / budget
      val want = docs
        .groupBy { case (id, _) => got(id)._1 }
        .flatMap { case (_, ds) =>
          var cum = 0L
          ds.sortBy(_._1).map { case (id, tok) =>
            val start = cum
            cum += tok
            id -> (got(id)._1, cum, start / 32L)
          }
        }.toMap
      got == want
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("equalCountBins == ntile over (value, id) on random data") {
    import org.apache.spark.sql.expressions.Window
    import org.scalacheck.Prop.propBoolean
    val prop = Prop.forAll(Gen.listOfN(25, docGen)) { docs0 =>
      val docs = docs0.distinctBy(_._1)
      (docs.length >= 4) ==> {
        val df = docs.toDF("doc_id", "v0")
          .select(col("doc_id"), col("v0").cast("long").as("v0"))
        val got = Curation.equalCountBins(df, col("v0"), col("doc_id"), 4)
          .select("doc_id", "bin").collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        val want = df.withColumn("bin",
            ntile(4).over(Window.orderBy(col("v0"), col("doc_id")))
              .cast("long"))
          .select("doc_id", "bin").collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        got == want
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("interleave emits a bijection onto distinct global positions") {
    val prop = Prop.forAll(Gen.listOfN(30, docGen)) { docs0 =>
      val docs = docs0.distinctBy(_._1)
      val df = docs.map { case (id, _) => (id, s"t$id") }
        .toDF("doc_id", "text")
      val out = Curation.interleave(df, col("doc_id"), shards = 4)
        .select("doc_id", "global_pos").collect()
        .map(r => r.getLong(0) -> r.getLong(1))
      out.length == docs.length &&
        out.map(_._2).distinct.length == out.length &&
        out.map(_._1).toSet == docs.map(_._1).toSet
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }
}
