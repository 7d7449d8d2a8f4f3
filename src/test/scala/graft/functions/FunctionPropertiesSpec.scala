package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.SparkSpec

/** Property-based checks driven by scalacheck's own runner (the
  * scalatest-scalacheck bridge jar isn't on the offline classpath).
  */
class FunctionPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val vecGen: Gen[List[Float]] =
    Gen.listOfN(8, Gen.choose(-4.0f, 4.0f))

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), p)
    assert(res.passed, res.status.toString)
  }

  test("stableHash60Local equals the stableHash60 column for arbitrary " +
       "strings (the driver-side constant derivation contract)") {
    check(Prop.forAll(Gen.alphaNumStr, Gen.choose(0, 1000)) { (s, i) =>
      val v = s"$s#$i"
      val colHash = Seq(v).toDF("x")
        .select(StableHash.stableHash60(col("x"))).head().getLong(0)
      colHash == StableHash.stableHash60Local(v)
    })
  }

  test("qdot is symmetric and qnorm2 is non-negative") {
    check(Prop.forAll(vecGen, vecGen) { (a, b) =>
      val row = Seq((a, b)).toDF("a", "b")
        .select(
          VectorFunctions.qdot(col("a"), col("b")).as("ab"),
          VectorFunctions.qdot(col("b"), col("a")).as("ba"),
          VectorFunctions.qnorm2(col("a")).as("na"))
        .head()
      row.getAs[Long]("ab") == row.getAs[Long]("ba") &&
        row.getAs[Long]("na") >= 0L
    })
  }

  test("quantized cosine gate: self-similarity always passes tau<=1") {
    check(Prop.forAll(vecGen) { a =>
      a.forall(x => math.abs(x) < 0.002f) || {
        Seq(Tuple1(a)).toDF("a")
          .select(VectorFunctions
            .qcosineAtLeast(col("a"), col("a"), 9, 10).as("p"))
          .head().getBoolean(0)
      }
    })
  }

  test("winnow: fingerprints are a non-empty subset of the positional " +
       "hashes, at most one per window position") {
    val textGen = Gen.listOfN(60,
      Gen.oneOf('a', 'b', 'c', ' ')).map(_.mkString)
    check(Prop.forAll(textGen) { s =>
      val row = Seq(Tuple1(s)).toDF("text")
        .select(graft.plans.RollingShingleHashes(col("text"), 8).as("sh"))
        .select(col("sh"),
          graft.operators.TextAnalysis.winnow(col("sh"), 4).as("fps"))
        .head()
      val hashes = row.getSeq[Long](0)
      val fps = row.getSeq[Long](1)
      val windows = math.max(hashes.length - 3, if (hashes.isEmpty) 0 else 1)
      fps.nonEmpty == hashes.nonEmpty &&
        fps.toSet.subsetOf(hashes.toSet) &&
        fps.distinct.length == fps.length &&
        fps.length <= windows
    })
  }

  test("stable hash: deterministic and non-negative") {
    check(Prop.forAll(Gen.alphaNumStr.suchThat(_.nonEmpty)) { s =>
      val out = Seq(s, s).toDF("s")
        .select(StableHash.stableHash60(col("s"))).as[Long].collect()
      out(0) == out(1) && out(0) >= 0L
    })
  }

  test("autoBits: splits evenly into bands, monotone in n, and holds " +
       "per-band-bucket occupancy within [targetBucket/2, targetBucket]") {
    import graft.functions.VectorFunctions.autoBits
    // pinned datapoints: the sf3 sweep's best setting and the 100TB sizing
    assert(autoBits(60000L) == 24)          // sf3 corpus -> the 32.7s point
    assert(autoBits(10000000000L) == 96)    // 10^10 vectors: 24 bits/band
    assert(autoBits(100L) == 4)             // tiny corpus floors at 1 bit/band
    assert(autoBits(0L) == 4)               // empty corpus: min banding, no throw
    check(Prop.forAll(Gen.chooseNum(1L, 1000000000000L),
                      Gen.chooseNum(16, 8192), Gen.chooseNum(1, 8)) {
      (n, target, bands) =>
        val bits = autoBits(n, target, bands)
        val perBand = bits / bands
        val occupancy = n.toDouble / (1L << perBand)
        bits % bands == 0 &&
          perBand >= 1 && perBand <= 24 &&
          autoBits(n * 2, target, bands) >= bits &&
          // within range whenever neither clamp is active
          (perBand == 1 || perBand == 24 ||
            (occupancy <= target && occupancy > target / 2.0))
    })
  }
}
