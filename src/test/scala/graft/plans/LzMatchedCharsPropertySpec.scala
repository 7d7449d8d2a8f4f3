package graft.plans

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** Property check for the greedy-LZ77 kernel: the hash-chain parse must
  * equal the quadratic brute-force rule for ARBITRARY strings — small
  * alphabets maximize repeats (long chains, overlap copies), mixed
  * Unicode exercises the codepoint walk, and random (minLen, maxLen)
  * pairs exercise the cap interplay. The deterministic fixtures in
  * TextAnalysisSpec pin known shapes; this pins the rule itself.
  */
class LzMatchedCharsPropertySpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(120), prop)
    assert(res.passed, res.status.toString)
  }

  private def brute(s: String, minLen: Int, maxLen: Int): Long = {
    val cps = s.codePoints().toArray
    val n = cps.length
    var p = 0
    var total = 0L
    while (p < n) {
      var best = 0
      val cap = math.min(maxLen, n - p)
      for (i <- 0 until p) {
        var l = 0
        while (l < cap && cps(i + l) == cps(p + l)) l += 1
        if (l > best) best = l
      }
      if (best >= minLen) { total += best; p += best } else p += 1
    }
    total
  }

  private val smallAlpha: Gen[String] =
    Gen.choose(0, 120).flatMap(n =>
      Gen.stringOfN(n, Gen.oneOf('a', 'b', 'c', ' ')))

  private val mixedUnicode: Gen[String] =
    Gen.choose(0, 60).flatMap(n => Gen.listOfN(n,
      Gen.oneOf("a", "b", "é", "世", "😀", " "))
      .map(_.mkString))

  test("hash-chain kernel == brute force on small-alphabet strings " +
       "(maximal repeat density) for random (minLen, maxLen)") {
    check(Prop.forAll(smallAlpha, Gen.choose(2, 6),
        Gen.choose(0, 28)) { (s, mn, extra) =>
      val mx = mn + extra
      LzMatchedChars.matched(UTF8String.fromString(s), mn, mx) ==
        brute(s, mn, mx)
    })
  }

  test("hash-chain kernel == brute force on mixed-unicode strings " +
       "(codepoint walk incl. astral pairs)") {
    check(Prop.forAll(mixedUnicode, Gen.choose(2, 5)) { (s, mn) =>
      LzMatchedChars.matched(UTF8String.fromString(s), mn, 32) ==
        brute(s, mn, 32)
    })
  }
}
