package graft.multimodal

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import FlacCodec._

/** FLAC codec laws: lossless round trips across every subframe type,
  * residual method, partition shape, and stereo decorrelation mode;
  * corrupt payloads quarantine instead of throwing.
  */
class FlacCodecSpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  private def roundTrip(chans: Array[Array[Int]], mode: StereoMode,
                        blockSize: Int = 64): Unit = {
    val blob = encode(chans, 16000, blockSize, mode)
    val info = parse(blob).getOrElse(fail(s"parse failed for $mode"))
    assert(info.channels === chans.length)
    assert(info.totalSamples === chans(0).length.toLong)
    val out = decode(blob, info).getOrElse(fail(s"decode failed for $mode"))
    assert(out.length === chans.length)
    chans.indices.foreach { c =>
      assert(out(c).toSeq === chans(c).toSeq, s"channel $c mismatch ($mode)")
    }
  }

  private def noise(seed: Long, n: Int): Array[Int] =
    Array.tabulate(n)(i =>
      (((seed + i.toLong * 2654435761L) % 65536L) - 32768L).toInt)

  private def ramp(seed: Long, n: Int): Array[Int] =
    Array.tabulate(n)(i => (((seed + i.toLong * 37) % 8192L) - 4096L).toInt)

  test("mono round trip: noise (escape partitions), ramp (real Rice), " +
       "constant head, partial tail blocks") {
    roundTrip(Array(noise(7, 301)), Independent)
    roundTrip(Array(ramp(19, 301)), Independent)
    roundTrip(Array(Array.fill(64)(-1234) ++ noise(3, 130)), Independent)
  }

  test("stereo round trip in all three decorrelation modes " +
       "(side channel decodes at bps+1)") {
    val l = noise(11, 200); val r = ramp(23, 200)
    roundTrip(Array(l, r), LeftSide)
    roundTrip(Array(l, r), RightSide)
    roundTrip(Array(l, r), MidSide)
    roundTrip(Array(l, r), Independent)
  }

  test("encode rejects samples outside the declared bps range and " +
       "unsupported bps — never a silent lossy round trip") {
    // near-full-range Int samples used to clamp 33-bit residuals to 31
    // in the Rice escape path and round-trip LOSSY; now they fail fast
    intercept[IllegalArgumentException] {
      encode(Array(Array(Int.MaxValue, Int.MinValue + 1, 0, 5)),
        16000, 64, Independent)
    }
    intercept[IllegalArgumentException] {
      encode(Array(Array(32768, 0, 0, 0)), 16000, 64, Independent) // bps=16
    }
    intercept[IllegalArgumentException] {
      encode(Array(noise(1, 8)), 16000, 64, Independent, bps = 32)
    }
    // boundary values of the declared range are fine
    roundTrip(Array(Array(-32768, 32767, -32768, 32767, 0, 1)),
      Independent, blockSize = 6)
  }

  test("mid/side parity trick is exact for odd sums and negatives") {
    val l = Array(-3, 3, -32768, 32767, 1, 0)
    val r = Array(0, 2, 32767, -32768, -1, -1)
    roundTrip(Array(l, r), MidSide, blockSize = 6)
  }

  test("wasted-bits extraction fires and round-trips (all samples share " +
       "trailing zero bits)") {
    val base = ramp(5, 128).map(_ * 8) // 3 wasted bits
    val blob = encode(Array(base), 16000, 64, Independent)
    // the wasted-bit flag must actually be set in at least one subframe:
    // a scaled-by-8 stream compresses to fewer bits than the unscaled one
    val unscaled = encode(Array(ramp(5, 128)), 16000, 64, Independent)
    assert(blob.length <= unscaled.length + 2,
      "wasted-bits encoding should not inflate the scaled stream")
    val info = parse(blob).get
    assert(decode(blob, info).get.head.toSeq === base.toSeq)
  }

  test("property: arbitrary 16-bit channels round-trip losslessly in " +
       "every mode and block size") {
    val sample16 = Gen.choose(-32768, 32767)
    check(Prop.forAll(Gen.choose(1L, 1L << 40), Gen.choose(1, 400),
        Gen.oneOf(Seq[StereoMode](Independent, LeftSide, RightSide, MidSide)),
        Gen.oneOf(16, 64, 192, 256)) { (seed, n, mode, bs) =>
      val l = noise(seed, n)
      val r = noise(seed + 7919, n).map(v => (v / 3) * 2)
      val chans = if (mode == Independent && seed % 2 == 0) Array(l)
                  else Array(l, r)
      val blob = encode(chans, 8000, bs, mode)
      val info = parse(blob).get
      decode(blob, info).exists(out =>
        out.length == chans.length &&
          chans.indices.forall(c => out(c).sameElements(chans(c))))
    })
  }

  test("fuzz: random blobs and single-byte flips of a valid stream never " +
       "throw — they decode or quarantine") {
    val valid = encode(Array(noise(42, 200), ramp(43, 200)), 16000, 64, MidSide)
    val rnd = new scala.util.Random(1234)
    (0 until 300).foreach { _ =>
      val junk = new Array[Byte](rnd.nextInt(300))
      rnd.nextBytes(junk)
      parse(junk).foreach(i => decode(junk, i)) // must not throw
    }
    var quarantined = 0
    (0 until 400).foreach { _ =>
      val flipped = valid.clone()
      val at = rnd.nextInt(flipped.length)
      flipped(at) = (flipped(at) ^ (1 << rnd.nextInt(8))).toByte
      val ok = parse(flipped) match {
        case None => false
        case Some(i) => decode(flipped, i).isDefined
      }
      if (!ok) quarantined += 1
    }
    // CRC-8/CRC-16 make bit flips in frame data detectable
    assert(quarantined > 200,
      s"expected most single-bit corruptions caught, got $quarantined/400")
  }

  test("truncated streams quarantine (no partial decode)") {
    val valid = encode(Array(noise(9, 300)), 16000, 64, Independent)
    (1 until valid.length by 7).foreach { k =>
      val cut = valid.take(valid.length - k)
      parse(cut).foreach { i =>
        assert(decode(cut, i).isEmpty, s"truncation by $k gave a result")
      }
    }
  }

  test("synthetic corpus blobs decode to the closed-form waveform " +
       "(the oracle contract, spot-checked in-JVM)") {
    Seq(0L, 1L, 2L, 3L, 6L, 9L, 15L).foreach { id =>
      val n = (128 + id % 161).toInt
      val nCh = if (id % 3 == 0) 2 else 1
      def wave(ch: Int): Array[Int] = {
        val base = (id % 65536) + ch * 7919L
        Array.tabulate(n) { i =>
          if (i < 64) (((base * 31) % 65536) - 32768).toInt
          else if (id % 2 == 0)
            (((base + i.toLong * 2654435761L) % 65536L) - 32768L).toInt
          else (((base + i.toLong * 37L) % 8192L) - 4096L).toInt
        }
      }
      val chans = Array.tabulate(nCh)(wave)
      val mode =
        if (nCh == 1) Independent
        else if (id % 9 == 0) LeftSide
        else if (id % 9 == 3) MidSide
        else RightSide
      val blob = encode(chans, 16000, 64, mode)
      val out = decode(blob, parse(blob).get).get
      chans.indices.foreach(c => assert(out(c).toSeq === chans(c).toSeq,
        s"id=$id ch=$c"))
    }
  }
}
