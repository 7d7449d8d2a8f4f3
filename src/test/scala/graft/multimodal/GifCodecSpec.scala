package graft.multimodal

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Laws for the GIF LZW codec: exact round-trips on the compression
  * regimes that stress distinct decoder paths — pseudo-random indices
  * (dictionary grows every pixel), runs (KwKwK chains), and corpora
  * large enough to overflow the 4096-entry dictionary (clear-on-full
  * reset); plus the quarantine contract on corrupt prefixes.
  */
class GifCodecSpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  private def roundTrip(w: Int, h: Int, idx: Array[Int]): Boolean =
    GifCodec.decode(GifCodec.encodeGray(w, h, idx)).exists { img =>
      img.width == w && img.height == h &&
        img.indices.sameElements(idx) &&
        img.palette.length == 256 && img.palette(37) == 0x252525
    }

  test("round-trip: arbitrary dims, pseudo-random indices (dictionary " +
       "grows on nearly every pixel)") {
    check(Prop.forAll(Gen.choose(1, 40), Gen.choose(1, 30),
        Gen.choose(0L, 1L << 40)) { (w, h, seed) =>
      roundTrip(w, h, Array.tabulate(w * h)(p =>
        // floorMod: shrinking may drive seed negative
        math.floorMod((seed + p * 7L) * 2654435761L, 256L).toInt))
    })
  }

  test("round-trip: runs and repeats (the KwKwK special case fires " +
       "on every aaa... run boundary)") {
    check(Prop.forAll(Gen.choose(1, 64), Gen.choose(1, 16),
        Gen.choose(0, 255)) { (runLen, nRuns, base) =>
      val idx = (0 until nRuns).flatMap(r =>
        Array.fill(runLen)((base + r) % 256)).toArray
      roundTrip(idx.length, 1, idx)
    })
    // the canonical KwKwK vector: one symbol repeated
    assert(roundTrip(1000, 1, Array.fill(1000)(7)))
  }

  test("round-trip: dictionary overflow forces the clear-on-full " +
       "reset and the decoder follows") {
    // ~12k novel bigrams -> nextCode passes 4096 several times
    val idx = Array.tabulate(12000)(p =>
      (((p * 2654435761L) >> 3) % 256L).toInt)
    assert(roundTrip(120, 100, idx))
    // and a repetitive corpus past the boundary (deep chains + reset)
    val runs = Array.tabulate(20000)(p => (p / 37) % 256)
    assert(roundTrip(200, 100, runs))
  }

  test("corrupt prefixes quarantine: decode never throws; prefixes " +
       "missing pixel data return None (only the end-code/terminator/" +
       "trailer tail is droppable — every pixel is already decoded)") {
    val idx = Array.tabulate(63)(_ % 256)
    val good = GifCodec.encodeGray(9, 7, idx)
    for (n <- 0 until good.length) {
      val d = GifCodec.decode(good.take(n))
      if (n < good.length - 4) assert(d.isEmpty, s"prefix $n")
      else assert(d.isEmpty || d.get.indices.sameElements(idx), s"prefix $n")
    }
    // flipped signature / truncated palette / garbage
    assert(GifCodec.decode("NOTAGIF".getBytes).isEmpty)
    assert(GifCodec.decode(Array.fill[Byte](200)(0x2C)).isEmpty)
  }

  test("dimension guards: zero-area and absurd declared dims " +
       "quarantine without allocating the pixel buffer") {
    // patch the image-descriptor w/h of a valid blob:
    // 13-byte header + 256*3 palette => descriptor at 781,
    // w at 781+5, h at 781+7 (little-endian u16)
    val good = GifCodec.encodeGray(9, 7, Array.tabulate(63)(_ % 256))
    def patched(w: Int, h: Int): Array[Byte] = {
      val b = good.clone()
      b(786) = (w & 0xFF).toByte; b(787) = ((w >> 8) & 0xFF).toByte
      b(788) = (h & 0xFF).toByte; b(789) = ((h >> 8) & 0xFF).toByte
      b
    }
    assert(GifCodec.decode(patched(0, 7)).isEmpty)   // zero width
    assert(GifCodec.decode(patched(9, 0)).isEmpty)   // zero height
    assert(GifCodec.decode(patched(0, 0)).isEmpty)
    // 65535 x 65535 ~ 4.3e9 px: over the absolute cap (and over
    // Int.MaxValue) — must reject BEFORE new Array, never OOM
    assert(GifCodec.decode(patched(0xFFFF, 0xFFFF)).isEmpty)
    // 20000 x 20000 = 4e8 px: under Int.MaxValue but over the 256 Mpx
    // absolute cap — the payload-relative bound alone would need the
    // blob to be tiny; the absolute cap rejects regardless
    assert(GifCodec.decode(patched(20000, 20000)).isEmpty)
    // sanity: the unpatched blob still decodes
    assert(GifCodec.decode(good).nonEmpty)
  }
}
