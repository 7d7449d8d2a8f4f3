package graft.multimodal

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property checks for the three pure-JVM codecs: encode/parse
  * round-trips, resize sampling, and frame walking must hold for
  * arbitrary dimensions and payload bytes — the guarantees every
  * downstream feature extractor silently assumes.
  */
class CodecPropertySpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  private val bytesOf: Int => Gen[Array[Byte]] =
    n => Gen.containerOfN[Array, Byte](n, Gen.choose(-128, 127).map(_.toByte))

  test("PPM: encode -> parse recovers dims and the exact pixel plane") {
    check(Prop.forAll(
      Gen.choose(1, 24), Gen.choose(1, 24)) { (w, h) =>
      val rgb = Array.tabulate(3 * w * h)(i => (i * 131 + w * 7 + h).toByte)
      val blob = Multimodal.PpmCodec.encode(w, h, rgb)
      Multimodal.PpmCodec.parse(blob).exists { info =>
        info.width == w && info.height == h &&
          blob.slice(info.dataOffset, info.dataOffset + 3 * w * h)
            .sameElements(rgb)
      }
    })
  }

  test("PPM resizeNearest: every output pixel equals its integer-mapped " +
       "source pixel, for arbitrary source and target dims") {
    check(Prop.forAll(Gen.choose(1, 16), Gen.choose(1, 16),
        Gen.choose(1, 16), Gen.choose(1, 16)) { (w, h, w2, h2) =>
      val rgb = Array.tabulate(3 * w * h)(i => (i * 37 + 11).toByte)
      val blob = Multimodal.PpmCodec.encode(w, h, rgb)
      val info = Multimodal.PpmCodec.parse(blob).get
      val out = Multimodal.PpmCodec.resizeNearest(blob, info, w2, h2)
      out.length == 3 * w2 * h2 && (0 until w2 * h2).forall { p =>
        val (x, y) = (p % w2, p / w2)
        val sp = (y * h / h2) * w + (x * w / w2)
        (0 until 3).forall(c => out(3 * p + c) == rgb(3 * sp + c))
      }
    })
  }

  test("Y4M: encode -> parse -> frameOffsets recovers every frame " +
       "byte-exactly, for arbitrary even dims and frame counts") {
    val dims = for {
      w <- Gen.choose(1, 12).map(_ * 2)
      h <- Gen.choose(1, 12).map(_ * 2)
      nf <- Gen.choose(0, 6)
    } yield (w, h, nf)
    check(Prop.forAll(dims) { case (w, h, nf) =>
      val fb = w * h * 3 / 2
      val frames = (0 until nf).map(f =>
        Array.tabulate(fb)(j => (f * 251 + j * 17).toByte))
      val blob = Multimodal.Y4mCodec.encode(w, h, frames)
      Multimodal.Y4mCodec.parse(blob).exists { info =>
        val offs = Multimodal.Y4mCodec.frameOffsets(blob, info)
        info.width == w && info.height == h && offs.size == nf &&
          offs.zipWithIndex.forall { case (o, f) =>
            blob.slice(o, o + fb).sameElements(frames(f))
          }
      }
    })
  }

  test("WAV: encode -> parse -> samples16 round-trips arbitrary int16 " +
       "sample vectors") {
    val samplesGen = Gen.listOf(Gen.choose(-32768, 32767))
    check(Prop.forAll(samplesGen) { ss =>
      val arr = ss.toArray
      val blob = Multimodal.WavCodec.encode(arr, 16000)
      Multimodal.WavCodec.parse(blob).exists { info =>
        Multimodal.WavCodec.samples16(blob, info).sameElements(arr)
      }
    })
  }

  test("corrupt prefixes never throw: parse returns None on every " +
       "truncation of a valid blob") {
    val rgb = Array.tabulate(3 * 4 * 3)(_.toByte)
    val ppm = Multimodal.PpmCodec.encode(4, 3, rgb)
    val y4m = Multimodal.Y4mCodec.encode(4, 2,
      Seq(Array.fill(4 * 2 * 3 / 2)(9.toByte)))
    val wav = Multimodal.WavCodec.encode(Array(1, -2, 3), 8000)
    check(Prop.forAll(Gen.choose(0, ppm.length - 1)) { n =>
      val p = Multimodal.PpmCodec.parse(ppm.take(n))
      p.isEmpty || n >= ppm.length // short plane or header -> None
    })
    check(Prop.forAll(Gen.choose(0, wav.length - 1)) { n =>
      Multimodal.WavCodec.parse(wav.take(n)).isEmpty
    })
    // Y4M: a truncated stream may still parse (header intact) but must
    // never return a frame extending past the buffer
    check(Prop.forAll(Gen.choose(0, y4m.length - 1)) { n =>
      val cut = y4m.take(n)
      Multimodal.Y4mCodec.parse(cut).forall { info =>
        Multimodal.Y4mCodec.frameOffsets(cut, info)
          .forall(_ + info.frameBytes <= cut.length)
      }
    })
  }

  test("PNG fuzz: random byte blobs and arbitrary single-byte flips of " +
       "a valid blob never throw (quarantine returns None or a decode)") {
    // pure noise (signature almost never matches -> None, never throw)
    check(Prop.forAll(Gen.choose(0, 256).flatMap(bytesOf)) { b =>
      PngCodec.decode(b); true
    })
    // structured fuzz: flip one byte anywhere in a real PNG — CRC usually
    // rejects; whatever happens, no exception escapes
    val good = PngCodec.encodeGray(12, 9,
      Array.tabulate(12 * 9)(p => (p * 53) % 256))
    check(Prop.forAll(Gen.choose(0, good.length - 1),
        Gen.choose(1, 255)) { (i, x) =>
      val b = good.clone(); b(i) = (b(i) ^ x).toByte
      PngCodec.decode(b); true
    })
  }
}
