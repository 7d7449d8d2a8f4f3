package graft.multimodal

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Laws for the PNG codec: exact round-trips through the hand-rolled
  * zlib inflate + the five scanline unfilters; an independent-
  * implementation cross-check against the JDK Deflater (which emits
  * dynamic-Huffman blocks and arbitrary-distance LZ77 matches the
  * fixture encoder never produces — the inflater must handle the full
  * RFC 1951 surface, not just its own encoder's subset); and the
  * quarantine contract on corrupt or out-of-scope blobs.
  */
class PngCodecSpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  private def grayRoundTrip(w: Int, h: Int, pix: Array[Int]): Boolean =
    PngCodec.decode(PngCodec.encodeGray(w, h, pix)).exists { img =>
      img.width == w && img.height == h && img.channels == 1 &&
        img.pixels.sameElements(pix)
    }

  test("round-trip: arbitrary dims, pseudo-random grayscale (all five " +
       "filters on any image with >= 5 rows; Paeth branches all ways)") {
    check(Prop.forAll(Gen.choose(1, 40), Gen.choose(1, 30),
        Gen.choose(0L, 1L << 40)) { (w, h, seed) =>
      grayRoundTrip(w, h, Array.tabulate(w * h)(p =>
        math.floorMod((seed + p * 11L) * 2654435761L, 256L).toInt))
    })
  }

  test("round-trip: flat and run-heavy images (the encoder's " +
       "distance-1 RLE matches exercise the inflater's match copy)") {
    assert(grayRoundTrip(64, 32, Array.fill(64 * 32)(200)))
    check(Prop.forAll(Gen.choose(1, 50), Gen.choose(1, 20),
        Gen.choose(0, 255)) { (w, h, base) =>
      // long horizontal runs: filter rows 0 (None) carry literal runs,
      // Sub rows become zero runs
      grayRoundTrip(w, h, Array.tabulate(w * h)(p => (base + p / w) % 256))
    })
  }

  test("round-trip: RGB (channel-offset left/up neighbors in the " +
       "filters — a bpp bug flips the sums)") {
    check(Prop.forAll(Gen.choose(1, 24), Gen.choose(1, 16),
        Gen.choose(0L, 1L << 40)) { (w, h, seed) =>
      val pix = Array.tabulate(w * h * 3)(p =>
        math.floorMod((seed + p * 3L) * 2654435761L, 256L).toInt)
      PngCodec.decode(PngCodec.encodeRgb(w, h, pix)).exists { img =>
        img.width == w && img.height == h && img.channels == 3 &&
          img.pixels.sameElements(pix)
      }
    })
  }

  /** Build a PNG around a zlib stream produced by the JDK Deflater —
    * real dynamic-Huffman blocks + full-window LZ77 matches.
    */
  private def jdkPng(w: Int, h: Int, pix: Array[Int],
                     level: Int): Array[Byte] = {
    val stride = w + 1
    val raw = new Array[Byte](h * stride) // filter 0 rows
    for (y <- 0 until h; x <- 0 until w)
      raw(y * stride + 1 + x) = pix(y * w + x).toByte
    val d = new java.util.zip.Deflater(level)
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](raw.length + 1024)
    val n = d.deflate(buf)
    d.end()
    val idat = java.util.Arrays.copyOf(buf, n)
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
      .map(_.toByte))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val td = typ.getBytes("US-ASCII") ++ data
      val crc = new java.util.zip.CRC32()
      crc.update(td)
      def be(v: Long): Unit = {
        out.write(((v >>> 24) & 0xFF).toInt)
        out.write(((v >>> 16) & 0xFF).toInt)
        out.write(((v >>> 8) & 0xFF).toInt)
        out.write((v & 0xFF).toInt)
      }
      be(data.length.toLong); out.write(td, 0, td.length)
      be(crc.getValue)
    }
    val ihdr = new Array[Byte](13)
    ihdr(0) = (w >>> 24).toByte; ihdr(1) = (w >>> 16).toByte
    ihdr(2) = (w >>> 8).toByte; ihdr(3) = w.toByte
    ihdr(4) = (h >>> 24).toByte; ihdr(5) = (h >>> 16).toByte
    ihdr(6) = (h >>> 8).toByte; ihdr(7) = h.toByte
    ihdr(8) = 8 // depth
    chunk("IHDR", ihdr)
    chunk("IDAT", idat)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  test("cross-check: JDK-Deflater zlib streams (dynamic Huffman, " +
       "arbitrary-distance matches, stored blocks at level 0) decode " +
       "to the exact pixels") {
    for (level <- Seq(0, 1, 6, 9)) { // 0 = stored blocks, 6/9 = dynamic
      check(Prop.forAll(Gen.choose(1, 48), Gen.choose(1, 32),
          Gen.choose(0L, 1L << 40)) { (w, h, seed) =>
        // mix of runs and noise so every level picks its natural blocks
        val pix = Array.tabulate(w * h)(p =>
          if ((p / 13) % 2 == 0) (p / w) % 256
          else math.floorMod((seed + p) * 2654435761L, 256L).toInt)
        PngCodec.decode(jdkPng(w, h, pix, level))
          .exists(img => img.pixels.sameElements(pix))
      })
    }
  }

  test("quarantine: corrupt and out-of-scope blobs return None, " +
       "never throw") {
    val good = PngCodec.encodeGray(16, 9,
      Array.tabulate(16 * 9)(p => (p * 37) % 256))
    assert(PngCodec.decode(good).isDefined)
    // every strict prefix quarantines
    for (n <- 0 until good.length by 7)
      assert(PngCodec.decode(java.util.Arrays.copyOf(good, n)).isEmpty)
    // single-byte corruption of the IDAT payload breaks CRC -> None
    val flip = good.clone()
    flip(good.length - 20) = (flip(good.length - 20) ^ 0x5A).toByte
    assert(PngCodec.decode(flip).isEmpty)
    // zero-area and oversized declared dims quarantine (no allocation)
    def withDims(w: Long, h: Long): Array[Byte] = {
      val b = good.clone()
      def be(off: Int, v: Long): Unit = {
        b(off) = ((v >>> 24) & 0xFF).toByte
        b(off + 1) = ((v >>> 16) & 0xFF).toByte
        b(off + 2) = ((v >>> 8) & 0xFF).toByte
        b(off + 3) = (v & 0xFF).toByte
      }
      be(16, w); be(20, h)
      // refresh the IHDR CRC so the dim guard (not the CRC) is what
      // rejects — offsets: type at 12, data 13 bytes, CRC at 29
      val crc = new java.util.zip.CRC32()
      crc.update(b, 12, 4 + 13)
      be(29, crc.getValue)
      b
    }
    assert(PngCodec.decode(withDims(0, 9)).isEmpty)
    assert(PngCodec.decode(withDims(16, 0)).isEmpty)
    assert(PngCodec.decode(withDims(1L << 20, 1L << 20)).isEmpty)
    // 16-bit depth and palette color are out of scope
    val depth16 = good.clone(); depth16(24) = 16
    val c16 = new java.util.zip.CRC32(); c16.update(depth16, 12, 17)
    depth16(29) = ((c16.getValue >>> 24) & 0xFF).toByte
    depth16(30) = ((c16.getValue >>> 16) & 0xFF).toByte
    depth16(31) = ((c16.getValue >>> 8) & 0xFF).toByte
    depth16(32) = (c16.getValue & 0xFF).toByte
    assert(PngCodec.decode(depth16).isEmpty)
  }

  test("quarantine: a truncated zlib stream and a wrong Adler-32 " +
       "both reject after full-size checks") {
    val pix = Array.tabulate(20 * 8)(p => (p * 91) % 256)
    val good = PngCodec.encodeGray(20, 8, pix)
    // corrupting the final IDAT byte (Adler tail) must reject; the
    // CRC also covers it, so rewrite the IDAT CRC to isolate Adler
    val b = good.clone()
    // find IDAT chunk
    var pos = 8
    var idatOff = -1; var idatLen = -1
    while (idatOff < 0) {
      val len = ((b(pos) & 0xFF) << 24) | ((b(pos + 1) & 0xFF) << 16) |
        ((b(pos + 2) & 0xFF) << 8) | (b(pos + 3) & 0xFF)
      val typ = new String(b, pos + 4, 4, "US-ASCII")
      if (typ == "IDAT") { idatOff = pos; idatLen = len }
      else pos += 12 + len
    }
    b(idatOff + 8 + idatLen - 1) =
      (b(idatOff + 8 + idatLen - 1) ^ 0x01).toByte
    val crc = new java.util.zip.CRC32()
    crc.update(b, idatOff + 4, 4 + idatLen)
    val c = crc.getValue
    b(idatOff + 8 + idatLen) = ((c >>> 24) & 0xFF).toByte
    b(idatOff + 8 + idatLen + 1) = ((c >>> 16) & 0xFF).toByte
    b(idatOff + 8 + idatLen + 2) = ((c >>> 8) & 0xFF).toByte
    b(idatOff + 8 + idatLen + 3) = (c & 0xFF).toByte
    assert(PngCodec.decode(b).isEmpty)
  }
}
