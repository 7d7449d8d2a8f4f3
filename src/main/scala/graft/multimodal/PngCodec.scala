package graft.multimodal

/** Pure-JVM PNG codec — the SEVENTH real media kernel and the third
  * COMPRESSED image one (after JpegCodec and GifCodec), covering the
  * most common web image format: a real chunk walk (length/type/CRC
  * framing, IHDR/IDAT/IEND), a hand-rolled RFC 1950/1951 zlib+DEFLATE
  * inflater (stored, fixed-Huffman and dynamic-Huffman blocks, LZ77
  * length/distance match copy, canonical Huffman table construction,
  * CL-code run-length header decode), CRC-32 and Adler-32 integrity
  * checks, and all five PNG scanline unfilters (None/Sub/Up/Average/
  * Paeth, RFC 2083 §6).
  *
  * Scope: 8-bit depth, color type 0 (grayscale) or 2 (RGB), no
  * interlace, no palette/alpha — out-of-scope or corrupt blobs return
  * None (quarantine; the same never-kill-a-task contract as the other
  * codecs). The encoder emits real zlib streams (fixed-Huffman
  * literals plus distance-1 RLE matches on byte runs) under a
  * row-cycling filter schedule, so every unfilter path and the
  * Huffman+match inflate paths are exercised by synthetic payloads
  * whose decoded pixels are known in closed form — the DuckDB oracle
  * gates the full decode arithmetically.
  *
  * Reference behavior: GCS2Postgres has no media kernels (binary
  * columns are opaque); this extends the engine's multimodal surface
  * per SURVEY §2.2.
  */
object PngCodec {

  /** `pixels` are row-major, channel-interleaved bytes in [0, 256):
    * 1 value/px for grayscale (channels=1), 3 for RGB (channels=3).
    */
  final case class PngImage(width: Int, height: Int, channels: Int,
                            pixels: Array[Int])

  private val Signature =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)

  // ---------------------------------------------------------------
  // CRC-32 (ISO 3309, the PNG chunk checksum) and Adler-32 (RFC 1950)
  // ---------------------------------------------------------------

  private val crcTable: Array[Int] = Array.tabulate(256) { n =>
    var c = n
    var k = 0
    while (k < 8) {
      c = if ((c & 1) != 0) 0xEDB88320 ^ (c >>> 1) else c >>> 1
      k += 1
    }
    c
  }

  private def crc32(b: Array[Byte], off: Int, len: Int): Int = {
    var c = 0xFFFFFFFF
    var i = off
    while (i < off + len) {
      c = crcTable((c ^ b(i)) & 0xFF) ^ (c >>> 8)
      i += 1
    }
    c ^ 0xFFFFFFFF
  }

  private def adler32(b: Array[Byte], len: Int): Int = {
    var a = 1; var s = 0
    var i = 0
    while (i < len) {
      a = (a + (b(i) & 0xFF)) % 65521
      s = (s + a) % 65521
      i += 1
    }
    (s << 16) | a
  }

  // ---------------------------------------------------------------
  // decode
  // ---------------------------------------------------------------

  def decode(bytes: Array[Byte]): Option[PngImage] = {
    try decodeOrNull(bytes) match {
      case null => None
      case img  => Some(img)
    } catch { case _: Exception => None }
  }

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def u32be(b: Array[Byte], i: Int): Long =
    ((u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) |
     (u8(b, i + 2) << 8) | u8(b, i + 3)) & 0xFFFFFFFFL

  private def decodeOrNull(b: Array[Byte]): PngImage = {
    if (b.length < 8 + 25) return null
    var i = 0
    while (i < 8) { if (u8(b, i) != Signature(i)) return null; i += 1 }
    var pos = 8
    var w = 0; var h = 0; var channels = 0
    var seenIhdr = false
    val idat = new java.io.ByteArrayOutputStream()
    while (pos + 8 <= b.length) {
      val len = u32be(b, pos)
      if (len > Int.MaxValue - 12 || pos + 12 + len > b.length) return null
      val typ = new String(b, pos + 4, 4, "US-ASCII")
      val dataOff = pos + 8
      // CRC covers type + data (RFC 2083 §3.1); mismatch = corrupt blob
      if (crc32(b, pos + 4, 4 + len.toInt) !=
          u32be(b, dataOff + len.toInt).toInt) return null
      typ match {
        case "IHDR" =>
          if (seenIhdr || len != 13) return null
          seenIhdr = true
          w = u32be(b, dataOff).toInt
          h = u32be(b, dataOff + 4).toInt
          val depth = u8(b, dataOff + 8)
          val color = u8(b, dataOff + 9)
          // scope: 8-bit gray/RGB, deflate, adaptive filters, no Adam7
          if (depth != 8) return null
          channels = color match {
            case 0 => 1
            case 2 => 3
            case _ => return null
          }
          if (u8(b, dataOff + 10) != 0 || u8(b, dataOff + 11) != 0 ||
              u8(b, dataOff + 12) != 0) return null
          // malformed-dimension quarantine: zero-area images and
          // absolute pixel caps (the GifCodec lesson — the relative
          // bound alone lets a small blob declare a multi-GB buffer
          // whose OutOfMemoryError escapes the Exception quarantine)
          if (w <= 0 || h <= 0) return null
          if (w.toLong * h > (1L << 28) / channels) return null
        case "IDAT" =>
          if (!seenIhdr) return null
          idat.write(b, dataOff, len.toInt)
        case "IEND" =>
          if (!seenIhdr) return null
          val raw = inflateZlib(idat.toByteArray,
            h.toLong * (1 + w.toLong * channels))
          if (raw == null) return null
          return unfilter(raw, w, h, channels)
        case _ => // ancillary chunk: CRC-checked above, content skipped
      }
      pos = dataOff + len.toInt + 4
    }
    null // no IEND
  }

  /** RFC 1950 wrapper + RFC 1951 DEFLATE inflate, with the Adler-32
    * trailer verified. `expect` is the exact decompressed size (known
    * from IHDR) — over- or under-runs quarantine.
    */
  private def inflateZlib(z: Array[Byte], expect: Long): Array[Byte] = {
    if (expect <= 0 || expect > (1L << 29)) return null
    if (z.length < 6) return null
    val cmf = u8(z, 0); val flg = u8(z, 1)
    if ((cmf & 0x0F) != 8) return null         // compression method: deflate
    if (((cmf << 8) | flg) % 31 != 0) return null // FCHECK
    if ((flg & 0x20) != 0) return null          // FDICT: out of scope
    val out = new Array[Byte](expect.toInt)
    var outN = 0
    // LSB-first bit reader over the deflate payload
    var pos = 2
    var acc = 0L; var accBits = 0
    def fill(n: Int): Boolean = {
      while (accBits < n) {
        if (pos >= z.length - 4) return false // 4 trailer bytes reserved
        acc |= (u8(z, pos).toLong << accBits); pos += 1; accBits += 8
      }
      true
    }
    def bits(n: Int): Int = {
      val v = (acc & ((1L << n) - 1)).toInt
      acc >>>= n; accBits -= n
      v
    }

    // canonical Huffman decode tables from code lengths (RFC 1951
    // §3.2.2): per-length count/base-code/symbol-offset arrays; decode
    // walks the code MSB-first while the stream supplies bits LSB-first
    final class Huff(lengths: Array[Int]) {
      val maxLen = 15
      val count = new Array[Int](maxLen + 1)
      lengths.foreach(l => if (l > 0) count(l) += 1)
      val firstCode = new Array[Int](maxLen + 2)
      val firstSym = new Array[Int](maxLen + 2)
      val syms = new Array[Int](lengths.count(_ > 0))
      val valid: Boolean = {
        var code = 0; var symBase = 0; var ok = true
        var l = 1
        while (l <= maxLen) {
          firstCode(l) = code; firstSym(l) = symBase
          code += count(l); symBase += count(l)
          if (code > (1 << l)) ok = false // over-subscribed lengths
          code <<= 1
          l += 1
        }
        val used = new Array[Int](maxLen + 1)
        var s = 0
        while (s < lengths.length) {
          val ls = lengths(s)
          if (ls > 0) { syms(firstSym(ls) + used(ls)) = s; used(ls) += 1 }
          s += 1
        }
        ok
      }
      def decodeSym(): Int = {
        var code = 0; var l = 0
        while (l < maxLen) {
          if (!fill(1)) return -1
          code = (code << 1) | bits(1)
          l += 1
          val c0 = firstCode(l)
          if (count(l) > 0 && code - c0 < count(l))
            return syms(firstSym(l) + (code - c0))
        }
        -1
      }
    }

    val lenBase = Array(3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19, 23,
      27, 31, 35, 43, 51, 59, 67, 83, 99, 115, 131, 163, 195, 227, 258)
    val lenExtra = Array(0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2,
      3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 0)
    val distBase = Array(1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65, 97,
      129, 193, 257, 385, 513, 769, 1025, 1537, 2049, 3073, 4097, 6145,
      8193, 12289, 16385, 24577)
    val distExtra = Array(0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6,
      7, 7, 8, 8, 9, 9, 10, 10, 11, 11, 12, 12, 13, 13)

    def inflateBlock(lit: Huff, dist: Huff): Boolean = {
      while (true) {
        val sym = lit.decodeSym()
        if (sym < 0) return false
        if (sym < 256) {
          if (outN >= out.length) return false
          out(outN) = sym.toByte; outN += 1
        } else if (sym == 256) {
          return true
        } else {
          if (sym > 285) return false
          if (!fill(lenExtra(sym - 257))) return false
          val mlen = lenBase(sym - 257) + bits(lenExtra(sym - 257))
          val dsym = dist.decodeSym()
          if (dsym < 0 || dsym > 29) return false
          if (!fill(distExtra(dsym))) return false
          val d = distBase(dsym) + bits(distExtra(dsym))
          if (d > outN || outN + mlen > out.length) return false
          var k = 0
          while (k < mlen) { out(outN) = out(outN - d); outN += 1; k += 1 }
        }
      }
      true
    }

    var fin = false
    while (!fin) {
      if (!fill(3)) return null
      fin = bits(1) == 1
      bits(2) match {
        case 0 => // stored: byte-align, LEN/NLEN, raw copy
          val drop = accBits % 8
          if (drop > 0) bits(drop)
          if (!fill(32)) return null
          val len = bits(16); val nlen = bits(16)
          if ((len ^ 0xFFFF) != nlen) return null
          if (outN + len > out.length) return null
          var k = 0
          while (k < len) {
            // remaining whole bytes still in acc first, then the array
            if (accBits >= 8) out(outN) = bits(8).toByte
            else {
              if (pos >= z.length - 4) return null
              out(outN) = z(pos); pos += 1
            }
            outN += 1; k += 1
          }
        case 1 => // fixed Huffman (RFC 1951 §3.2.6)
          val ll = new Array[Int](288)
          var s = 0
          while (s < 288) {
            ll(s) = if (s < 144) 8 else if (s < 256) 9
                    else if (s < 280) 7 else 8
            s += 1
          }
          val lit = new Huff(ll)
          val dist = new Huff(Array.fill(30)(5))
          if (!lit.valid || !dist.valid) return null
          if (!inflateBlock(lit, dist)) return null
        case 2 => // dynamic Huffman (RFC 1951 §3.2.7)
          if (!fill(14)) return null
          val hlit = bits(5) + 257
          val hdist = bits(5) + 1
          val hclen = bits(4) + 4
          if (hlit > 286 || hdist > 30) return null
          val clOrder = Array(16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4,
            12, 3, 13, 2, 14, 1, 15)
          val clLens = new Array[Int](19)
          var k = 0
          while (k < hclen) {
            if (!fill(3)) return null
            clLens(clOrder(k)) = bits(3)
            k += 1
          }
          val clHuff = new Huff(clLens)
          if (!clHuff.valid) return null
          val lens = new Array[Int](hlit + hdist)
          var n = 0
          while (n < lens.length) {
            val s = clHuff.decodeSym()
            if (s < 0) return null
            if (s < 16) { lens(n) = s; n += 1 }
            else if (s == 16) {
              if (n == 0 || !fill(2)) return null
              val rep = 3 + bits(2); val v = lens(n - 1)
              if (n + rep > lens.length) return null
              var r = 0; while (r < rep) { lens(n) = v; n += 1; r += 1 }
            } else if (s == 17) {
              if (!fill(3)) return null
              val rep = 3 + bits(3)
              if (n + rep > lens.length) return null
              n += rep
            } else {
              if (!fill(7)) return null
              val rep = 11 + bits(7)
              if (n + rep > lens.length) return null
              n += rep
            }
          }
          val lit = new Huff(java.util.Arrays.copyOfRange(lens, 0, hlit))
          val dist = new Huff(
            java.util.Arrays.copyOfRange(lens, hlit, hlit + hdist))
          if (!lit.valid || !dist.valid) return null
          if (!inflateBlock(lit, dist)) return null
        case _ => return null
      }
    }
    if (outN != out.length) return null
    // Adler-32 trailer over the decompressed bytes (big-endian)
    if (adler32(out, outN) != u32be(z, z.length - 4).toInt) return null
    out
  }

  /** Undo the per-scanline filters (RFC 2083 §6.2-6.6). `raw` is
    * h rows of (1 filter byte + w*ch sample bytes).
    */
  private def unfilter(raw: Array[Byte], w: Int, h: Int,
                       ch: Int): PngImage = {
    val stride = w * ch
    val px = new Array[Int](h * stride)
    var y = 0
    while (y < h) {
      val ft = raw(y * (stride + 1)) & 0xFF
      val rowOff = y * (stride + 1) + 1
      val outOff = y * stride
      var x = 0
      while (x < stride) {
        val cur = raw(rowOff + x) & 0xFF
        val left = if (x >= ch) px(outOff + x - ch) else 0
        val up = if (y > 0) px(outOff - stride + x) else 0
        val ul = if (y > 0 && x >= ch) px(outOff - stride + x - ch) else 0
        val recon = ft match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + ((left + up) >> 1)
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left)
            val pb = math.abs(p - up)
            val pc = math.abs(p - ul)
            cur + (if (pa <= pb && pa <= pc) left
                   else if (pb <= pc) up else ul)
          case _ => return null
        }
        px(outOff + x) = recon & 0xFF
        x += 1
      }
      y += 1
    }
    PngImage(w, h, ch, px)
  }

  // ---------------------------------------------------------------
  // encode (synthetic-fixture side)
  // ---------------------------------------------------------------

  /** Grayscale 8-bit PNG; `pixels` row-major in [0, 256). Filter type
    * of row y is y % 5 — every unfilter path is exercised by any image
    * with >= 5 rows.
    */
  def encodeGray(w: Int, h: Int, pixels: Array[Int]): Array[Byte] =
    encode(w, h, 1, pixels)

  /** RGB 8-bit PNG; `pixels` row-major channel-interleaved. */
  def encodeRgb(w: Int, h: Int, pixels: Array[Int]): Array[Byte] =
    encode(w, h, 3, pixels)

  private def encode(w: Int, h: Int, ch: Int,
                     pixels: Array[Int]): Array[Byte] = {
    require(pixels.length == w * h * ch,
      s"${pixels.length} != $w*$h*$ch")
    require(pixels.forall(p => p >= 0 && p < 256),
      "samples must be in [0, 256)")
    val stride = w * ch
    // filter (RFC 2083 §6): row y uses filter type y % 5
    val raw = new Array[Byte](h * (stride + 1))
    var y = 0
    while (y < h) {
      val ft = y % 5
      raw(y * (stride + 1)) = ft.toByte
      var x = 0
      while (x < stride) {
        val cur = pixels(y * stride + x)
        val left = if (x >= ch) pixels(y * stride + x - ch) else 0
        val up = if (y > 0) pixels((y - 1) * stride + x) else 0
        val ul = if (y > 0 && x >= ch) pixels((y - 1) * stride + x - ch)
                 else 0
        val f = ft match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - ((left + up) >> 1)
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left)
            val pb = math.abs(p - up)
            val pc = math.abs(p - ul)
            cur - (if (pa <= pb && pa <= pc) left
                   else if (pb <= pc) up else ul)
        }
        raw(y * (stride + 1) + 1 + x) = (f & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    Signature.foreach(out.write)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val len = data.length
      out.write((len >>> 24) & 0xFF); out.write((len >>> 16) & 0xFF)
      out.write((len >>> 8) & 0xFF); out.write(len & 0xFF)
      val td = new Array[Byte](4 + len)
      typ.getBytes("US-ASCII").copyToArray(td)
      data.copyToArray(td, 4)
      out.write(td, 0, td.length)
      val c = crc32(td, 0, td.length)
      out.write((c >>> 24) & 0xFF); out.write((c >>> 16) & 0xFF)
      out.write((c >>> 8) & 0xFF); out.write(c & 0xFF)
    }
    val ihdr = new Array[Byte](13)
    def be32(a: Array[Byte], off: Int, v: Int): Unit = {
      a(off) = ((v >>> 24) & 0xFF).toByte
      a(off + 1) = ((v >>> 16) & 0xFF).toByte
      a(off + 2) = ((v >>> 8) & 0xFF).toByte
      a(off + 3) = (v & 0xFF).toByte
    }
    be32(ihdr, 0, w); be32(ihdr, 4, h)
    ihdr(8) = 8
    ihdr(9) = if (ch == 1) 0 else 2
    chunk("IHDR", ihdr)
    chunk("IDAT", deflateZlib(raw))
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Real zlib stream: one final fixed-Huffman deflate block of
    * literals plus distance-1 RLE matches on byte runs of length >= 5
    * (exercising the inflater's match-copy path on flat fixtures),
    * with the RFC 1950 header and Adler-32 trailer.
    */
  private def deflateZlib(data: Array[Byte]): Array[Byte] = {
    val bytes = new java.io.ByteArrayOutputStream()
    bytes.write(0x78); bytes.write(0x01) // CMF/FLG, FCHECK-valid
    var acc = 0L; var accBits = 0
    def flushByteIf(): Unit =
      while (accBits >= 8) {
        bytes.write((acc & 0xFF).toInt); acc >>>= 8; accBits -= 8
      }
    def putBits(v: Int, n: Int): Unit = {
      acc |= (v.toLong << accBits); accBits += n
      flushByteIf()
    }
    def rev(v: Int, n: Int): Int = {
      var r = 0; var i = 0
      while (i < n) { r = (r << 1) | ((v >> i) & 1); i += 1 }
      r
    }
    // fixed-Huffman literal/length codes (RFC 1951 §3.2.6), emitted
    // MSB-of-code-first
    def putLit(sym: Int): Unit =
      if (sym < 144) putBits(rev(0x30 + sym, 8), 8)
      else if (sym < 256) putBits(rev(0x190 + sym - 144, 9), 9)
      else if (sym < 280) putBits(rev(sym - 256, 7), 7)
      else putBits(rev(0xC0 + sym - 280, 8), 8)
    val lenBase = Array(3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19, 23,
      27, 31, 35, 43, 51, 59, 67, 83, 99, 115, 131, 163, 195, 227, 258)
    val lenExtra = Array(0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2,
      3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 0)
    putBits(1, 1) // BFINAL
    putBits(1, 2) // BTYPE fixed
    var i = 0
    while (i < data.length) {
      var run = 1
      while (i + run < data.length && run < 258 &&
             data(i + run) == data(i)) run += 1
      if (run >= 5) {
        // literal then a distance-1 match for the rest of the run
        putLit(data(i) & 0xFF)
        val mlen = run - 1
        var li = lenBase.length - 1
        while (lenBase(li) > mlen) li -= 1
        putLit(257 + li)
        if (lenExtra(li) > 0) putBits(mlen - lenBase(li), lenExtra(li))
        putBits(rev(0, 5), 5) // distance code 0 = distance 1
        i += run
      } else {
        putLit(data(i) & 0xFF)
        i += 1
      }
    }
    putLit(256) // end of block
    if (accBits > 0) bytes.write((acc & 0xFF).toInt)
    val ad = adler32(data, data.length)
    bytes.write((ad >>> 24) & 0xFF); bytes.write((ad >>> 16) & 0xFF)
    bytes.write((ad >>> 8) & 0xFF); bytes.write(ad & 0xFF)
    bytes.toByteArray
  }
}
