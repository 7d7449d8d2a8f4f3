package graft.multimodal

/** Pure-JVM baseline-sequential JPEG codec (ITU T.81) — the FOURTH real
  * multimodal kernel next to the WAV/PPM/Y4M codecs, and the first
  * COMPRESSED one: a real marker walk (SOI/DQT/DHT/SOF0/DRI/SOS/EOI),
  * canonical Huffman entropy decoding with byte-stuffing and restart
  * markers, dequantization, and a separable double-precision IDCT.
  *
  * Scope: baseline sequential DCT, 8-bit precision, any component
  * count with sampling factors up to 4x4 (decoded to per-component
  * planes; no color conversion — features read the first/luma plane).
  * Progressive, arithmetic-coded, and 12-bit frames return None, as
  * does any malformed blob — corrupt payloads quarantine, they never
  * kill a task (same contract as PpmCodec/Y4mCodec).
  *
  * The encoder side emits single-component baseline JPEGs from
  * QUANTIZED coefficient blocks (zigzag RLE + the Annex K example
  * tables) — enough to build real compressed payloads whose decoded
  * output is known in closed form (DC-only blocks decode to exact flat
  * values: the IDCT of a DC-only block is mathematically constant and
  * the double-precision error is ~1e-12, far under the rounding step),
  * which is what lets the DuckDB oracle gate the full decode path
  * arithmetically. Reference behavior: GCS2Postgres has no media
  * kernels (the engine treats binary columns as opaque, README.md:9);
  * this extends the engine's multimodal surface per SURVEY §2.2.
  */
object JpegCodec {

  // ---- tables (ITU T.81 public standard) ----

  /** Zigzag index -> natural (raster) index. */
  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** Annex K.3.3.1 — luminance DC: code-length counts + symbols. */
  private val StdDcBits: Array[Int] =
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val StdDcVals: Array[Int] = (0 to 11).toArray

  /** Annex K.3.3.2 — luminance AC. */
  private val StdAcBits: Array[Int] =
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val StdAcVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  /** Separable IDCT basis: ct(u)(x) = C(u)·cos((2x+1)uπ/16), C(0)=1/√2.
    * StrictMath so the table (hence every decoded pixel) is bit-identical
    * on every JVM/platform.
    */
  private val CosT: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val c = if (u == 0) 1.0 / StrictMath.sqrt(2.0) else 1.0
    c * StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 16.0)
  }

  // ---- canonical Huffman ----

  /** Decode tables per F.2.2.3: mincode/maxcode/valptr by code length. */
  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    val values: Array[Int] = vals
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l - 1) > 0) {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l - 1); k += bits(l - 1)
          maxCode(l) = code - 1
        } else maxCode(l) = -1
        code <<= 1
        l += 1
      }
    }
  }

  /** Encode side: symbol -> (code, length), canonical order. */
  private def encodeTable(bits: Array[Int],
                          vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < bits(l - 1)) {
        out += vals(k) -> ((code, l)); code += 1; k += 1; i += 1
      }
      code <<= 1
      l += 1
    }
    out.result()
  }

  // ---- bit io over the entropy-coded segment ----

  /** Reads entropy bits, un-stuffing FF00 and stopping (not throwing) at
    * any real marker; RST markers are consumed by `resync`.
    */
  private final class BitReader(bytes: Array[Byte], start: Int) {
    private var pos = start
    private var bitBuf = 0
    private var bitCnt = 0
    var truncated = false

    def nextBit(): Int = {
      if (bitCnt == 0) {
        if (pos >= bytes.length) { truncated = true; return 0 }
        var b = bytes(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          val b2 = if (pos < bytes.length) bytes(pos) & 0xff else -1
          if (b2 == 0x00) pos += 1
          else { truncated = true; b = 0 } // real marker: scan is over
        }
        bitBuf = b; bitCnt = 8
      }
      bitCnt -= 1
      (bitBuf >> bitCnt) & 1
    }

    def receive(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | nextBit(); i += 1 }
      v
    }

    /** Byte-align and consume an expected RSTn marker. */
    def resync(): Boolean = {
      bitCnt = 0
      if (pos + 1 < bytes.length && (bytes(pos) & 0xff) == 0xff &&
          (bytes(pos + 1) & 0xf8) == 0xd0) { pos += 2; true }
      else false
    }
  }

  private def decodeHuff(r: BitReader, t: HuffTable): Int = {
    var code = r.nextBit()
    var l = 1
    while (code > t.maxCode(l)) {
      if (l >= 16) return -1
      code = (code << 1) | r.nextBit()
      l += 1
    }
    t.values(t.valPtr(l) + code - t.minCode(l))
  }

  /** EXTEND (F.2.2.1): map `s`-bit magnitude to its signed value. */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  // ---- decoded image model ----

  final case class Plane(compId: Int, width: Int, height: Int,
                         pixels: Array[Int])
  final case class JpegImage(width: Int, height: Int, planes: Array[Plane])

  // ---- decoder ----

  private def u16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)

  /** Full baseline-sequential decode; None on anything malformed or out
    * of scope (progressive, 12-bit, >4 sampling, missing tables).
    */
  def decode(bytes: Array[Byte]): Option[JpegImage] = {
    if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff ||
        (bytes(1) & 0xff) != 0xd8) return None
    val qt = Array.ofDim[Int](4, 64) // zigzag order, as stored
    val qtSeen = new Array[Boolean](4)
    val dcT = new Array[HuffTable](4)
    val acT = new Array[HuffTable](4)
    var w = 0; var h = 0
    var nComp = 0
    var compId: Array[Int] = null
    var compH: Array[Int] = null
    var compV: Array[Int] = null
    var compTq: Array[Int] = null
    var restartInterval = 0
    var o = 2
    while (o + 3 < bytes.length) {
      if ((bytes(o) & 0xff) != 0xff) return None
      val marker = bytes(o + 1) & 0xff
      if (marker == 0xd8) { o += 2 } // stray SOI
      else if (marker == 0xd9) return None // EOI before any scan
      else {
        val len = u16(bytes, o + 2)
        if (len < 2 || o + 2 + len > bytes.length) return None
        val seg = o + 4
        val segEnd = o + 2 + len
        marker match {
          case 0xdb => // DQT
            var p = seg
            while (p < segEnd) {
              val pq = (bytes(p) & 0xf0) >> 4
              val tq = bytes(p) & 0x0f
              if (tq > 3) return None
              p += 1
              if (pq == 0) {
                if (p + 64 > segEnd) return None
                var i = 0
                while (i < 64) { qt(tq)(i) = bytes(p + i) & 0xff; i += 1 }
                p += 64
              } else if (pq == 1) {
                if (p + 128 > segEnd) return None
                var i = 0
                while (i < 64) { qt(tq)(i) = u16(bytes, p + 2 * i); i += 1 }
                p += 128
              } else return None
              qtSeen(tq) = true
            }
          case 0xc4 => // DHT
            var p = seg
            while (p + 17 <= segEnd) {
              val tc = (bytes(p) & 0xf0) >> 4
              val th = bytes(p) & 0x0f
              if (tc > 1 || th > 3) return None
              val bits = Array.tabulate(16)(i => bytes(p + 1 + i) & 0xff)
              val n = bits.sum
              if (p + 17 + n > segEnd) return None
              val vals = Array.tabulate(n)(i => bytes(p + 17 + i) & 0xff)
              val t = new HuffTable(bits, vals)
              if (tc == 0) dcT(th) = t else acT(th) = t
              p += 17 + n
            }
          case 0xc0 | 0xc1 => // SOF0 baseline / SOF1 extended sequential
            if (bytes(seg) != 8) return None // precision
            h = u16(bytes, seg + 1); w = u16(bytes, seg + 3)
            nComp = bytes(seg + 5) & 0xff
            if (w <= 0 || h <= 0 || nComp <= 0 || nComp > 4) return None
            if (w > (1 << 14) || h > (1 << 14)) return None // dim bomb
            compId = new Array[Int](nComp); compH = new Array[Int](nComp)
            compV = new Array[Int](nComp); compTq = new Array[Int](nComp)
            var c = 0
            while (c < nComp) {
              val b = seg + 6 + 3 * c
              compId(c) = bytes(b) & 0xff
              compH(c) = (bytes(b + 1) & 0xf0) >> 4
              compV(c) = bytes(b + 1) & 0x0f
              compTq(c) = bytes(b + 2) & 0xff
              if (compH(c) < 1 || compH(c) > 4 || compV(c) < 1 ||
                  compV(c) > 4 || compTq(c) > 3) return None
              c += 1
            }
          case 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
               0xcd | 0xce | 0xcf =>
            return None // progressive/lossless/arithmetic: out of scope
          case 0xdd => // DRI
            restartInterval = u16(bytes, seg)
          case 0xda => // SOS -> decode the scan and return
            if (compId == null) return None
            val ns = bytes(seg) & 0xff
            if (ns != nComp) return None // single interleaved scan only
            val scanDc = new Array[Int](nComp)
            val scanAc = new Array[Int](nComp)
            var i = 0
            while (i < ns) {
              val cs = bytes(seg + 1 + 2 * i) & 0xff
              val ci = compId.indexOf(cs)
              if (ci < 0) return None
              scanDc(ci) = (bytes(seg + 2 + 2 * i) & 0xf0) >> 4
              scanAc(ci) = bytes(seg + 2 + 2 * i) & 0x0f
              i += 1
            }
            return decodeScan(bytes, segEnd, w, h, nComp, compId, compH,
              compV, compTq, scanDc, scanAc, qt, qtSeen, dcT, acT,
              restartInterval)
          case m if m >= 0xe0 && m <= 0xef => // APPn
          case 0xfe => // COM
          case _ => return None
        }
        if (marker != 0xda) o = segEnd
      }
    }
    None
  }

  private def decodeScan(bytes: Array[Byte], dataStart: Int, w: Int,
                         h: Int, nComp: Int, compId: Array[Int],
                         compH: Array[Int], compV: Array[Int],
                         compTq: Array[Int], scanDc: Array[Int],
                         scanAc: Array[Int], qt: Array[Array[Int]],
                         qtSeen: Array[Boolean], dcT: Array[HuffTable],
                         acT: Array[HuffTable],
                         restartInterval: Int): Option[JpegImage] = {
    val hMax = compH.max
    val vMax = compV.max
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    // per-component padded plane (mcu-aligned) + logical dims
    val planeW = Array.tabulate(nComp)(c => mcusX * compH(c) * 8)
    val planeH = Array.tabulate(nComp)(c => mcusY * compV(c) * 8)
    val logicalW = Array.tabulate(nComp)(c =>
      (w * compH(c) + hMax - 1) / hMax)
    val logicalH = Array.tabulate(nComp)(c =>
      (h * compV(c) + vMax - 1) / vMax)
    // Allocation bomb guard: the per-dimension cap alone still admits a
    // ~60-byte header declaring 16384x16384x4-component 4x4 sampling
    // (~4 GiB of Int planes). Bound the SUMMED padded samples both
    // absolutely and by the entropy data actually present (a baseline
    // block costs >= 6 bits, so samples plausibly decodable from `n`
    // bytes is O(100n); 512x leaves slack for custom tables). OOM is an
    // Error, not an Exception — it would break the quarantine contract.
    val totalSamples = (0 until nComp)
      .map(c => planeW(c).toLong * planeH(c)).sum
    if (totalSamples > (1L << 24) ||
        totalSamples > 512L * (bytes.length - dataStart).max(1)) return None
    val planes = Array.tabulate(nComp)(c =>
      new Array[Int](planeW(c) * planeH(c)))
    var c = 0
    while (c < nComp) {
      if (!qtSeen(compTq(c)) || dcT(scanDc(c)) == null ||
          acT(scanAc(c)) == null) return None
      c += 1
    }
    val r = new BitReader(bytes, dataStart)
    val dcPred = new Array[Int](nComp)
    val coef = new Array[Int](64)
    val block = new Array[Int](64)
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        if (!r.resync()) return None
        java.util.Arrays.fill(dcPred, 0)
      }
      val my = mcu / mcusX
      val mx = mcu % mcusX
      c = 0
      while (c < nComp) {
        val q = qt(compTq(c))
        var by = 0
        while (by < compV(c)) {
          var bx = 0
          while (bx < compH(c)) {
            // -- entropy-decode one block (F.2.2) --
            java.util.Arrays.fill(coef, 0)
            val s = decodeHuff(r, dcT(scanDc(c)))
            if (s < 0 || s > 11) return None
            dcPred(c) += extend(r.receive(s), s)
            coef(0) = dcPred(c) * q(0)
            var k = 1
            var open = true
            while (open && k < 64) {
              val rs = decodeHuff(r, acT(scanAc(c)))
              if (rs < 0) return None
              val run = rs >> 4
              val size = rs & 0x0f
              if (size == 0) {
                if (run == 15) k += 16 // ZRL
                else open = false      // EOB
              } else {
                k += run
                if (k > 63) return None
                coef(ZigZag(k)) = extend(r.receive(size), size) * q(k)
                k += 1
              }
            }
            if (r.truncated) return None
            idct(coef, block)
            // -- place into the component plane --
            val px = (mx * compH(c) + bx) * 8
            val py = (my * compV(c) + by) * 8
            var y = 0
            while (y < 8) {
              val rowOff = (py + y) * planeW(c) + px
              var x = 0
              while (x < 8) {
                planes(c)(rowOff + x) = block(y * 8 + x)
                x += 1
              }
              y += 1
            }
            bx += 1
          }
          by += 1
        }
        c += 1
      }
      mcu += 1
    }
    // crop padded planes to logical dims
    val out = Array.tabulate(nComp) { c0 =>
      val lw = logicalW(c0); val lh = logicalH(c0)
      val px = new Array[Int](lw * lh)
      var y = 0
      while (y < lh) {
        System.arraycopy(planes(c0), y * planeW(c0), px, y * lw, lw)
        y += 1
      }
      Plane(compId(c0), lw, lh, px)
    }
    Some(JpegImage(w, h, out))
  }

  /** Separable IDCT + level shift + clamp: coef (natural order,
    * dequantized) -> 8x8 pixels 0..255.
    */
  private def idct(coef: Array[Int], out: Array[Int]): Unit = {
    // tmp(u, y) = sum_v ct(v)(y) * F(u, v)
    val tmp = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var y = 0
      while (y < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) { s += CosT(v)(y) * coef(u * 8 + v); v += 1 }
        tmp(u * 8 + y) = s
        y += 1
      }
      u += 1
    }
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        u = 0
        while (u < 8) { s += CosT(u)(x) * tmp(u * 8 + y); u += 1 }
        val p = Math.round(s / 4.0).toInt + 128
        out(y * 8 + x) = if (p < 0) 0 else if (p > 255) 255 else p
        x += 1
      }
      y += 1
    }
  }

  // ---- encoder (single-component baseline, Annex K tables) ----

  private final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        cur = (cur << 1) | ((code >> i) & 1)
        nbits += 1
        if (nbits == 8) {
          buf.write(cur)
          if (cur == 0xff) buf.write(0x00) // byte stuffing
          cur = 0; nbits = 0
        }
        i -= 1
      }
    }
    def finish(): Array[Byte] = {
      while (nbits != 0) put(1, 1) // pad with 1s
      buf.toByteArray
    }
  }

  private def category(v: Int): Int = {
    var a = math.abs(v)
    var s = 0
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  /** Encode QUANTIZED coefficient blocks (natural order, row-major
    * block order, quant table all-ones) as a grayscale baseline JPEG.
    * `w`/`h` need not be block multiples; encoders pad with whatever the
    * caller put in the edge blocks.
    */
  def encodeGray(w: Int, h: Int, blocks: Array[Array[Int]]): Array[Byte] = {
    val bw = (w + 7) / 8
    val bh = (h + 7) / 8
    require(blocks.length == bw * bh,
      s"need $bw*$bh blocks, got ${blocks.length}")
    val dcCodes = encodeTable(StdDcBits, StdDcVals)
    val acCodes = encodeTable(StdAcBits, StdAcVals)
    val bwtr = new BitWriter
    var pred = 0
    blocks.foreach { blk =>
      // DC
      val diff = blk(0) - pred
      pred = blk(0)
      val s = category(diff)
      val (dcode, dlen) = dcCodes(s)
      bwtr.put(dcode, dlen)
      if (s > 0)
        bwtr.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
      // AC, zigzag RLE
      var k = 1
      var run = 0
      while (k < 64) {
        val v = blk(ZigZag(k))
        if (v == 0) run += 1
        else {
          while (run >= 16) {
            val (zc, zl) = acCodes(0xf0); bwtr.put(zc, zl); run -= 16
          }
          val sz = category(v)
          val (ac, al) = acCodes((run << 4) | sz)
          bwtr.put(ac, al)
          bwtr.put(if (v < 0) v + (1 << sz) - 1 else v, sz)
          run = 0
        }
        k += 1
      }
      if (run > 0) { val (ec, el) = acCodes(0x00); bwtr.put(ec, el) } // EOB
    }
    val entropy = bwtr.finish()
    val out = new java.io.ByteArrayOutputStream()
    def m(a: Int, b: Int): Unit = { out.write(a); out.write(b) }
    def w16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    m(0xff, 0xd8) // SOI
    m(0xff, 0xdb); w16(2 + 1 + 64); out.write(0x00) // DQT, all-ones
    (0 until 64).foreach(_ => out.write(1))
    m(0xff, 0xc0); w16(11); out.write(8); w16(h); w16(w) // SOF0
    out.write(1); out.write(1); out.write(0x11); out.write(0)
    m(0xff, 0xc4); w16(2 + 1 + 16 + StdDcVals.length) // DHT DC
    out.write(0x00); StdDcBits.foreach(out.write); StdDcVals.foreach(out.write)
    m(0xff, 0xc4); w16(2 + 1 + 16 + StdAcVals.length) // DHT AC
    out.write(0x10); StdAcBits.foreach(out.write); StdAcVals.foreach(out.write)
    m(0xff, 0xda); w16(8) // SOS
    out.write(1); out.write(1); out.write(0x00)
    out.write(0); out.write(63); out.write(0)
    out.write(entropy, 0, entropy.length)
    m(0xff, 0xd9) // EOI
    out.toByteArray
  }

  /** Grayscale JPEG of flat 8x8 blocks: block b is the constant value
    * `flats(b)` (0..255). DC-only coefficients decode back to the exact
    * flat values, so the decoded image is known in closed form.
    */
  def encodeGrayFlatBlocks(w: Int, h: Int,
                           flats: Array[Int]): Array[Byte] =
    encodeGray(w, h, flats.map { v =>
      val blk = new Array[Int](64)
      blk(0) = 8 * (v - 128) // orthonormal DC of a flat (v-128) block
      blk
    })

  /** 3-component 4:2:0 baseline JPEG of flat blocks — the
    * MCU-interleave + subsampling exercise for the decoder. Per MCU:
    * four flat luma blocks (raster order within the MCU) and one flat
    * block for each chroma component. Image is 16·mcusX x 16·mcusY;
    * every component keeps its own DC predictor, as the standard
    * requires.
    */
  def encode420FlatBlocks(mcusX: Int, mcusY: Int,
                          yFlats: Array[Array[Int]], cbFlats: Array[Int],
                          crFlats: Array[Int]): Array[Byte] = {
    val nMcus = mcusX * mcusY
    require(yFlats.length == nMcus && yFlats.forall(_.length == 4),
      s"need $nMcus MCUs x 4 luma flats")
    require(cbFlats.length == nMcus && crFlats.length == nMcus,
      s"need $nMcus chroma flats per component")
    val dcCodes = encodeTable(StdDcBits, StdDcVals)
    val acCodes = encodeTable(StdAcBits, StdAcVals)
    val bwtr = new BitWriter
    val pred = new Array[Int](3)
    def one(comp: Int, flat: Int): Unit = {
      val dc = 8 * (flat - 128)
      val diff = dc - pred(comp)
      pred(comp) = dc
      val s = category(diff)
      val (dcode, dlen) = dcCodes(s)
      bwtr.put(dcode, dlen)
      if (s > 0)
        bwtr.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
      val (ec, el) = acCodes(0x00)
      bwtr.put(ec, el) // EOB: DC-only block
    }
    var mi = 0
    while (mi < nMcus) {
      var b = 0
      while (b < 4) { one(0, yFlats(mi)(b)); b += 1 }
      one(1, cbFlats(mi)); one(2, crFlats(mi))
      mi += 1
    }
    val entropy = bwtr.finish()
    val w = 16 * mcusX
    val h = 16 * mcusY
    val out = new java.io.ByteArrayOutputStream()
    def m(a: Int, b: Int): Unit = { out.write(a); out.write(b) }
    def w16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    m(0xff, 0xd8) // SOI
    m(0xff, 0xdb); w16(2 + 1 + 64); out.write(0x00) // DQT, all-ones
    (0 until 64).foreach(_ => out.write(1))
    m(0xff, 0xc0); w16(2 + 6 + 9); out.write(8); w16(h); w16(w) // SOF0
    out.write(3)
    out.write(1); out.write(0x22); out.write(0) // Y: 2x2 sampling
    out.write(2); out.write(0x11); out.write(0) // Cb
    out.write(3); out.write(0x11); out.write(0) // Cr
    m(0xff, 0xc4); w16(2 + 1 + 16 + StdDcVals.length) // DHT DC
    out.write(0x00); StdDcBits.foreach(out.write); StdDcVals.foreach(out.write)
    m(0xff, 0xc4); w16(2 + 1 + 16 + StdAcVals.length) // DHT AC
    out.write(0x10); StdAcBits.foreach(out.write); StdAcVals.foreach(out.write)
    m(0xff, 0xda); w16(2 + 1 + 6 + 3) // SOS
    out.write(3)
    out.write(1); out.write(0x00)
    out.write(2); out.write(0x00)
    out.write(3); out.write(0x00)
    out.write(0); out.write(63); out.write(0)
    out.write(entropy, 0, entropy.length)
    m(0xff, 0xd9) // EOI
    out.toByteArray
  }
}
