package graft.multimodal

/** Pure-JVM GIF (87a/89a) codec — the FIFTH real image/video container
  * kernel and the second COMPRESSED image one (after JpegCodec): a real
  * header/descriptor walk (logical screen descriptor, global color
  * table, image descriptor, extension-block skipping) and a real
  * variable-code-width LZW decompressor (GIF's LSB-first bit packing,
  * clear/end codes, dictionary rebuild with the KwKwK special case,
  * 12-bit width cap, dictionary-full reset).
  *
  * Scope: single-image GIFs with a global color table, no interlace,
  * no local color tables (such payloads return None — corrupt or
  * out-of-scope blobs quarantine, they never kill a task; same
  * contract as the other codecs). The encoder emits real LZW-compressed
  * single-frame GIFs over a 256-entry grayscale palette, so decoded
  * features of synthetic payloads are known in closed form and the
  * DuckDB oracle gates the full decode path arithmetically.
  *
  * Reference behavior: GCS2Postgres has no media kernels (binary
  * columns are opaque); this extends the engine's multimodal surface
  * per SURVEY §2.2.
  */
object GifCodec {

  final case class GifImage(width: Int, height: Int,
                            palette: Array[Int],   // 0xRRGGBB per entry
                            indices: Array[Int])   // palette index per px

  // ---------------------------------------------------------------
  // decode
  // ---------------------------------------------------------------

  def decode(bytes: Array[Byte]): Option[GifImage] = {
    try decodeOrNull(bytes) match {
      case null => None
      case img  => Some(img)
    } catch { case _: Exception => None }
  }

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def u16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)

  private def decodeOrNull(b: Array[Byte]): GifImage = {
    if (b.length < 14) return null
    val sig = new String(b, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return null
    // logical screen descriptor
    val packed = u8(b, 10)
    val hasGct = (packed & 0x80) != 0
    if (!hasGct) return null // scope: global palette required
    val gctSize = 1 << ((packed & 0x07) + 1)
    var pos = 13
    val palette = new Array[Int](gctSize)
    var i = 0
    while (i < gctSize) {
      palette(i) = (u8(b, pos) << 16) | (u8(b, pos + 1) << 8) | u8(b, pos + 2)
      pos += 3; i += 1
    }
    // blocks until the image descriptor (skip extensions)
    while (true) {
      u8(b, pos) match {
        case 0x21 => // extension: label + sub-blocks
          pos += 2
          while (u8(b, pos) != 0) pos += 1 + u8(b, pos)
          pos += 1
        case 0x2C => // image descriptor
          val w = u16(b, pos + 5); val h = u16(b, pos + 7)
          val idPacked = u8(b, pos + 9)
          if ((idPacked & 0x80) != 0) return null // local color table: out of scope
          if ((idPacked & 0x40) != 0) return null // interlaced: out of scope
          pos += 10
          val minCodeSize = u8(b, pos); pos += 1
          // quarantine guards: the LZW alphabet must fit the palette
          // (else the feature extractor's palette lookup would throw),
          // the pixel buffer must be plausible for the payload —
          // LZW expands < 11000x/byte (<=8/3 codes/byte at width 3,
          // <=4095 symbols/code) — AND the pixel count must clear an
          // absolute cap: the payload-relative bound alone still lets
          // a ~190 KB blob declare ~2.1e9 pixels and allocate an ~8 GB
          // Array[Int] whose OutOfMemoryError would escape the
          // Exception quarantine. 256 Mpx (1 GiB of indices) is far
          // beyond any real GIF and keeps the allocation bounded.
          // Zero-area frames (w or h = 0) are also malformed — the
          // LZW loop would be skipped entirely and downstream feature
          // extraction would emit nonsense (min>max) over zero pixels.
          if ((1 << minCodeSize) > gctSize) return null
          if (w == 0 || h == 0) return null
          val nPixels = w.toLong * h
          if (nPixels > (1L << 28) ||
              nPixels > (b.length - pos).toLong * 11000L) return null
          val idx = lzwDecode(b, pos, minCodeSize, nPixels)
          if (idx == null) return null
          return GifImage(w, h, palette, idx)
        case 0x3B => return null // trailer before any image
        case _    => return null
      }
    }
    null
  }

  /** GIF LZW: LSB-first bit stream across 255-byte sub-blocks;
    * dictionary entries held as (prefix code, suffix byte) pairs and
    * unwound through a stack — no per-entry byte arrays, so a
    * 4096-entry dictionary costs two flat arrays regardless of how
    * deep the chains grow.
    */
  private def lzwDecode(b: Array[Byte], start: Int, minCodeSize: Int,
                        nPixels: Long): Array[Int] = {
    if (minCodeSize < 2 || minCodeSize > 11) return null
    val clear = 1 << minCodeSize
    val end = clear + 1
    val out = new Array[Int](nPixels.toInt)
    var outN = 0
    val prefix = new Array[Int](4096)
    val suffix = new Array[Int](4096)
    var nextCode = end + 1
    var width = minCodeSize + 1
    var prev = -1
    // bit reader state over sub-blocks
    var pos = start
    var blockLeft = 0
    var acc = 0L
    var accBits = 0
    val stack = new Array[Int](4096)

    def readCode(): Int = {
      while (accBits < width) {
        if (blockLeft == 0) {
          if (pos >= b.length) return -1
          blockLeft = u8(b, pos); pos += 1
          if (blockLeft == 0) return -1 // terminator hit mid-stream
        }
        if (pos >= b.length) return -1
        acc |= (u8(b, pos).toLong << accBits)
        pos += 1; blockLeft -= 1; accBits += 8
      }
      val c = (acc & ((1L << width) - 1)).toInt
      acc >>>= width; accBits -= width
      c
    }
    def emit(code: Int): Boolean = { // unwind a chain onto the output
      var n = 0; var c = code
      while (c >= clear + 2) { stack(n) = suffix(c); n += 1; c = prefix(c) }
      if (outN + n + 1 > out.length) return false
      out(outN) = c; outN += 1 // the root single-byte symbol
      while (n > 0) { n -= 1; out(outN) = stack(n); outN += 1 }
      true
    }
    def firstOf(code: Int): Int = {
      var c = code
      while (c >= clear + 2) c = prefix(c)
      c
    }

    while (outN < out.length) {
      val code = readCode()
      if (code < 0) return null
      if (code == clear) {
        nextCode = end + 1; width = minCodeSize + 1; prev = -1
      } else if (code == end) {
        return if (outN == out.length) out else null
      } else if (code < nextCode && (code < clear || code >= clear + 2)) {
        if (!emit(code)) return null
        if (prev >= 0 && nextCode < 4096) {
          prefix(nextCode) = prev; suffix(nextCode) = firstOf(code)
          nextCode += 1
          if (nextCode == (1 << width) && width < 12) width += 1
        }
        prev = code
      } else if (code == nextCode && prev >= 0 && nextCode < 4096) {
        // KwKwK: entry = prev + first(prev), created as it is used
        prefix(nextCode) = prev; suffix(nextCode) = firstOf(prev)
        nextCode += 1
        if (!emit(nextCode - 1)) return null
        if (nextCode == (1 << width) && width < 12) width += 1
        prev = nextCode - 1
      } else return null // code beyond dictionary: malformed
    }
    // pixels complete; accept with or without an explicit end code
    out
  }

  // ---------------------------------------------------------------
  // encode (synthetic-fixture side)
  // ---------------------------------------------------------------

  /** Real LZW-compressed single-frame GIF89a over a 256-entry
    * grayscale global palette (entry i = rgb(i,i,i)); `indices` are
    * row-major palette indices in [0, 256). Emits a clear code up
    * front and resets the dictionary when it fills (the decoder's
    * reset path is exercised by any image with >~3800 novel chains).
    */
  def encodeGray(w: Int, h: Int, indices: Array[Int]): Array[Byte] = {
    require(indices.length == w * h, s"${indices.length} != $w*$h")
    require(indices.forall(i => i >= 0 && i < 256),
      "palette indices must be in [0, 256)")
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    w16(w); w16(h)
    out.write(0x80 | 0x70 | 0x07) // GCT present, 8-bit resolution, 256 entries
    out.write(0); out.write(0)
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    out.write(0x2C); w16(0); w16(0); w16(w); w16(h); out.write(0)
    val minCodeSize = 8
    out.write(minCodeSize)
    out.write(lzwEncode(indices, minCodeSize))
    out.write(0)    // block terminator
    out.write(0x3B) // trailer
    out.toByteArray
  }

  private def lzwEncode(syms: Array[Int], minCodeSize: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val end = clear + 1
    val dict = new java.util.HashMap[Long, Integer]()
    var nextCode = end + 1
    var width = minCodeSize + 1
    val bytes = new java.io.ByteArrayOutputStream()
    var acc = 0L; var accBits = 0
    def flushByteIf(): Unit =
      while (accBits >= 8) {
        bytes.write((acc & 0xFF).toInt); acc >>>= 8; accBits -= 8
      }
    def put(code: Int): Unit = {
      // width covers every assigned code (the decoder mirrors this)
      while ((1 << width) < nextCode && width < 12) width += 1
      acc |= (code.toLong << accBits); accBits += width
      flushByteIf()
    }
    put(clear)
    var cur = -1
    var i = 0
    while (i < syms.length) {
      val k = syms(i)
      if (cur < 0) cur = k
      else {
        val key = (cur.toLong << 16) | k
        val hit = dict.get(key)
        if (hit != null) cur = hit.intValue()
        else {
          put(cur)
          if (nextCode < 4096) { dict.put(key, nextCode); nextCode += 1 }
          else { put(clear); dict.clear(); nextCode = end + 1; width = minCodeSize + 1 }
          cur = k
        }
      }
      i += 1
    }
    if (cur >= 0) put(cur)
    put(end)
    if (accBits > 0) bytes.write((acc & 0xFF).toInt)
    // wrap into <=255-byte sub-blocks
    val raw = bytes.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    var off = 0
    while (off < raw.length) {
      val n = math.min(255, raw.length - off)
      out.write(n); out.write(raw, off, n); off += n
    }
    out.toByteArray
  }
}
