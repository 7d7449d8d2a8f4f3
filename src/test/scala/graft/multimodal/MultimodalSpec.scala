package graft.multimodal

import graft.SparkSpec
import Multimodal._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decode pipeline: typed mapPartitions, deterministic stub features") {
    val media = Seq(
      MediaRow(1L, "image", "key agg row".getBytes("UTF-8")),
      MediaRow(2L, "audio", Array[Byte]()),
      MediaRow(3L, "image", "key agg row".getBytes("UTF-8"))).toDS()
    val feats = decodeFeatures(media).collect().sortBy(_.media_id)
    assert(feats.map(_.media_id).toSeq == Seq(1L, 2L, 3L))
    assert(feats(0).n_bytes == 11 && feats(1).n_bytes == 0)
    // determinism: same payload -> same features
    assert(feats(0).copy(media_id = 3L) == feats(2))
    assert(feats(0).magic == "6b657920")   // "key " in hex
    assert(feats(1).width == 0 && feats(1).height == 0)
  }

  test("asMedia wraps any binary-able column with kind + id") {
    val ds = asMedia(Seq((7L, "payload")).toDF("id", "data"), "id", "data", "video")
    val row = ds.head()
    assert(row.media_id == 7L && row.kind == "video")
    assert(new String(row.payload, "UTF-8") == "payload")
  }

  test("resize re-chunks deterministically; frameSample keeps every Nth") {
    val media = Seq(MediaRow(1L, "video", Array.tabulate(4096)(_.toByte))).toDS()
    val resized = resize(media, 64, 64).collect().head
    assert(resized.payload.length == 64)
    val frames = frameSample(media, everyN = 2, frameBytes = 1024)
      .collect().sortBy(_.frame_no)
    assert(frames.map(_.frame_no).toSeq == Seq(0, 2))
    assert(frames.forall(_.frame.length == 1024))
    // determinism
    val again = resize(media, 64, 64).collect().head
    assert(resized.payload.toSeq == again.payload.toSeq)
  }

  test("synthetic media from documents feeds the full pipeline") {
    val feats = decodeFeatures(syntheticMedia(spark, sf())).toDF()
    assert(feats.count() == 500)
    assert(feats.columns.toSeq == Seq("media_id", "kind", "n_bytes", "magic",
      "width", "height", "checksum"))
  }

  test("WavCodec round-trips int16 PCM exactly through a real header") {
    val samples = Array(0, 1, -1, 32767, -32768, 12345, -12345, 7)
    val wav = WavCodec.encode(samples, 16000)
    val info = WavCodec.parse(wav)
    assert(info.contains(WavInfo(1, 16000, 16, 44, 16)))
    assert(WavCodec.samples16(wav, info.get).toSeq == samples.toSeq)
  }

  test("WavCodec walks unknown chunks and rejects malformed payloads") {
    val base = WavCodec.encode(Array(5, -5, 9), 8000)
    // splice a LIST chunk between fmt and data: parse must skip it
    val list = "LIST".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    val spliced = base.take(36) ++ list ++ base.drop(36)
    // RIFF size field is unused by the walker; fix-up not needed
    val parsed = WavCodec.parse(spliced)
    assert(parsed.isDefined)
    assert(WavCodec.samples16(spliced, parsed.get).toSeq == Seq(5, -5, 9))
    // corrupt cases -> None, never a throw
    assert(WavCodec.parse(Array[Byte]()).isEmpty)
    assert(WavCodec.parse("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
    assert(WavCodec.parse(base.take(40)).isEmpty)          // truncated data
    val nonPcm = base.clone(); nonPcm(20) = 3               // IEEE float fmt
    assert(WavCodec.parse(nonPcm).isEmpty)
  }

  test("pcmWindows: features computed from genuinely decoded samples; " +
       "corrupt payloads quarantine by omission") {
    val s1 = Array(100, -200, 300, -400, 500, -600) // alternating signs
    val s2 = Array(0, 0, 7, 7)
    val media = Seq(
      MediaRow(1L, "audio", WavCodec.encode(s1, 16000)),
      MediaRow(2L, "audio", WavCodec.encode(s2, 16000)),
      MediaRow(3L, "audio", "not a wav at all".getBytes("UTF-8"))).toDS()
    val wins = pcmWindows(media, winSamples = 4, hopSamples = 2)
      .collect().sortBy(w => (w.media_id, w.win_no))
    // media 3 dropped entirely
    assert(!wins.exists(_.media_id == 3L))
    // media 1: ceil(6/2)=3 windows; window 0 covers samples 0..3
    val w0 = wins.find(w => w.media_id == 1L && w.win_no == 0).get
    assert(w0.n_samples == 4)
    assert(w0.energy == 100L*100 + 200L*200 + 300L*300 + 400L*400)
    assert(w0.zero_crossings == 3) // every adjacent pair flips sign
    assert(w0.peak_abs == 400)
    // media 2 window 0: zeros produce no sign flips (strict product < 0)
    val w2 = wins.find(w => w.media_id == 2L && w.win_no == 0).get
    assert(w2.zero_crossings == 0 && w2.energy == 2L * 49)
    // trailing window is partial
    val last1 = wins.filter(_.media_id == 1L).maxBy(_.win_no)
    assert(last1.start_sample + last1.n_samples == 6)
  }

  test("q_audio_wav pipeline: synthetic WAVs decode to the closed-form " +
       "waveform") {
    val media = syntheticWavMedia(spark, sf()).collect()
    assert(media.length == 500)
    // every blob parses and its decoded samples equal the formula
    media.take(20).foreach { m =>
      val info = WavCodec.parse(m.payload)
      assert(info.isDefined, s"media ${m.media_id} failed to parse")
      val s = WavCodec.samples16(m.payload, info.get)
      assert(s.length == 160 + (m.media_id % 200).toInt)
      s.zipWithIndex.foreach { case (v, i) =>
        val want = (((m.media_id + i.toLong * 2654435761L) % 65536L) -
          32768L).toInt
        assert(v == want, s"sample $i of media ${m.media_id}")
      }
    }
  }

  test("PpmCodec round-trips, skips comments, rejects malformed blobs") {
    val rgb = Array.tabulate(3 * 2 * 2)(i => (i * 37).toByte)
    val ppm = Multimodal.PpmCodec.encode(2, 2, rgb)
    val info = Multimodal.PpmCodec.parse(ppm)
    assert(info.contains(Multimodal.PpmCodec.PpmInfo(2, 2, ppm.length - 12)))
    // a #-comment between header fields must be skipped
    val commented = ("P6\n# made by hand\n2 2\n255\n"
      .getBytes("US-ASCII") ++ rgb)
    assert(Multimodal.PpmCodec.parse(commented)
      .map(i => (i.width, i.height)).contains((2, 2)))
    // corrupt cases -> None, never a throw
    assert(Multimodal.PpmCodec.parse(Array[Byte]()).isEmpty)
    assert(Multimodal.PpmCodec.parse("P5\n2 2\n255\n".getBytes("US-ASCII")).isEmpty)
    assert(Multimodal.PpmCodec.parse(ppm.take(ppm.length - 1)).isEmpty)  // short plane
    assert(Multimodal.PpmCodec.parse("P6\n2 2\n254\n".getBytes("US-ASCII")).isEmpty)
  }

  test("resizeNearest picks exact source pixels; resizePpm passes " +
       "non-PPM payloads through") {
    // 4x2 image with distinct per-pixel bytes; downsample to 2x1:
    // out(0,0) <- in(0,0), out(1,0) <- in(2,0)
    val rgb = Array.tabulate(3 * 4 * 2)(_.toByte)
    val ppm = Multimodal.PpmCodec.encode(4, 2, rgb)
    val info = Multimodal.PpmCodec.parse(ppm).get
    val rz = Multimodal.PpmCodec.resizeNearest(ppm, info, 2, 1)
    assert(rz.toSeq == Seq(0, 1, 2, 6, 7, 8).map(_.toByte))
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow(1L, "image", ppm),
      Multimodal.MediaRow(2L, "junk", Array[Byte](1, 2, 3))).toDS()
    val out = Multimodal.resizePpm(media, 2, 1).collect()
      .map(m => m.media_id -> m.payload).toMap
    assert(Multimodal.PpmCodec.parse(out(1L))
      .map(i => (i.width, i.height)).contains((2, 1)))
    assert(out(2L).toSeq == Seq[Byte](1, 2, 3))
  }

  test("Y4mCodec walks real frame markers, skips unknown header params, " +
       "drops a truncated final frame") {
    val fb = 4 * 2 * 3 / 2
    val f0 = Array.tabulate(fb)(i => i.toByte)
    val f1 = Array.tabulate(fb)(i => (i + 100).toByte)
    val y4m = Multimodal.Y4mCodec.encode(4, 2, Seq(f0, f1))
    val info = Multimodal.Y4mCodec.parse(y4m).get
    assert(info.width == 4 && info.height == 2 && info.frameBytes == fb)
    val offs = Multimodal.Y4mCodec.frameOffsets(y4m, info)
    assert(offs.size == 2)
    assert(y4m.slice(offs(0), offs(0) + fb).toSeq == f0.toSeq)
    assert(y4m.slice(offs(1), offs(1) + fb).toSeq == f1.toSeq)
    // unknown X param + C420mpeg2 variant: parse like a real demuxer
    val hdr2 = ("YUV4MPEG2 W4 H2 F30000:1001 Ip A0:0 C420mpeg2 " +
      "XYSCSS=420MPEG2\n").getBytes("US-ASCII")
    val body = y4m.drop(y4m.indexOf('\n') + 1)
    assert(Multimodal.Y4mCodec.parse(hdr2 ++ body)
      .map(i => (i.width, i.height)).contains((4, 2)))
    // C444 -> None; truncated final frame -> only the whole ones
    val hdr444 = "YUV4MPEG2 W4 H2 C444\n".getBytes("US-ASCII")
    assert(Multimodal.Y4mCodec.parse(hdr444 ++ body).isEmpty)
    val cut = y4m.take(y4m.length - 3)
    assert(Multimodal.Y4mCodec.frameOffsets(cut,
      Multimodal.Y4mCodec.parse(cut).get) == offs.take(1))
    assert(Multimodal.Y4mCodec.parse(Array[Byte]()).isEmpty)
    assert(Multimodal.Y4mCodec.parse("RIFF".getBytes("US-ASCII")).isEmpty)
  }

  test("q_video_y4m pipeline: every-2nd-frame plane sums from genuinely " +
       "decoded frames (spot-check against the closed form)") {
    val feats = Multimodal.y4mFrameFeatures(
        Multimodal.syntheticY4mMedia(spark, sf()), everyN = 2)
      .collect().map(x => (x.media_id, x.frame_no) -> x).toMap
    for (id <- Seq(0L, 5L, 13L)) {
      val w = (8 + (id % 5) * 2).toInt; val h = (6 + (id % 4) * 2).toInt
      val nf = (3 + id % 4).toInt
      val np = w * h
      def v(f: Int, j: Int): Long = ((id + f * 131L + j) * 2654435761L) % 256L
      val kept = (0 until nf).filter(_ % 2 == 0)
      assert(feats.keys.count(_._1 == id) == kept.size)
      for (f <- kept) {
        val row = feats((id, f))
        assert(row.sum_y == (0 until np).map(v(f, _)).sum, s"y $id/$f")
        assert(row.sum_u == (np until np + np / 4).map(v(f, _)).sum)
        assert(row.sum_v == (np + np / 4 until np * 3 / 2).map(v(f, _)).sum)
      }
    }
  }

  test("JpegCodec: flat-block JPEGs decode back to the exact values " +
       "(full marker walk + Huffman DC deltas + IDCT)") {
    // spans every DC-delta category sign/magnitude and forces byte
    // stuffing somewhere in the stream
    val flats = Array(0, 255, 1, 254, 128, 127, 129, 64, 192, 7, 250, 33)
    val bytes = JpegCodec.encodeGrayFlatBlocks(32, 24, flats) // 4x3 blocks
    val img = JpegCodec.decode(bytes).get
    assert(img.width == 32 && img.height == 24)
    val p = img.planes(0)
    assert(p.width == 32 && p.height == 24)
    for (by <- 0 until 3; bx <- 0 until 4; y <- 0 until 8; x <- 0 until 8)
      assert(p.pixels((by * 8 + y) * 32 + bx * 8 + x) == flats(by * 4 + bx),
        s"block ($bx,$by) pixel ($x,$y)")
  }

  test("JpegCodec: AC coefficients round-trip through zigzag RLE + " +
       "Huffman against an independent reference IDCT") {
    // deterministic pseudo-random quantized blocks: exercises ZRL, EOB,
    // every AC run/size path, and negative amplitudes
    val r = new java.util.Random(7)
    val blocks = Array.fill(6) {
      val b = new Array[Int](64)
      b(0) = r.nextInt(2033) - 1016 // DC within category 11 deltas
      for (_ <- 0 until 8) b(1 + r.nextInt(63)) = r.nextInt(201) - 100
      b
    }
    val img = JpegCodec.decode(JpegCodec.encodeGray(48, 8, blocks)).get
    // reference: naive O(64^2) IDCT, same rounding contract
    def refIdct(c: Array[Int]): Array[Int] = {
      def ct(u: Int, x: Int): Double = {
        val cu = if (u == 0) 1.0 / StrictMath.sqrt(2.0) else 1.0
        cu * StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 16.0)
      }
      Array.tabulate(64) { i =>
        val x = i % 8; val y = i / 8
        var s = 0.0
        for (u <- 0 until 8; v <- 0 until 8)
          s += ct(u, x) * ct(v, y) * c(u * 8 + v)
        val p = Math.round(s / 4.0).toInt + 128
        math.max(0, math.min(255, p))
      }
    }
    val p = img.planes(0)
    for (bx <- 0 until 6) {
      val want = refIdct(blocks(bx))
      for (y <- 0 until 8; x <- 0 until 8)
        assert(p.pixels(y * 48 + bx * 8 + x) == want(y * 8 + x),
          s"block $bx pixel ($x,$y)")
    }
  }

  test("JpegCodec: 4:2:0 three-component MCU interleave decodes to the " +
       "right planes, dims, and per-component DC prediction") {
    // 2x2 MCUs = 32x32 image; every block a distinct flat value
    val yF = Array(Array(10, 20, 30, 40), Array(50, 60, 70, 80),
      Array(90, 100, 110, 120), Array(130, 140, 150, 160))
    val cbF = Array(200, 210, 220, 230)
    val crF = Array(5, 15, 25, 35)
    val img = JpegCodec.decode(
      JpegCodec.encode420FlatBlocks(2, 2, yF, cbF, crF)).get
    assert(img.width == 32 && img.height == 32 && img.planes.length == 3)
    val y = img.planes(0); val cb = img.planes(1); val cr = img.planes(2)
    assert(y.width == 32 && y.height == 32)
    assert(cb.width == 16 && cb.height == 16 && cr.width == 16)
    for (my <- 0 until 2; mx <- 0 until 2) {
      val mcu = my * 2 + mx
      for (b <- 0 until 4) { // luma block b at (mx*16 + (b%2)*8, ...)
        val px = mx * 16 + (b % 2) * 8
        val py = my * 16 + (b / 2) * 8
        assert(y.pixels(py * 32 + px) == yF(mcu)(b),
          s"mcu $mcu luma block $b")
        assert(y.pixels((py + 7) * 32 + px + 7) == yF(mcu)(b))
      }
      assert(cb.pixels((my * 8) * 16 + mx * 8) == cbF(mcu), s"cb mcu $mcu")
      assert(cr.pixels((my * 8) * 16 + mx * 8) == crF(mcu), s"cr mcu $mcu")
    }
  }

  test("JpegCodec rejects malformed and out-of-scope payloads") {
    val good = JpegCodec.encodeGrayFlatBlocks(8, 8, Array(100))
    assert(JpegCodec.decode(good).isDefined)
    assert(JpegCodec.decode(Array[Byte]()).isEmpty)
    assert(JpegCodec.decode("not a jpeg".getBytes).isEmpty)
    assert(JpegCodec.decode(good.take(good.length / 2)).isEmpty) // truncated
    val progressive = good.clone()
    progressive(good.indexOfSlice(Seq(0xff.toByte, 0xc0.toByte)) + 1) =
      0xc2.toByte
    assert(JpegCodec.decode(progressive).isEmpty)
  }

  test("JpegCodec quarantines an allocation-bomb header (huge declared " +
       "dims x components x sampling) instead of OOMing the task") {
    // A tiny payload whose SOF0 declares 16384x16384, 4 components at
    // 4x4 sampling — within the per-dimension cap but ~4 GiB of Int
    // planes if allocated. The summed-samples guard must return None
    // BEFORE allocation (an OOM would be an Error, escaping the
    // quarantine contract).
    val good = JpegCodec.encodeGrayFlatBlocks(8, 8, Array(100))
    val sof = good.indexOfSlice(Seq(0xff.toByte, 0xc0.toByte))
    val out = new java.io.ByteArrayOutputStream()
    out.write(good, 0, sof) // SOI + DQT + (original SOF skipped below)
    def w16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    out.write(0xff); out.write(0xc0); w16(2 + 6 + 3 * 4) // SOF0, 4 comps
    out.write(8); w16(16384); w16(16384); out.write(4)
    for (c <- 1 to 4) { out.write(c); out.write(0x44); out.write(0) }
    // skip the original 1-component SOF (11 bytes incl. marker), keep
    // DHT + a 4-component SOS referencing ids 1..4
    val afterSof = sof + 2 + 9
    val sos = good.indexOfSlice(Seq(0xff.toByte, 0xda.toByte))
    out.write(good, afterSof, sos - afterSof)
    out.write(0xff); out.write(0xda); w16(2 + 1 + 8 + 3)
    out.write(4)
    for (c <- 1 to 4) { out.write(c); out.write(0x00) }
    out.write(0); out.write(63); out.write(0)
    out.write(0xff); out.write(0xd9)
    assert(JpegCodec.decode(out.toByteArray).isEmpty)
  }

  test("ImaAdpcmCodec: multi-block encode/decode round-trip tracks an " +
       "independent reference decoder bit for bit") {
    // a waveform with slow and fast regions (exercises index adaptation)
    val spb = 17 // odd nibble count per block: exercises the pad nibble
    val samples = Array.tabulate(4 * spb) { i =>
      (3000.0 * math.sin(i / 5.0) + 400.0 * math.sin(i * 1.7)).toInt
    }
    val wav = ImaAdpcmCodec.encode(samples, 8000, spb)
    val info = ImaAdpcmCodec.parse(wav).get
    assert(info.sampleRate == 8000 && info.samplesPerBlock == spb)
    assert(info.blockAlign == 4 + (spb - 1 + 1) / 2)
    val decoded = ImaAdpcmCodec.decode(wav, info)
    assert(decoded.length == samples.length)
    // independent reference: re-run the public-spec arithmetic directly
    // over the packed nibble bytes (separate implementation from
    // ImaAdpcmCodec.step's — table lookups inlined)
    val stepT = ImaAdpcmCodec.StepTable
    val ref = new scala.collection.mutable.ArrayBuffer[Int]()
    for (k <- 0 until 4) {
      val base = info.dataOffset + k * info.blockAlign
      var pred = ((wav(base) & 0xff) | ((wav(base + 1) & 0xff) << 8))
        .toShort.toInt
      var idx = wav(base + 2) & 0xff
      ref += pred
      for (n <- 0 until spb - 1) {
        val byte = wav(base + 4 + n / 2) & 0xff
        val nib = if (n % 2 == 0) byte & 0x0f else byte >> 4
        val st = stepT(idx)
        var d = st / 8
        if ((nib & 1) != 0) d += st / 4
        if ((nib & 2) != 0) d += st / 2
        if ((nib & 4) != 0) d += st
        pred = math.max(-32768, math.min(32767,
          if ((nib & 8) != 0) pred - d else pred + d))
        idx = math.max(0, math.min(88,
          idx + Array(-1, -1, -1, -1, 2, 4, 6, 8)(nib & 7)))
        ref += pred
      }
    }
    assert(decoded.toSeq == ref.toSeq)
    // lossy but adaptive: early samples pay the step-size ramp from
    // index 0 (bounded by the quantizer range), and once the index has
    // adapted the reconstruction tracks the waveform closely — check
    // the last block, whose header re-anchors the predictor exactly
    // and inherits the converged index
    val errs = samples.zip(decoded).map(p => math.abs(p._1 - p._2))
    assert(errs.max < 4096, s"ADPCM tracking error ${errs.max}")
    assert(errs.drop(3 * spb).max < 1500,
      s"converged-block tracking error ${errs.drop(3 * spb).max}")
  }

  test("ImaAdpcmCodec rejects malformed payloads; corrupt block index " +
       "quarantines the block, not the clip") {
    val good = ImaAdpcmCodec.encodeRawBlock(100, 5,
      Array.fill(10)(3), 8000)
    assert(ImaAdpcmCodec.parse(good).isDefined)
    assert(ImaAdpcmCodec.parse(Array[Byte]()).isEmpty)
    assert(ImaAdpcmCodec.parse(good.take(20)).isEmpty)
    // PCM WAVs are NOT ADPCM payloads (and vice versa)
    val pcm = WavCodec.encode(Array(1, 2, 3), 8000)
    assert(ImaAdpcmCodec.parse(pcm).isEmpty)
    assert(WavCodec.parse(good).isEmpty)
    // an out-of-range step index (> 88) drops that block's samples
    val info = ImaAdpcmCodec.parse(good).get
    val bad = good.clone()
    bad(info.dataOffset + 2) = 120.toByte
    assert(ImaAdpcmCodec.decode(bad, info).isEmpty)
  }

  test("q_audio_adpcm pipeline: features come from genuinely decoded " +
       "nibble streams (spot-check against the recurrence)") {
    val media = Multimodal.syntheticAdpcmMedia(spark, sf())
    val feats = Multimodal.adpcmFeatures(media).collect()
      .map(x => x.media_id -> x).toMap
    assert(feats.size == 500)
    for (id <- Seq(0L, 7L, 23L, 88L)) {
      val nn = (120 + (id % 60) * 2).toInt
      var pred = (((id * 2654435761L) % 65536L) - 32768L).toInt
      var idx = (id % 89).toInt
      val ss = scala.collection.mutable.ArrayBuffer(pred)
      for (j <- 0 until nn) {
        val nib = ((id + j.toLong * 2654435761L) % 16L).toInt
        val (p, i) = ImaAdpcmCodec.step(nib, pred, idx)
        pred = p; idx = i
        ss += pred
      }
      val row = feats(id)
      assert(row.n_samples == nn + 1)
      assert(row.sum_s == ss.map(_.toLong).sum)
      assert(row.energy == ss.map(s => s.toLong * s).sum)
      assert(row.peak_abs == ss.map(math.abs).max)
      assert(row.zero_crossings ==
        ss.sliding(2).count(w => w(0).toLong * w(1) < 0))
    }
  }

  test("AviCodec: encodeMjpeg builds a real RIFF the parser and chunk " +
       "walker round-trip, frames decode via JpegCodec") {
    val f0 = JpegCodec.encodeGrayFlatBlocks(16, 8, Array(10, 200))
    val f1 = JpegCodec.encodeGrayFlatBlocks(16, 8, Array(77, 3))
    val avi = AviCodec.encodeMjpeg(16, 8, 25, Seq(f0, f1))
    val info = AviCodec.parse(avi).get
    assert(info.width == 16 && info.height == 8)
    val chunks = AviCodec.frameChunks(avi, info)
    assert(chunks.size == 2)
    // each chunk is byte-identical to the source JPEG and decodes back
    // to the exact flat values
    val payloads = chunks.map { case (o, l) =>
      java.util.Arrays.copyOfRange(avi, o, o + l) }
    assert(payloads(0).toSeq == f0.toSeq && payloads(1).toSeq == f1.toSeq)
    val img = JpegCodec.decode(payloads(1)).get
    assert(img.planes(0).pixels(0) == 77 && img.planes(0).pixels(8) == 3)
    // odd-length frame payloads get a pad byte; the walker still lands
    // on the next chunk boundary
    assert(f0.length % 2 == 1 || f1.length % 2 == 1 ||
      chunks(1)._1 % 2 == 0) // at least exercise alignment arithmetic
  }

  test("AviCodec rejects malformed and non-MJPEG containers; rec-list " +
       "nesting and trailing garbage are handled") {
    val f = JpegCodec.encodeGrayFlatBlocks(8, 8, Array(50))
    val good = AviCodec.encodeMjpeg(8, 8, 25, Seq(f))
    assert(AviCodec.parse(Array[Byte]()).isEmpty)
    assert(AviCodec.parse("RIFFxxxxWAVE".getBytes).isEmpty)
    assert(AviCodec.parse(good.take(good.length / 3)).isEmpty) // truncated
    // flip the strh handler + strf biCompression away from MJPG
    val bad = good.clone()
    var changed = 0
    var i = 0
    while (i + 4 <= bad.length) {
      if (bad(i) == 'M' && bad(i + 1) == 'J' && bad(i + 2) == 'P' &&
          bad(i + 3) == 'G') { bad(i) = 'X'; changed += 1 }
      i += 1
    }
    assert(changed >= 2 && AviCodec.parse(bad).isEmpty)
    // a 'LIST rec ' wrapping the frame chunk still yields the frame
    val info = AviCodec.parse(good).get
    val inner = java.util.Arrays.copyOfRange(good, info.moviStart,
      info.moviEnd)
    val rec = new java.io.ByteArrayOutputStream()
    def w32(v: Int): Unit = { rec.write(v & 0xff); rec.write((v >> 8) & 0xff)
      rec.write((v >> 16) & 0xff); rec.write((v >> 24) & 0xff) }
    rec.write("LIST".getBytes); w32(4 + inner.length)
    rec.write("rec ".getBytes); rec.write(inner)
    val wrapped = AviCodec.AviInfo(8, 8, 0, rec.size())
    val got = AviCodec.frameChunks(rec.toByteArray, wrapped)
    assert(got.size == 1 && got.head._2 == f.length)
  }

  test("q_video_mjpeg pipeline: features come from genuinely decoded " +
       "compressed frames (spot-check against the closed form)") {
    val media = Multimodal.syntheticMjpegMedia(spark, sf())
    val feats = Multimodal.mjpegFrameFeatures(media, everyN = 2).collect()
      .map(x => (x.media_id, x.frame_no) -> x).toMap
    for (id <- Seq(0L, 7L, 23L)) {
      val bw = (1 + id % 3).toInt; val bh = (1 + id % 2).toInt
      val nf = (2 + id % 3).toInt
      for (fno <- 0 until nf if fno % 2 == 0) {
        def v(b: Int): Long = ((id + fno * 131L + b * 17L) * 2654435761L) % 256L
        val row = feats((id, fno))
        assert(row.width == bw * 8 && row.height == bh * 8)
        assert(row.sum_y == (0 until bw * bh).map(b => 64L * v(b)).sum)
        assert(row.min_y == (0 until bw * bh).map(v).min)
        assert(row.max_y == (0 until bw * bh).map(v).max)
      }
    }
    // frame count: ceil(nf / 2) rows per clip over 500 docs
    val expect = (0L until 500L).map(id => (2 + id % 3 + 1) / 2).sum
    assert(feats.size == expect)
  }

  test("q_image_jpeg pipeline: features come from genuinely decoded " +
       "JPEGs (spot-check against the closed form)") {
    val media = Multimodal.syntheticJpegMedia(spark, sf())
    val f = Multimodal.jpegFeatures(media).collect()
      .map(x => x.media_id -> x).toMap
    assert(f.size == 500)
    for (id <- Seq(0L, 7L, 23L)) {
      val bw = (1 + id % 3).toInt; val bh = (1 + id % 2).toInt
      def v(b: Int): Long = ((id + b * 131L) * 2654435761L) % 256L
      val row = f(id)
      assert(row.width == bw * 8 && row.height == bh * 8)
      assert(row.sum_y == (0 until bw * bh).map(b => 64L * v(b)).sum)
      assert(row.min_y == (0 until bw * bh).map(v).min)
      assert(row.max_y == (0 until bw * bh).map(v).max)
    }
  }

  test("q_image_ppm pipeline: features come from genuinely decoded " +
       "pixels (spot-check against the closed form)") {
    val media = Multimodal.syntheticPpmMedia(spark, sf())
    val f = Multimodal.ppmFeatures(media).collect()
      .map(x => x.media_id -> x).toMap
    assert(f.size == 500)
    for (id <- Seq(0L, 7L, 23L)) {
      val w = (8 + id % 9).toInt; val h = (6 + id % 7).toInt
      def v(p: Int, c: Int): Long = ((id + p * 3 + c) * 2654435761L) % 256L
      val row = f(id)
      assert(row.width == w && row.height == h)
      assert(row.sum_r == (0 until w * h).map(p => v(p, 0)).sum)
      assert(row.sum_g == (0 until w * h).map(p => v(p, 1)).sum)
      assert(row.sum_b == (0 until w * h).map(p => v(p, 2)).sum)
    }
  }

  test("dHash: brightness-shift invariance, resolution invariance, and " +
       "sensitivity to real content change") {
    val w = 16; val h = 12
    val base = Array.tabulate(w * h)(p =>
      (((7L + p * 11L) * 2654435761L) % 200L).toInt)
    val bright = base.map(_ + 40) // still < 256, no clamp
    val hBase = Multimodal.dHashBits(w, h, base)
    assert(Multimodal.dHashBits(w, h, bright) == hBase,
      "global brightness shift must not move any gradient sign")
    // resolution invariance: 2x nearest-neighbor upscale samples the
    // same source pixels on the 9x7 grid
    val up = Array.tabulate(2 * w * 2 * h) { p =>
      val y = p / (2 * w); val x = p % (2 * w)
      base((y / 2) * w + (x / 2))
    }
    // upscaled grid sample (r*2h/7)/2 rows may differ by rounding; the
    // hashes must still be NEAR (gradient grid is coarse): <= 8/56 bits
    val dUp = java.lang.Long.bitCount(
      Multimodal.dHashBits(2 * w, 2 * h, up) ^ hBase)
    assert(dUp <= 8, s"2x upscale moved $dUp/56 bits")
    // content sensitivity: an unrelated image is far (~28 bits)
    val other = Array.tabulate(w * h)(p =>
      (((1234L + p * 13L) * 2654435761L) % 200L).toInt)
    val dOther = java.lang.Long.bitCount(
      Multimodal.dHashBits(w, h, other) ^ hBase)
    assert(dOther > 10, s"unrelated image only $dOther bits away")
  }

  test("nearDupImagePairs: planted twins found at distance 0 and the " +
       "banded plan equals brute force at radius 3 (pigeonhole recall)") {
    val media = Multimodal.syntheticPngNearDupMedia(spark, sf())
    val hashes = Multimodal.pngDHashes(media).toDF()
    val pairs = Multimodal.nearDupImagePairs(hashes, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // every planted twin (id-5, id) for id % 10 == 7 at distance 0
    val ids = media.select("media_id").as[Long](
      org.apache.spark.sql.Encoders.scalaLong).collect().toSet
    val planted = ids.filter(id => id % 10 == 7 && ids.contains(id - 5))
      .map(id => (id - 5, id))
    val zeroPairs = pairs.filter(_._3 == 0).map(p => (p._1, p._2)).toSet
    assert(planted.subsetOf(zeroPairs),
      s"missing twins: ${planted -- zeroPairs}")
    // brute-force equality (the recall law)
    val hs = hashes.collect().map(r => r.getLong(0) -> r.getLong(1))
    val brute = (for {
      (i1, d1) <- hs; (i2, d2) <- hs if i1 < i2
      dist = java.lang.Long.bitCount(d1 ^ d2) if dist <= 3
    } yield (i1, i2, dist)).toSet
    assert(pairs.toSet == brute)
  }

  test("audio fingerprint: exact volume scaling is invariant, content " +
       "change is not, and empty streams quarantine") {
    val base = Array.tabulate(400)(i =>
      ((((7L + i * 2654435761L) % 16000L) - 8000L)).toInt)
    val fp = Multimodal.audioFpBits(base)
    // 2x volume doubles every window energy exactly -> same signs
    assert(Multimodal.audioFpBits(base.map(_ * 2)) == fp)
    // different waveform is far
    val other = Array.tabulate(400)(i =>
      ((((991L + i * 1315423911L) % 16000L) - 8000L)).toInt)
    assert(java.lang.Long.bitCount(
      Multimodal.audioFpBits(other) ^ fp) > 10)
    // an empty WAV never emits a row
    import spark.implicits._
    val empty = Seq(Multimodal.MediaRow(1L, "audio",
      Multimodal.WavCodec.encode(Array.empty[Int], 16000))).toDS()
    assert(Multimodal.audioFingerprints(empty).count() == 0L)
  }
}
