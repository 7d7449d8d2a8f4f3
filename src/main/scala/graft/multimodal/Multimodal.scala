package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, decoded/feature-extracted in
  * batched per-partition passes.
  *
  * The Spark-side plumbing (schema, partitioning, batch shape, typed
  * mapPartitions signature) is real and tested, and SIX kernels are
  * REAL pure-JVM codecs, oracle-gated end-to-end: [[WavCodec]]
  * (WAV/PCM), [[PpmCodec]] (binary PPM), [[Y4mCodec]] (uncompressed
  * video), [[JpegCodec]] (compressed images: baseline JPEG Huffman +
  * IDCT), [[AviCodec]] (compressed video: MJPEG-in-AVI), and
  * [[ImaAdpcmCodec]] (compressed audio: IMA ADPCM) — every media
  * family (raw/compressed x image/audio/video) has a real decode
  * path. `StubDecoder` survives only as the generic-dataflow stand-in
  * for formats whose codecs are foreign-library territory (H.264,
  * MP3): in production that decode body is a JNI/javacpp call, the
  * dataflow does not change.
  *
  * Scale design: decode runs inside `mapPartitions`, so each task decodes
  * its partition's blobs in one JVM pass without per-row UDF setup cost;
  * `repartition(n)` upstream sizes decode tasks to codec throughput, and
  * the output is columnar (case-class encoder) for downstream pushdown.
  */
object Multimodal {

  /** A media payload row: opaque bytes + declared kind and source id. */
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  /** Null-safe payload view: a NULL payload (corrupt/quarantined source
    * row) is empty bytes, not a task-killing NPE inside mapPartitions.
    */
  private def bytesOf(m: MediaRow): Array[Byte] =
    if (m.payload == null) Array.emptyByteArray else m.payload

  /** Doc-id fan-out base shared by every synthetic media fixture: the
    * projection is bytes-tiny but each row becomes a CPU-heavy
    * encode+decode, so [[graft.engine.Spread]] lifts it to cluster
    * width — a single-file corpus otherwise caps every codec at
    * scan-task byte sizing (measured 6.8x on FLAC at sf1: 7.3 → 1.1 s).
    */
  private def fixtureDocIds(spark: SparkSession,
                            sfDir: String): Dataset[Long] = {
    import spark.implicits._
    graft.engine.Spread(
        spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id")))
      .as[Long]
  }

  /** Extracted features: deterministic metadata a real decoder would
    * produce (dimensions, duration, channel stats, ...).
    */
  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long,
      magic: String, width: Int, height: Int, checksum: Long)

  /** STUB decoder — deterministic fake standing in for codecs this
    * engine does NOT implement natively (H.264/MP3 and other
    * foreign-library A/V formats). Reads "dimensions" from payload
    * bytes so results are stable and testable. Replace `decode` with
    * the real library call in prod. Every media family has a REAL
    * pure-JVM kernel alongside: [[WavCodec]] (PCM audio), [[PpmCodec]]
    * (raw RGB), [[Y4mCodec]] (uncompressed video), [[JpegCodec]]
    * (compressed images), [[AviCodec]] (compressed video, MJPEG), and
    * [[ImaAdpcmCodec]] (compressed audio).
    */
  object StubDecoder {
    def decode(row: MediaRow): MediaFeatures = {
      val bytes = bytesOf(row)
      val magic = bytes.take(4).map(b => f"${b & 0xff}%02x").mkString
      // fake dims derived from content — a real decoder parses the header
      val w = if (bytes.length >= 2) ((bytes(0) & 0xff) << 8 | (bytes(1) & 0xff)) % 4096 else 0
      val h = if (bytes.length >= 4) ((bytes(2) & 0xff) << 8 | (bytes(3) & 0xff)) % 4096 else 0
      // modular polynomial hash (not wrapping): keeps the value
      // reproducible in engines whose int64 ops trap on overflow
      var sum = 0L
      var i = 0
      while (i < bytes.length) {
        sum = (31 * sum + (bytes(i) & 0xff)) % 1000000007L
        i += 1
      }
      MediaFeatures(row.media_id, row.kind, bytes.length.toLong, magic, w, h, sum)
    }
  }

  /** Batched per-partition decode: the production dataflow shape.
    * One decoder context per task (the `iter =>` prologue is where a real
    * codec would allocate), columnar output via the case-class encoder.
    */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { iter =>
      // real codec: allocate decoder context here, once per task
      iter.map(StubDecoder.decode)
    }
  }

  /** A single sampled frame from a video payload. */
  final case class FrameRow(media_id: Long, frame_no: Int, frame: Array[Byte])

  /** Resize: same batched mapPartitions dataflow as decode. The STUB
    * "resampler" deterministically re-chunks payload bytes to the target
    * dimensions; a real implementation swaps only the body of `resample`.
    */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    def resample(bytes: Array[Byte]): Array[Byte] = {
      // real codec: decode -> scale(w, h) -> encode. Stub: deterministic
      // re-chunk to ceil(w*h/64) bytes sampled evenly from the source.
      val n = math.max(1, w * h / 64)
      if (bytes.isEmpty) bytes
      else Array.tabulate(n)(i => bytes((i.toLong * bytes.length / n).toInt))
    }
    media.mapPartitions { iter =>
      // real codec context allocated here, once per task
      iter.map(m => m.copy(payload = resample(bytesOf(m))))
    }
  }

  /** Frame sampling: one output row per kept frame (every `everyN`-th of
    * the payload's fixed-size frame chunks) — the flatMap dataflow a video
    * pipeline needs; frame decode itself is the STUB chunker.
    */
  def frameSample(videos: Dataset[MediaRow], everyN: Int,
                  frameBytes: Int = 1024): Dataset[FrameRow] = {
    import videos.sparkSession.implicits._
    require(everyN > 0 && frameBytes > 0,
      s"everyN and frameBytes must be positive, got $everyN/$frameBytes")
    videos.mapPartitions { iter =>
      iter.flatMap { m =>
        val pay = bytesOf(m)
        val nFrames = (pay.length + frameBytes - 1) / frameBytes
        (0 until nFrames by everyN).iterator.map { f =>
          val from = f * frameBytes
          val until = math.min(from + frameBytes, pay.length)
          FrameRow(m.media_id, f, java.util.Arrays.copyOfRange(
            pay, from, until))
        }
      }
    }
  }

  /** Per-frame features (size + modular polynomial checksum) — the
    * deterministic stand-in for per-frame embedding extraction; same
    * batched mapPartitions dataflow as `decodeFeatures`.
    */
  final case class FrameFeatures(
      media_id: Long, frame_no: Int, n_bytes: Long, checksum: Long)

  def frameFeatures(frames: Dataset[FrameRow]): Dataset[FrameFeatures] = {
    import frames.sparkSession.implicits._
    frames.mapPartitions { iter =>
      iter.map { f =>
        var sum = 0L
        var i = 0
        while (i < f.frame.length) {
          sum = (31 * sum + (f.frame(i) & 0xff)) % 1000000007L
          i += 1
        }
        FrameFeatures(f.media_id, f.frame_no, f.frame.length.toLong, sum)
      }
    }
  }

  /** One analysis window over an audio payload (STFT-style layout:
    * fixed window length, fixed hop, trailing partial window kept).
    */
  final case class AudioWindow(
      media_id: Long, win_no: Int, start_byte: Long, n_bytes: Long,
      amp_sum: Long, peak: Int, checksum: Long)

  /** Overlapping fixed-size windows over audio payloads — the
    * frame/hop dataflow every audio featurizer (STFT, VAD, fingerprint)
    * needs. Window starts at k*hopBytes for every k with a start inside
    * the payload; the stub "features" are exact integer byte stats
    * (amplitude sum, peak, modular polynomial checksum) standing in for
    * the real DSP kernel, which would replace only the loop body.
    */
  def audioWindows(audio: Dataset[MediaRow], winBytes: Int,
                   hopBytes: Int): Dataset[AudioWindow] = {
    import audio.sparkSession.implicits._
    require(winBytes > 0 && hopBytes > 0)
    audio.mapPartitions { iter =>
      // real DSP context (FFT plan, codec) would be allocated here
      iter.flatMap { m =>
        val pay = bytesOf(m)
        val n = pay.length
        val nWins = if (n == 0) 0 else (n + hopBytes - 1) / hopBytes
        (0 until nWins).iterator.map { k =>
          val from = k * hopBytes
          val until = math.min(from + winBytes, n)
          var sum = 0L; var chk = 0L; var peak = 0; var i = from
          while (i < until) {
            val b = pay(i) & 0xff
            sum += b
            if (b > peak) peak = b
            chk = (31 * chk + b) % 1000000007L
            i += 1
          }
          AudioWindow(m.media_id, k, from.toLong, (until - from).toLong,
            sum, peak, chk)
        }
      }
    }
  }

  /** REAL pure-JVM WAV/PCM codec (no external libraries): RIFF chunk
    * walker + 16-bit little-endian PCM sample decode/encode. This is the
    * one multimodal kernel that is NOT a stub — `pcmWindows` features
    * come from genuinely decoded samples.
    */
  final case class WavInfo(numChannels: Int, sampleRate: Int,
                           bitsPerSample: Int, dataOffset: Int,
                           dataBytes: Int)

  object WavCodec {
    private def le16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def le32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    private def tag(b: Array[Byte], o: Int): String =
      new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** Parse a RIFF/WAVE header by walking chunks ("fmt " and "data";
      * unknown chunks like LIST/INFO are skipped, odd chunk sizes are
      * padded per spec). Returns None for anything malformed — corrupt
      * payloads quarantine as missing rows, never task failures.
      */
    def parse(bytes: Array[Byte]): Option[WavInfo] = {
      if (bytes.length < 44 || tag(bytes, 0) != "RIFF" ||
        tag(bytes, 8) != "WAVE") return None
      var off = 12
      var fmt: Option[(Int, Int, Int)] = None
      var data: Option[(Int, Int)] = None
      while (off + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
        val id = tag(bytes, off)
        val sz = le32(bytes, off + 4)
        if (sz < 0 || off + 8 + sz > bytes.length) return None
        id match {
          case "fmt " =>
            if (sz < 16) return None
            val audioFormat = le16(bytes, off + 8)
            if (audioFormat != 1) return None // PCM only
            fmt = Some((le16(bytes, off + 10), le32(bytes, off + 12),
              le16(bytes, off + 22)))
          case "data" => data = Some((off + 8, sz))
          case _ => () // skip LIST/INFO/fact/...
        }
        off += 8 + sz + (sz & 1) // odd sizes are padded
      }
      for {
        (ch, rate, bits) <- fmt
        (dOff, dSz) <- data
        if ch >= 1 && bits == 16 && rate > 0
      } yield WavInfo(ch, rate, bits, dOff, dSz)
    }

    /** Decode the data chunk to int16 samples (interleaved if stereo). */
    def samples16(bytes: Array[Byte], info: WavInfo): Array[Int] = {
      val n = info.dataBytes / 2
      Array.tabulate(n)(i =>
        le16(bytes, info.dataOffset + 2 * i).toShort.toInt)
    }

    /** Encode mono 16-bit PCM to a well-formed WAV blob. */
    def encode(samples: Array[Int], sampleRate: Int): Array[Byte] = {
      val dataBytes = samples.length * 2
      val out = new Array[Byte](44 + dataBytes)
      def put32(o: Int, v: Int): Unit = {
        out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
        out(o + 2) = (v >> 16).toByte; out(o + 3) = (v >> 24).toByte
      }
      def put16(o: Int, v: Int): Unit = {
        out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
      }
      def putTag(o: Int, s: String): Unit =
        s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
          .copyToArray(out, o)
      putTag(0, "RIFF"); put32(4, 36 + dataBytes); putTag(8, "WAVE")
      putTag(12, "fmt "); put32(16, 16); put16(20, 1); put16(22, 1)
      put32(24, sampleRate); put32(28, sampleRate * 2) // byte rate
      put16(32, 2); put16(34, 16) // block align, bits
      putTag(36, "data"); put32(40, dataBytes)
      var i = 0
      while (i < samples.length) {
        put16(44 + 2 * i, samples(i) & 0xffff); i += 1
      }
      out
    }
  }

  /** One sample-domain analysis window over decoded PCM audio. All
    * features are exact integer math on the decoded int16 samples:
    * energy = Σ s², zero_crossings = |{i : s[i−1]·s[i] < 0}|, peak_abs =
    * max |s| — engine-portable, no floats.
    */
  final case class PcmWindow(
      media_id: Long, win_no: Int, start_sample: Long, n_samples: Long,
      energy: Long, zero_crossings: Long, peak_abs: Int)

  /** Windowed features over REAL decoded WAV payloads: parse the RIFF
    * header, decode int16 PCM, then window over SAMPLES (not bytes) with
    * the same frame/hop layout as [[audioWindows]]. Malformed payloads
    * are dropped (quarantine-by-omission — the parse is the validity
    * gate). Same batched mapPartitions scale shape as every codec here.
    */
  def pcmWindows(audio: Dataset[MediaRow], winSamples: Int,
                 hopSamples: Int): Dataset[PcmWindow] = {
    import audio.sparkSession.implicits._
    require(winSamples > 0 && hopSamples > 0)
    audio.mapPartitions { iter =>
      iter.flatMap { m =>
        val bytes = bytesOf(m)
        WavCodec.parse(bytes).iterator.flatMap { info =>
          val s = WavCodec.samples16(bytes, info)
          val n = s.length
          val nWins = if (n == 0) 0 else (n + hopSamples - 1) / hopSamples
          (0 until nWins).iterator.map { k =>
            val from = k * hopSamples
            val until = math.min(from + winSamples, n)
            var energy = 0L; var zc = 0L; var peak = 0; var i = from
            while (i < until) {
              val v = s(i)
              energy += v.toLong * v
              val a = if (v < 0) -v else v
              if (a > peak) peak = a
              if (i > from && (s(i - 1).toLong * v) < 0) zc += 1
              i += 1
            }
            PcmWindow(m.media_id, k, from.toLong, (until - from).toLong,
              energy, zc, peak)
          }
        }
      }
    }
  }

  /** Deterministic synthetic WAV corpus: one mono 16 kHz blob per
    * document, samples from the closed-form waveform
    * s(id, i) = ((id + i·2654435761) mod 65536) − 32768 so an external
    * oracle can recompute every decoded sample without parsing bytes.
    * The blobs are REAL WAVs (header-walked by [[WavCodec.parse]]).
    */
  def syntheticWavMedia(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    fixtureDocIds(spark, sfDir)
      .mapPartitions { iter =>
        iter.map { id =>
          val n = (160 + id % 200).toInt
          val samples = Array.tabulate(n)(i =>
            (((id + i.toLong * 2654435761L) % 65536L) - 32768L).toInt)
          MediaRow(id, "audio", WavCodec.encode(samples, 16000))
        }
      }
  }

  /** Pure-JVM PPM (P6, 8-bit) codec — the SECOND non-stub multimodal
    * kernel next to [[WavCodec]]: binary PPM is header-plus-raw-RGB, so
    * decode, nearest-neighbor resize, and re-encode are exact integer
    * work with no image library. Real decoders for compressed formats
    * swap in behind the same parse/pixels surface.
    */
  object PpmCodec {
    final case class PpmInfo(width: Int, height: Int, dataOffset: Int)

    def encode(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
      require(rgb.length == 3 * w * h,
        s"rgb length ${rgb.length} != 3*$w*$h")
      val hdr = s"P6\n$w $h\n255\n"
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val out = new Array[Byte](hdr.length + rgb.length)
      System.arraycopy(hdr, 0, out, 0, hdr.length)
      System.arraycopy(rgb, 0, out, hdr.length, rgb.length)
      out
    }

    /** Header walk: "P6", then width/height/maxval as ASCII ints
      * separated by whitespace (with #-comment lines), then ONE
      * whitespace byte before the raw RGB plane. None on any
      * malformation — corrupt blobs quarantine, they don't kill tasks.
      */
    def parse(bytes: Array[Byte]): Option[PpmInfo] = {
      if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') return None
      var o = 2
      def isWs(b: Byte) =
        b == ' ' || b == '\n' || b == '\r' || b == '\t'
      def skipWs(): Unit = {
        var more = true
        while (more && o < bytes.length) {
          if (bytes(o) == '#') {
            while (o < bytes.length && bytes(o) != '\n') o += 1
          } else if (isWs(bytes(o))) o += 1
          else more = false
        }
      }
      def readInt(): Int = {
        skipWs()
        var v = 0; var any = false
        while (o < bytes.length && bytes(o) >= '0' && bytes(o) <= '9') {
          v = v * 10 + (bytes(o) - '0'); o += 1; any = true
          if (v > (1 << 24)) return -1 // dimension bomb guard
        }
        if (any) v else -1
      }
      val w = readInt(); val h = readInt(); val mx = readInt()
      if (w <= 0 || h <= 0 || mx != 255) return None
      if (o >= bytes.length || !isWs(bytes(o))) return None
      o += 1
      if (bytes.length - o < 3L * w * h) None else Some(PpmInfo(w, h, o))
    }

    /** Nearest-neighbor resample to (w2, h2): out(x, y) =
      * in((x*W)/w2, (y*H)/h2), integer division — the deterministic
      * resize every engine reproduces exactly.
      */
    def resizeNearest(bytes: Array[Byte], info: PpmInfo,
                      w2: Int, h2: Int): Array[Byte] = {
      val out = new Array[Byte](3 * w2 * h2)
      var y = 0
      while (y < h2) {
        val sy = y * info.height / h2
        var x = 0
        while (x < w2) {
          val sx = x * info.width / w2
          val so = info.dataOffset + 3 * (sy * info.width + sx)
          val do_ = 3 * (y * w2 + x)
          out(do_) = bytes(so); out(do_ + 1) = bytes(so + 1)
          out(do_ + 2) = bytes(so + 2)
          x += 1
        }
        y += 1
      }
      out
    }
  }

  /** Integer-exact image features from a decoded PPM: dimensions,
    * per-channel sums, and a horizontal luma-edge count (adjacent
    * pixels whose integer luma (299r+587g+114b)/1000 differs by > 64).
    */
  final case class ImageFeatures(
      media_id: Long, width: Int, height: Int,
      sum_r: Long, sum_g: Long, sum_b: Long, hedges: Long)

  /** Batched per-partition PPM decode + feature extraction — same
    * dataflow as [[pcmWindows]]; blobs `PpmCodec.parse` rejects are
    * dropped (quarantine path), not task failures.
    */
  def ppmFeatures(images: Dataset[MediaRow]): Dataset[ImageFeatures] = {
    import images.sparkSession.implicits._
    images.mapPartitions { iter =>
      iter.flatMap { m =>
        val bytes = bytesOf(m)
        PpmCodec.parse(bytes).iterator.map { info =>
          var sr = 0L; var sg = 0L; var sb = 0L; var edges = 0L
          val w = info.width; val h = info.height; val off = info.dataOffset
          def luma(p: Int): Int = {
            val o = off + 3 * p
            (299 * (bytes(o) & 0xff) + 587 * (bytes(o + 1) & 0xff) +
              114 * (bytes(o + 2) & 0xff)) / 1000
          }
          var p = 0
          val np = w * h
          while (p < np) {
            val o = off + 3 * p
            sr += (bytes(o) & 0xff); sg += (bytes(o + 1) & 0xff)
            sb += (bytes(o + 2) & 0xff)
            if (p % w < w - 1 && math.abs(luma(p) - luma(p + 1)) > 64)
              edges += 1
            p += 1
          }
          ImageFeatures(m.media_id, w, h, sr, sg, sb, edges)
        }
      }
    }
  }

  /** REAL resize for PPM payloads: parse -> nearest-neighbor -> encode,
    * media in / media out (the [[resize]] stub's non-stub sibling).
    * Unparseable payloads pass through untouched.
    */
  def resizePpm(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { iter =>
      iter.map { m =>
        val bytes = bytesOf(m)
        PpmCodec.parse(bytes) match {
          case Some(info) => m.copy(payload =
            PpmCodec.encode(w, h, PpmCodec.resizeNearest(bytes, info, w, h)))
          case None => m
        }
      }
    }
  }

  /** Deterministic synthetic PPM corpus: one small RGB image per
    * document, w = 8 + id%9, h = 6 + id%7, byte j of the RGB plane =
    * ((id + j) * 2654435761) mod 256 — closed form, so an external
    * oracle recomputes every pixel arithmetically while the blobs are
    * REAL PPMs (header-walked by [[PpmCodec.parse]]).
    */
  def syntheticPpmMedia(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    fixtureDocIds(spark, sfDir)
      .mapPartitions { iter =>
        iter.map { id =>
          val w = (8 + id % 9).toInt
          val h = (6 + id % 7).toInt
          val rgb = new Array[Byte](3 * w * h)
          var j = 0
          while (j < rgb.length) {
            rgb(j) = (((id + j) * 2654435761L) % 256L).toByte
            j += 1
          }
          MediaRow(id, "image", PpmCodec.encode(w, h, rgb))
        }
      }
  }

  /** Pure-JVM Y4M (YUV4MPEG2) codec — the THIRD real kernel: an actual
    * uncompressed video container (header line + "FRAME\n"-delimited
    * planar YUV 4:2:0), so real frame walking and per-plane features
    * need no video library.
    */
  object Y4mCodec {
    final case class Y4mInfo(width: Int, height: Int, dataOffset: Int) {
      /** C420: Y (w·h) + U (w·h/4) + V (w·h/4). */
      def frameBytes: Int = width * height * 3 / 2
    }

    def encode(w: Int, h: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
      require(w % 2 == 0 && h % 2 == 0, s"C420 needs even dims, got $w x $h")
      val fb = w * h * 3 / 2
      frames.foreach(f => require(f.length == fb,
        s"frame length ${f.length} != $fb"))
      val hdr = s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420\n"
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val fm = "FRAME\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val out = new Array[Byte](hdr.length + frames.size * (fm.length + fb))
      System.arraycopy(hdr, 0, out, 0, hdr.length)
      var o = hdr.length
      frames.foreach { f =>
        System.arraycopy(fm, 0, out, o, fm.length); o += fm.length
        System.arraycopy(f, 0, out, o, fb); o += fb
      }
      out
    }

    /** Stream-header walk: "YUV4MPEG2" then space-separated parameters
      * up to the first newline; W and H are required, everything else
      * (F/I/A/C/X) is skipped like a real demuxer skips unknown params.
      * Only C420 subsampling (the default when absent) is accepted.
      */
    def parse(bytes: Array[Byte]): Option[Y4mInfo] = {
      val magic = "YUV4MPEG2"
      if (bytes.length < magic.length ||
        new String(bytes, 0, magic.length,
          java.nio.charset.StandardCharsets.US_ASCII) != magic) return None
      var o = magic.length
      var w = -1; var h = -1; var c420 = true
      while (o < bytes.length && bytes(o) != '\n') {
        if (bytes(o) == ' ') o += 1
        else {
          val tagByte = bytes(o)
          val start = o + 1
          while (o < bytes.length && bytes(o) != ' ' && bytes(o) != '\n') o += 1
          val v = new String(bytes, start, o - start,
            java.nio.charset.StandardCharsets.US_ASCII)
          tagByte match {
            case 'W' => w = try v.toInt catch { case _: Exception => -1 }
            case 'H' => h = try v.toInt catch { case _: Exception => -1 }
            case 'C' => c420 = v.startsWith("420")
            case _ => () // F/I/A/X params: skipped
          }
        }
      }
      if (o >= bytes.length || w <= 0 || h <= 0 || !c420 ||
        w % 2 != 0 || h % 2 != 0 || w > (1 << 14) || h > (1 << 14))
        return None
      Some(Y4mInfo(w, h, o + 1))
    }

    /** Byte offsets of each frame's DATA plane (after its "FRAME...\n"
      * marker line). A malformed marker or short final frame ends the
      * walk — trailing garbage is dropped, prior frames survive.
      */
    def frameOffsets(bytes: Array[Byte], info: Y4mInfo): Seq[Int] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Int]
      var o = info.dataOffset
      val fb = info.frameBytes
      while (o + 5 <= bytes.length &&
        new String(bytes, o, 5,
          java.nio.charset.StandardCharsets.US_ASCII) == "FRAME") {
        o += 5
        while (o < bytes.length && bytes(o) != '\n') o += 1 // frame params
        if (o < bytes.length) o += 1 else return out.toSeq
        if (o + fb <= bytes.length) { out += o; o += fb }
        else return out.toSeq
      }
      out.toSeq
    }
  }

  /** Per-plane integer sums of one sampled frame. */
  final case class VideoFrameFeatures(
      media_id: Long, frame_no: Int, sum_y: Long, sum_u: Long, sum_v: Long)

  /** REAL frame sampling + per-plane features: walk the Y4M container,
    * keep every `everyN`-th frame, sum each YUV plane exactly — the
    * non-stub sibling of [[frameSample]]. Unparseable payloads drop
    * (quarantine), same batched flatMap dataflow as [[pcmWindows]].
    */
  def y4mFrameFeatures(videos: Dataset[MediaRow],
                       everyN: Int): Dataset[VideoFrameFeatures] = {
    import videos.sparkSession.implicits._
    require(everyN > 0, s"everyN must be positive, got $everyN")
    videos.mapPartitions { iter =>
      iter.flatMap { m =>
        val bytes = bytesOf(m)
        Y4mCodec.parse(bytes).iterator.flatMap { info =>
          val np = info.width * info.height
          Y4mCodec.frameOffsets(bytes, info).zipWithIndex
            .collect { case (off, f) if f % everyN == 0 =>
              var sy = 0L; var su = 0L; var sv = 0L
              var j = 0
              while (j < np) { sy += (bytes(off + j) & 0xff); j += 1 }
              while (j < np + np / 4) { su += (bytes(off + j) & 0xff); j += 1 }
              while (j < np * 3 / 2) { sv += (bytes(off + j) & 0xff); j += 1 }
              VideoFrameFeatures(m.media_id, f, sy, su, sv)
            }.iterator
        }
      }
    }
  }

  /** Per-frame perceptual hash row. */
  final case class FrameHash(media_id: Long, frame_no: Int, dhash: Long)

  /** Per-frame dHash over sampled Y4M frames' LUMA planes — the video
    * member of the fingerprint family (text simhash / image dHash /
    * audio energy-signs): keep every `everyN`-th frame, hash its Y
    * plane with the [[dHashBits]] 9x7 gradient grid. Video near-dup
    * then reduces to set overlap of frame hashes (or the banded
    * Hamming op per frame row). Zero shuffles; same container walk as
    * [[y4mFrameFeatures]].
    */
  def videoFrameDHashes(videos: Dataset[MediaRow],
                        everyN: Int): Dataset[FrameHash] = {
    import videos.sparkSession.implicits._
    require(everyN > 0, s"everyN must be positive, got $everyN")
    videos.mapPartitions { iter =>
      iter.flatMap { m =>
        val bytes = bytesOf(m)
        Y4mCodec.parse(bytes).iterator.flatMap { info =>
          val np = info.width * info.height
          Y4mCodec.frameOffsets(bytes, info).zipWithIndex
            .collect { case (off, f) if f % everyN == 0 =>
              val y = Array.tabulate(np)(j => bytes(off + j) & 0xff)
              FrameHash(m.media_id, f,
                dHashBits(info.width, info.height, y))
            }.iterator
        }
      }
    }
  }

  /** Deterministic synthetic Y4M corpus: per document an even-dim C420
    * clip, w = 8 + (id%5)*2, h = 6 + (id%4)*2, 3 + id%4 frames, byte j
    * of frame f = ((id + f*131 + j) * 2654435761) mod 256 — closed
    * form for the oracle, real container for [[Y4mCodec.parse]].
    */
  def syntheticY4mMedia(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    fixtureDocIds(spark, sfDir)
      .mapPartitions { iter =>
        iter.map { id =>
          val w = (8 + (id % 5) * 2).toInt
          val h = (6 + (id % 4) * 2).toInt
          val nf = (3 + id % 4).toInt
          val fb = w * h * 3 / 2
          val frames = (0 until nf).map { f =>
            Array.tabulate(fb)(j =>
              (((id + f * 131L + j) * 2654435761L) % 256L).toByte)
          }
          MediaRow(id, "video", Y4mCodec.encode(w, h, frames))
        }
      }
  }

  /** Integer features of one decoded grayscale JPEG: exact pixel sum
    * and range over the luma plane.
    */
  final case class JpegFeatures(
      media_id: Long, width: Int, height: Int,
      sum_y: Long, min_y: Int, max_y: Int)

  /** Integer features of one decoded GIF: exact palette-mapped gray
    * sum and range (the palette lookup exercises the GCT parse; on the
    * synthetic grayscale palette gray(i) = i, which is what lets the
    * oracle recompute the features from the closed-form indices).
    */
  final case class GifFeatures(
      media_id: Long, width: Int, height: Int,
      sum_gray: Long, min_gray: Int, max_gray: Int)

  /** REAL compressed-image decode #2: GIF — header/descriptor walk +
    * variable-code-width LZW with dictionary rebuild
    * ([[GifCodec.decode]]) -> exact integer features over the
    * palette-mapped gray channel. Rejected blobs quarantine; same
    * batched flatMap dataflow as [[jpegFeatures]].
    */
  def gifFeatures(images: Dataset[MediaRow]): Dataset[GifFeatures] = {
    import images.sparkSession.implicits._
    images.mapPartitions { iter =>
      iter.flatMap { m =>
        GifCodec.decode(bytesOf(m)).iterator.map { img =>
          var s = 0L; var mn = 255; var mx = 0
          var i = 0
          while (i < img.indices.length) {
            val g = (img.palette(img.indices(i)) >> 16) & 0xFF
            s += g
            if (g < mn) mn = g
            if (g > mx) mx = g
            i += 1
          }
          GifFeatures(m.media_id, img.width, img.height, s, mn, mx)
        }
      }
    }
  }

  /** Deterministic synthetic GIF corpus: per document a
    * (8 + id%17) x (6 + id%11) grayscale GIF whose pixel p has palette
    * index ((id + p*7) * 2654435761) % 256 — pseudo-random indices, so
    * the LZW dictionary grows on nearly every pixel (the adversarial
    * compression case; the repetitive clear-on-full case is spec-locked
    * in GifCodecSpec).
    */
  def syntheticGifMedia(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    fixtureDocIds(spark, sfDir)
      .mapPartitions { iter =>
        iter.map { id =>
          val w = (8 + id % 17).toInt
          val h = (6 + id % 11).toInt
          val idx = Array.tabulate(w * h)(p =>
            (((id + p * 7L) * 2654435761L) % 256L).toInt)
          MediaRow(id, "image", GifCodec.encodeGray(w, h, idx))
        }
      }
  }

  /** Integer features of one decoded grayscale PNG: exact pixel sum
    * and range. The row-cycling filter schedule of the synthetic
    * encoder means a wrong Sub/Up/Average/Paeth unfilter (or a wrong
    * inflate) corrupts the sums — the oracle gates the whole chain.
    */
  final case class PngFeatures(
      media_id: Long, width: Int, height: Int,
      sum_gray: Long, min_gray: Int, max_gray: Int)

  /** REAL compressed-image decode #3: PNG — chunk walk + hand-rolled
    * zlib/DEFLATE inflate + the five scanline unfilters
    * ([[PngCodec.decode]]) -> exact integer features. Rejected blobs
    * quarantine; same batched flatMap dataflow as [[jpegFeatures]].
    */
  def pngFeatures(images: Dataset[MediaRow]): Dataset[PngFeatures] = {
    import images.sparkSession.implicits._
    images.mapPartitions { iter =>
      iter.flatMap { m =>
        PngCodec.decode(bytesOf(m)).iterator.map { img =>
          var s = 0L; var mn = 255; var mx = 0
          var i = 0
          while (i < img.pixels.length) {
            val g = img.pixels(i)
            s += g
            if (g < mn) mn = g
            if (g > mx) mx = g
            i += 1
          }
          PngFeatures(m.media_id, img.width, img.height, s, mn, mx)
        }
      }
    }
  }

  /** Deterministic synthetic PNG corpus: per document a
    * (8 + id%13) x (5 + id%7) grayscale PNG whose pixel p is
    * ((id + p*11) * 2654435761) % 256. h >= 5 guarantees every filter
    * type (row y is filtered with y % 5) appears in every image, and
    * the pseudo-random samples make the Paeth predictor branch all
    * three ways.
    */
  def syntheticPngMedia(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    fixtureDocIds(spark, sfDir)
      .mapPartitions { iter =>
        iter.map { id =>
          val w = (8 + id % 13).toInt
          val h = (5 + id % 7).toInt
          val pix = Array.tabulate(w * h)(p =>
            (((id + p * 11L) * 2654435761L) % 256L).toInt)
          MediaRow(id, "image", PngCodec.encodeGray(w, h, pix))
        }
      }
  }

  /** Perceptual image hash row: the 56-bit dHash of one decoded image. */
  final case class ImageHash(media_id: Long, dhash: Long)

  /** 56-bit difference hash (dHash, the public perceptual-hash family:
    * gradient signs over a fixed tiny grid): nearest-neighbor resample
    * to a 9x7 grid, bit (r, c) = [px(r,c) > px(r,c+1)] — 8 comparisons
    * x 7 rows, bit index r*8+c. Gradient signs are invariant to global
    * brightness shifts (the property the near-dup spec pins) and to
    * resolution (the grid is fixed). 56 bits keeps the hash strictly
    * positive in a signed 64-bit lane — both engines' shift/mask
    * arithmetic then agrees without overflow (BIGINT << 63 errors in
    * the oracle engine).
    */
  def dHashBits(w: Int, h: Int, pix: Array[Int]): Long = {
    var hash = 0L
    var i = 0
    while (i < 56) {
      val r = i / 8; val c = i % 8
      def at(cc: Int): Int = pix((r * h / 7) * w + (cc * w / 9))
      if (at(c) > at(c + 1)) hash |= 1L << i
      i += 1
    }
    hash
  }

  /** dHash of every decodable PNG blob (grayscale direct; RGB via the
    * integer luma (299r+587g+114b)/1000, the [[ppmFeatures]] rule).
    * Rejected blobs quarantine; zero shuffles.
    */
  def pngDHashes(images: Dataset[MediaRow]): Dataset[ImageHash] = {
    import images.sparkSession.implicits._
    images.mapPartitions { iter =>
      iter.flatMap { m =>
        PngCodec.decode(bytesOf(m)).iterator.map { img =>
          val gray =
            if (img.channels == 1) img.pixels
            else Array.tabulate(img.width * img.height) { p =>
              (299 * img.pixels(3 * p) + 587 * img.pixels(3 * p + 1)
                + 114 * img.pixels(3 * p + 2)) / 1000
            }
          ImageHash(m.media_id, dHashBits(img.width, img.height, gray))
        }
      }
    }
  }

  /** Image near-dup pairs by Hamming-banded LSH over dHashes: the
    * 56-bit hash splits into four 14-bit bands; a pair within Hamming
    * distance maxDist <= 3 differs in at most 3 bands (pigeonhole), so
    * the exact-band-match self-join has PERFECT recall at that radius
    * — the oracle brute-forces all pairs and the banded plan must
    * equal it. Scale shape: one (band, key) exchange, in-bucket pair
    * enumeration, codegen'd bit_count verification — never corpus².
    */
  def nearDupImagePairs(hashes: DataFrame, maxDist: Int = 3): DataFrame = {
    require(maxDist <= 3,
      s"band recall is exact only for maxDist <= 3, got $maxDist")
    // memo barrier: the self-join references the hash frame twice —
    // without it both sides re-run the upstream media DECODE. The
    // checkpointed frame is (id, hash), never the blobs.
    val hashed = hashes.localCheckpoint(true)
    val banded = hashed.select(col("media_id"), col("dhash"),
      explode(array((0 until 4).map(b =>
        // combined key: 14-bit band value * 4 + band index
        (shiftright(col("dhash"), 14 * b).bitwiseAND(lit(16383L)) * 4
          + b).cast("long")): _*)).as("bk"))
    banded.as("a").join(banded.as("b"),
        col("a.bk") === col("b.bk") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id1"), col("b.media_id").as("id2"),
        col("a.dhash").as("d1"), col("b.dhash").as("d2"))
      .distinct()
      .select(col("id1"), col("id2"),
        bit_count(col("d1").bitwiseXOR(col("d2"))).as("dist"))
      .filter(col("dist") <= maxDist)
  }

  /** 56-bit audio fingerprint — the dHash twin for sound: the decoded
    * sample stream splits into 57 equal windows (integer boundaries
    * k*n/57), window energy = sum of |sample|, bit k = [e(k) > e(k+1)].
    * Energy-delta SIGNS are invariant to exact volume scaling (2x
    * louder doubles every window energy — the spec-pinned law, the
    * audio analog of dHash's brightness invariance) and robust to
    * codec/bit-depth changes. Same Hamming-band near-dup machinery as
    * [[nearDupImagePairs]] applies downstream (the op is generic over
    * any (media_id, dhash) frame).
    */
  def audioFpBits(samples: Array[Int]): Long = {
    val n = samples.length
    val e = new Array[Long](57)
    var k = 0
    while (k < 57) {
      // long arithmetic: k*n overflows Int past ~38M samples (a 13-min
      // 48 kHz mono WAV), which would index negative and kill the task
      var i = (k.toLong * n / 57).toInt
      val end = ((k + 1).toLong * n / 57).toInt
      var s = 0L
      while (i < end) { s += math.abs(samples(i).toLong); i += 1 }
      e(k) = s; k += 1
    }
    var fp = 0L; var b = 0
    while (b < 56) { if (e(b) > e(b + 1)) fp |= 1L << b; b += 1 }
    fp
  }

  /** Fingerprint of every decodable PCM WAV blob (empty streams
    * quarantine); zero shuffles.
    */
  def audioFingerprints(media: Dataset[MediaRow]): Dataset[ImageHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { iter =>
      iter.flatMap { m =>
        val b = bytesOf(m)
        WavCodec.parse(b).iterator
          .map(info => WavCodec.samples16(b, info))
          .filter(_.nonEmpty)
          .map(s => ImageHash(m.media_id, audioFpBits(s)))
      }
    }
  }

  /** Deterministic PNG corpus with PLANTED near-duplicates: base
    * images have pixels in [0, 200); every doc with id % 10 == 7 is
    * instead the id-5 base image brightened by +17 (no clamp — the
    * 200-cap keeps 217 < 256, so every gradient sign is preserved and
    * the twin's dHash is EXACTLY its source's).
    */
  def syntheticPngNearDupMedia(spark: SparkSession,
                               sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    fixtureDocIds(spark, sfDir)
      .mapPartitions { iter =>
        iter.map { id =>
          val e = if (id % 10 == 7) id - 5 else id
          val shift = if (id % 10 == 7) 17 else 0
          val w = (8 + e % 13).toInt
          val h = (5 + e % 7).toInt
          val pix = Array.tabulate(w * h)(p =>
            ((((e + p * 11L) * 2654435761L) % 200L) + shift).toInt)
          MediaRow(id, "image", PngCodec.encodeGray(w, h, pix))
        }
      }
  }

  /** REAL compressed-image decode: full baseline-sequential JPEG
    * (marker walk, Huffman entropy decode, dequantize, IDCT) -> exact
    * integer features over the luma plane. Blobs [[JpegCodec.decode]]
    * rejects are dropped (quarantine), same batched flatMap dataflow as
    * [[ppmFeatures]].
    */
  def jpegFeatures(images: Dataset[MediaRow]): Dataset[JpegFeatures] = {
    import images.sparkSession.implicits._
    images.mapPartitions { iter =>
      iter.flatMap { m =>
        JpegCodec.decode(bytesOf(m)).iterator.map { img =>
          val p = img.planes(0)
          var s = 0L; var mn = 255; var mx = 0
          var i = 0
          while (i < p.pixels.length) {
            val v = p.pixels(i)
            s += v
            if (v < mn) mn = v
            if (v > mx) mx = v
            i += 1
          }
          JpegFeatures(m.media_id, img.width, img.height, s, mn, mx)
        }
      }
    }
  }

  /** Deterministic synthetic JPEG corpus: per document a grayscale
    * baseline JPEG of (1 + id%3) x (1 + id%2) flat 8x8 blocks, block b
    * = ((id + b*131) * 2654435761) mod 256. DC-only blocks decode to
    * EXACTLY those values, so the oracle recomputes every decoded pixel
    * arithmetically while the payloads are real compressed JPEGs
    * (Huffman-coded DC deltas + EOBs, byte stuffing, Annex K tables).
    */
  def syntheticJpegMedia(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    fixtureDocIds(spark, sfDir)
      .mapPartitions { iter =>
        iter.map { id =>
          val bw = (1 + id % 3).toInt
          val bh = (1 + id % 2).toInt
          val flats = Array.tabulate(bw * bh)(b =>
            (((id + b * 131L) * 2654435761L) % 256L).toInt)
          MediaRow(id, "image",
            JpegCodec.encodeGrayFlatBlocks(bw * 8, bh * 8, flats))
        }
      }
  }

  /** Pure-JVM IMA ADPCM codec (WAV format tag 0x11) — the SIXTH real
    * kernel and the first COMPRESSED AUDIO one: 4-bit adaptive
    * differential PCM with the public IMA/DVI step and index tables, in
    * standard WAV block layout (per-block 4-byte header = initial
    * predictor + step index, then packed nibbles, low nibble first).
    * Composes with the same RIFF chunk walk as [[WavCodec]]; the
    * decoder is an integer state machine, so an external oracle can
    * replay it arithmetically nibble for nibble. Reference behavior:
    * GCS2Postgres treats binary columns as opaque (README.md:9); this
    * extends the engine's multimodal surface per SURVEY §2.2.
    */
  object ImaAdpcmCodec {
    /** Quantizer step sizes, public IMA ADPCM specification. */
    val StepTable: Array[Int] = Array(
      7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
      34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
      143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449,
      494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411,
      1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026,
      4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
      11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
      27086, 29794, 32767)

    /** Step-index adaptation per nibble, public IMA specification. */
    val IndexTable: Array[Int] =
      Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

    final case class AdpcmInfo(sampleRate: Int, blockAlign: Int,
                               samplesPerBlock: Int, dataOffset: Int,
                               dataBytes: Int)

    private def le16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def le32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    private def tag(b: Array[Byte], o: Int): String =
      new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** One nibble through the decoder state machine (the spec's exact
      * integer arithmetic — diff = step/8 + bit-selected step/4, step/2,
      * step; sign bit subtracts; predictor clamps to int16, index to
      * [0, 88]). Returns (sample, nextIndex).
      */
    def step(nib: Int, pred: Int, idx: Int): (Int, Int) = {
      val st = StepTable(idx)
      var diff = st >> 3
      if ((nib & 1) != 0) diff += st >> 2
      if ((nib & 2) != 0) diff += st >> 1
      if ((nib & 4) != 0) diff += st
      val p = if ((nib & 8) != 0) pred - diff else pred + diff
      val pc = math.max(-32768, math.min(32767, p))
      (pc, math.max(0, math.min(88, idx + IndexTable(nib))))
    }

    /** Parse a RIFF/WAVE header whose fmt declares IMA ADPCM (tag 0x11,
      * mono, 4-bit) with the wSamplesPerBlock extension. None on
      * anything malformed — same quarantine contract as
      * [[WavCodec.parse]]; unknown chunks (fact/LIST/...) are skipped.
      */
    def parse(bytes: Array[Byte]): Option[AdpcmInfo] = {
      if (bytes.length < 12 || tag(bytes, 0) != "RIFF" ||
          tag(bytes, 8) != "WAVE") return None
      var off = 12
      var fmt: Option[(Int, Int, Int)] = None // rate, blockAlign, spb
      var data: Option[(Int, Int)] = None
      while (off + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
        val id = tag(bytes, off)
        val sz = le32(bytes, off + 4)
        if (sz < 0 || off + 8 + sz > bytes.length) return None
        id match {
          case "fmt " =>
            if (sz < 20) return None
            val audioFormat = le16(bytes, off + 8)
            val ch = le16(bytes, off + 10)
            val bits = le16(bytes, off + 22)
            if (audioFormat != 0x11 || ch != 1 || bits != 4) return None
            fmt = Some((le32(bytes, off + 12), le16(bytes, off + 20),
              le16(bytes, off + 26))) // wSamplesPerBlock (fmt ext.)
          case "data" => data = Some((off + 8, sz))
          case _ => () // fact/LIST/...
        }
        off += 8 + sz + (sz & 1)
      }
      for {
        (rate, align, spb) <- fmt
        (dOff, dSz) <- data
        if rate > 0 && spb >= 1 && align >= 4 + (spb - 1 + 1) / 2
      } yield AdpcmInfo(rate, align, spb, dOff, dSz)
    }

    /** Decode every FULL block in the data chunk: per block the 4-byte
      * header yields sample 0 (the predictor) and the step index, then
      * samplesPerBlock-1 nibbles (low nibble of each byte first) run
      * the state machine. A block whose header index exceeds 88
      * quarantines individually (dropped, like a corrupt MJPEG frame);
      * a trailing partial block is ignored.
      */
    def decode(bytes: Array[Byte], info: AdpcmInfo): Array[Int] = {
      val out = new scala.collection.mutable.ArrayBuffer[Int]()
      val nBlocks = info.dataBytes / info.blockAlign
      var k = 0
      while (k < nBlocks) {
        val base = info.dataOffset + k * info.blockAlign
        var pred = le16(bytes, base).toShort.toInt
        var idx = bytes(base + 2) & 0xff
        if (idx <= 88) {
          out += pred
          var n = 0
          while (n < info.samplesPerBlock - 1) {
            val b = bytes(base + 4 + (n >> 1)) & 0xff
            val nib = if ((n & 1) == 0) b & 0x0f else (b >> 4) & 0x0f
            val (p, i) = step(nib, pred, idx)
            pred = p; idx = i
            out += pred
            n += 1
          }
        }
        k += 1
      }
      out.toArray
    }

    /** The encoder's nibble choice for one sample (successive
      * approximation against step/1, step/2, step/4), predictor kept in
      * sync by replaying [[step]] — the standard IMA encoder loop.
      */
    private def encodeNibble(sample: Int, pred: Int, idx: Int): Int = {
      val st = StepTable(idx)
      var delta = sample - pred
      var nib = 0
      if (delta < 0) { nib = 8; delta = -delta }
      if (delta >= st) { nib |= 4; delta -= st }
      if (delta >= (st >> 1)) { nib |= 2; delta -= st >> 1 }
      if (delta >= (st >> 2)) nib |= 1
      nib
    }

    /** Encode mono int16 samples (length a multiple of
      * `samplesPerBlock`) as a well-formed IMA-ADPCM WAV: fmt 0x11 with
      * the wSamplesPerBlock extension, a fact chunk with the true
      * sample count, block headers carrying the running step index.
      */
    def encode(samples: Array[Int], sampleRate: Int,
               samplesPerBlock: Int): Array[Byte] = {
      require(samplesPerBlock >= 1 &&
        samples.length % samplesPerBlock == 0,
        s"sample count ${samples.length} must be a multiple of $samplesPerBlock")
      val blockAlign = 4 + (samplesPerBlock - 1 + 1) / 2
      val nBlocks = samples.length / samplesPerBlock
      val data = new Array[Byte](nBlocks * blockAlign)
      var idx = 0
      var k = 0
      while (k < nBlocks) {
        val base = k * blockAlign
        var pred = samples(k * samplesPerBlock)
        data(base) = pred.toByte
        data(base + 1) = (pred >> 8).toByte
        data(base + 2) = idx.toByte
        data(base + 3) = 0
        var n = 0
        while (n < samplesPerBlock - 1) {
          val s = samples(k * samplesPerBlock + 1 + n)
          val nib = encodeNibble(s, pred, idx)
          val (p, i) = step(nib, pred, idx)
          pred = p; idx = i
          val o = base + 4 + (n >> 1)
          if ((n & 1) == 0) data(o) = (data(o) & 0xf0 | nib).toByte
          else data(o) = (data(o) & 0x0f | (nib << 4)).toByte
          n += 1
        }
        k += 1
      }
      wrapWav(sampleRate, blockAlign, samplesPerBlock, samples.length, data)
    }

    /** Build one raw block from explicit header state + nibbles (the
      * synthetic-corpus constructor: closed-form nibble streams make
      * the decoded samples an arithmetic recurrence an oracle can
      * replay), wrapped as a well-formed WAV.
      */
    def encodeRawBlock(pred0: Int, idx0: Int, nibbles: Array[Int],
                       sampleRate: Int): Array[Byte] = {
      require(idx0 >= 0 && idx0 <= 88, s"index $idx0 out of [0, 88]")
      val blockAlign = 4 + (nibbles.length + 1) / 2
      val data = new Array[Byte](blockAlign)
      data(0) = pred0.toByte
      data(1) = (pred0 >> 8).toByte
      data(2) = idx0.toByte
      var n = 0
      while (n < nibbles.length) {
        val o = 4 + (n >> 1)
        val nib = nibbles(n) & 0x0f
        if ((n & 1) == 0) data(o) = (data(o) & 0xf0 | nib).toByte
        else data(o) = (data(o) & 0x0f | (nib << 4)).toByte
        n += 1
      }
      wrapWav(sampleRate, blockAlign, nibbles.length + 1,
        nibbles.length + 1, data)
    }

    private def wrapWav(sampleRate: Int, blockAlign: Int,
                        samplesPerBlock: Int, totalSamples: Int,
                        data: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def s4(s: String): Unit =
        out.write(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      def w32(v: Int): Unit = {
        out.write(v & 0xff); out.write((v >> 8) & 0xff)
        out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
      }
      def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
      val pad = data.length & 1
      // fmt (20 = 16 base + cbSize + wSamplesPerBlock) + fact + data
      val riff = 4 + (8 + 20) + (8 + 4) + (8 + data.length + pad)
      s4("RIFF"); w32(riff); s4("WAVE")
      s4("fmt "); w32(20)
      w16(0x11); w16(1); w32(sampleRate)
      // nAvgBytesPerSec: rate/spb blocks per second, blockAlign each
      w32(if (samplesPerBlock > 0)
        (sampleRate.toLong * blockAlign / samplesPerBlock).toInt else 0)
      w16(blockAlign); w16(4) // 4 bits per sample
      w16(2); w16(samplesPerBlock) // cbSize, wSamplesPerBlock
      s4("fact"); w32(4); w32(totalSamples)
      s4("data"); w32(data.length)
      out.write(data, 0, data.length)
      if (pad == 1) out.write(0)
      out.toByteArray
    }
  }

  /** Whole-clip integer features over REAL decoded ADPCM audio: exact
    * sums/extrema/sign-flip count over the reconstructed int16 samples.
    */
  final case class AdpcmFeatures(
      media_id: Long, n_samples: Long, sum_s: Long, energy: Long,
      peak_abs: Int, zero_crossings: Long)

  final case class FlacFeatures(
      media_id: Long, n_channels: Int, n_samples: Long, sum_s: Long,
      energy: Long, peak_abs: Int, zero_crossings: Long)

  /** REAL lossless-compressed audio decode: [[FlacCodec]] (linear
    * prediction + Rice residuals, the format's full 16-bit subset) →
    * exact integer features summed over every decoded channel.
    * Losslessness is the oracle device: the decoded samples must equal
    * the closed-form waveform that was encoded, so the oracle
    * recomputes the features straight from the closed form — any
    * decode error anywhere (bit reader, Rice, predictors, stereo
    * decorrelation, CRC framing) corrupts the sums.
    */
  def flacFeatures(audio: Dataset[MediaRow]): Dataset[FlacFeatures] = {
    import audio.sparkSession.implicits._
    audio.mapPartitions { iter =>
      iter.flatMap { m =>
        val bytes = bytesOf(m)
        FlacCodec.parse(bytes).iterator.flatMap { info =>
          FlacCodec.decode(bytes, info).iterator.map { chans =>
            var n = 0L; var sum = 0L; var energy = 0L; var peak = 0
            var zc = 0L
            var c = 0
            while (c < chans.length) {
              val s = chans(c)
              var i = 0
              while (i < s.length) {
                val v = s(i)
                n += 1; sum += v; energy += v.toLong * v
                val a = if (v < 0) -v else v
                if (a > peak) peak = a
                if (i > 0 && s(i - 1).toLong * v < 0) zc += 1
                i += 1
              }
              c += 1
            }
            FlacFeatures(m.media_id, chans.length, n, sum, energy, peak, zc)
          }
        }
      }
    }
  }

  /** Deterministic synthetic FLAC corpus. Per document: mono unless
    * doc_id % 3 == 0 (then stereo with the decorrelation mode cycling
    * left/side / mid/side / right/side by doc_id % 9), n = 128 +
    * doc_id % 161 samples per channel (so 2-5 blocks of 64 incl. a
    * partial tail). The waveform per channel (base = doc_id % 65536 +
    * ch * 7919):
    *   i < 64              -> constant (base*31 % 65536) - 32768
    *   noise (doc_id even) -> ((base + i*2654435761) % 65536) - 32768
    *   ramp  (doc_id odd)  -> ((base + i*37) % 8192) - 4096
    * Constant first blocks hit CONSTANT subframes, noise docs force
    * escape-raw/5-bit-Rice partitions, ramp docs give the tiny
    * residuals real Rice coding compresses — every decoder path runs
    * under the oracle. The blobs are REAL FLAC streams (CRC-8/CRC-16
    * verified on decode).
    */
  def syntheticFlacMedia(spark: SparkSession,
                         sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    fixtureDocIds(spark, sfDir)
      .mapPartitions { iter =>
        iter.map { id =>
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
            if (nCh == 1) FlacCodec.Independent
            else if (id % 9 == 0) FlacCodec.LeftSide
            else if (id % 9 == 3) FlacCodec.MidSide
            else FlacCodec.RightSide
          MediaRow(id, "audio",
            FlacCodec.encode(chans, 16000, blockSize = 64, stereo = mode))
        }
      }
  }

  /** REAL compressed-audio decode: parse the fmt-0x11 WAV, run the IMA
    * state machine over every nibble, aggregate exact integer features
    * per clip. Malformed payloads drop (quarantine-by-omission); same
    * batched mapPartitions shape as [[pcmWindows]].
    */
  def adpcmFeatures(audio: Dataset[MediaRow]): Dataset[AdpcmFeatures] = {
    import audio.sparkSession.implicits._
    audio.mapPartitions { iter =>
      iter.flatMap { m =>
        val bytes = bytesOf(m)
        ImaAdpcmCodec.parse(bytes).iterator.map { info =>
          val s = ImaAdpcmCodec.decode(bytes, info)
          var sum = 0L; var energy = 0L; var peak = 0; var zc = 0L
          var i = 0
          while (i < s.length) {
            val v = s(i)
            sum += v
            energy += v.toLong * v
            val a = if (v < 0) -v else v
            if (a > peak) peak = a
            if (i > 0 && s(i - 1).toLong * v < 0) zc += 1
            i += 1
          }
          AdpcmFeatures(m.media_id, s.length.toLong, sum, energy, peak, zc)
        }
      }
    }
  }

  /** Deterministic synthetic IMA-ADPCM corpus: per document ONE block
    * whose header and nibble stream are closed-form — predictor
    * ((id*2654435761) mod 65536) − 32768, step index id mod 89, nibble
    * j = ((id + j*2654435761) mod 16), nn = 120 + (id mod 60)*2
    * nibbles — so the decoded samples are a pure integer recurrence the
    * oracle replays (WITH RECURSIVE), while the payloads are real
    * fmt-0x11 WAV blobs parsed by [[ImaAdpcmCodec.parse]].
    */
  def syntheticAdpcmMedia(spark: SparkSession,
                          sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    fixtureDocIds(spark, sfDir)
      .mapPartitions { iter =>
        iter.map { id =>
          val nn = (120 + (id % 60) * 2).toInt
          val pred0 = (((id * 2654435761L) % 65536L) - 32768L).toInt
          val idx0 = (id % 89).toInt
          val nibbles = Array.tabulate(nn)(j =>
            ((id + j.toLong * 2654435761L) % 16L).toInt)
          MediaRow(id, "audio",
            ImaAdpcmCodec.encodeRawBlock(pred0, idx0, nibbles, 8000))
        }
      }
  }

  /** Pure-JVM RIFF/AVI container codec for MOTION JPEG — the FIFTH real
    * kernel and the first COMPRESSED VIDEO one: a real RIFF walk (LIST
    * hdrl/strl headers, LIST movi frame chunks, word alignment, `LIST
    * rec ` nesting, idx1), where every `00dc` chunk is a complete
    * baseline JPEG decoded by [[JpegCodec]]. This is how MJPEG-in-AVI
    * actually ships (each frame independently JPEG-coded), so the
    * container walk composes with the existing compressed-image decoder
    * with no new entropy code. Reference behavior: GCS2Postgres treats
    * binary columns as opaque (README.md:9); this extends the engine's
    * multimodal surface per SURVEY §2.2.
    */
  object AviCodec {
    final case class AviInfo(width: Int, height: Int, moviStart: Int,
                             moviEnd: Int)

    private def le16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def le32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    private def tag(b: Array[Byte], o: Int): String =
      new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** Walk the RIFF: require an `AVI ` form, a `LIST hdrl` whose
      * `avih` gives the frame dims and whose video `strl` declares
      * fccType `vids` with MJPG coding (strh handler or strf
      * biCompression), and a `LIST movi`. None on anything malformed —
      * corrupt payloads quarantine, never task failures.
      */
    def parse(bytes: Array[Byte]): Option[AviInfo] = {
      if (bytes.length < 12 || tag(bytes, 0) != "RIFF" ||
          tag(bytes, 8) != "AVI ") return None
      var w = -1; var h = -1
      var mjpgVids = false
      var movi: Option[(Int, Int)] = None
      var off = 12
      while (off + 8 <= bytes.length && movi.isEmpty) {
        val id = tag(bytes, off)
        val sz = le32(bytes, off + 4)
        if (sz < 0 || off + 8 + sz > bytes.length) return None
        if (id == "LIST" && sz >= 4) {
          val listType = tag(bytes, off + 8)
          if (listType == "movi") movi = Some((off + 12, off + 8 + sz))
          else if (listType == "hdrl") {
            // inner walk: avih for dims, strl/strh+strf for the codec
            var p = off + 12
            val end = off + 8 + sz
            while (p + 8 <= end) {
              val cid = tag(bytes, p)
              val csz = le32(bytes, p + 4)
              if (csz < 0 || p + 8 + csz > end) return None
              if (cid == "avih" && csz >= 40) {
                w = le32(bytes, p + 8 + 32) // dwWidth
                h = le32(bytes, p + 8 + 36) // dwHeight
              } else if (cid == "LIST" && csz >= 4 &&
                         tag(bytes, p + 8) == "strl") {
                var q = p + 12
                val lend = p + 8 + csz
                var vids = false
                while (q + 8 <= lend) {
                  val sid = tag(bytes, q)
                  val ssz = le32(bytes, q + 4)
                  if (ssz < 0 || q + 8 + ssz > lend) return None
                  if (sid == "strh" && ssz >= 8) {
                    vids = tag(bytes, q + 8) == "vids"
                    if (vids && tag(bytes, q + 12) == "MJPG")
                      mjpgVids = true
                  } else if (sid == "strf" && ssz >= 20 && vids &&
                             tag(bytes, q + 8 + 16) == "MJPG") {
                    mjpgVids = true // biCompression
                  }
                  q += 8 + ssz + (ssz & 1)
                }
              }
              p += 8 + csz + (csz & 1)
            }
          }
        }
        off += 8 + sz + (sz & 1) // word alignment per RIFF
      }
      for {
        (ms, me) <- movi
        if mjpgVids && w > 0 && h > 0 && w <= (1 << 14) && h <= (1 << 14)
      } yield AviInfo(w, h, ms, me)
    }

    /** (offset, length) of each video frame's JPEG payload inside `LIST
      * movi`, in stream order: `##dc`/`##db` chunks of any stream
      * number, descending into `LIST rec ` groups (interleaved-AVI
      * record nesting), skipping everything else (audio `##wb`, `ix##`
      * sub-indexes) with word alignment. A malformed chunk ends the
      * walk — prior frames survive, same contract as
      * [[Y4mCodec.frameOffsets]].
      */
    def frameChunks(bytes: Array[Byte], info: AviInfo): Seq[(Int, Int)] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      def walk(start: Int, end: Int): Boolean = {
        var o = start
        while (o + 8 <= end) {
          val id = tag(bytes, o)
          val sz = le32(bytes, o + 4)
          if (sz < 0 || o + 8 + sz > end) return false
          if (id == "LIST" && sz >= 4 && tag(bytes, o + 8) == "rec ") {
            if (!walk(o + 12, o + 8 + sz)) return false
          } else if (id.length == 4 &&
                     id(0).isDigit && id(1).isDigit &&
                     (id.substring(2) == "dc" || id.substring(2) == "db")) {
            out += ((o + 8, sz))
          }
          o += 8 + sz + (sz & 1)
        }
        true
      }
      walk(info.moviStart, math.min(info.moviEnd, bytes.length))
      out.toSeq
    }

    /** Encode JPEG frames as a well-formed MJPEG AVI: RIFF(AVI ) {
      * LIST hdrl { avih, LIST strl { strh vids/MJPG, strf
      * BITMAPINFOHEADER(MJPG) } }, LIST movi { 00dc... }, idx1 }.
      * Every length field, alignment pad, and index entry is real — the
      * blobs replay in standard players.
      */
    def encodeMjpeg(w: Int, h: Int, fps: Int,
                    frames: Seq[Array[Byte]]): Array[Byte] = {
      require(w > 0 && h > 0 && fps > 0)
      val out = new java.io.ByteArrayOutputStream()
      def s4(s: String): Unit =
        out.write(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      def w32(v: Int): Unit = {
        out.write(v & 0xff); out.write((v >> 8) & 0xff)
        out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
      }
      def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
      val maxFrame = if (frames.isEmpty) 0 else frames.map(_.length).max
      val moviContent = 4 + frames.map(f => 8 + f.length + (f.length & 1)).sum
      val idxContent = 16 * frames.size
      val hdrlContent = 4 + (8 + 56) + (8 + (4 + (8 + 56) + (8 + 40)))
      val riffContent = 4 + (8 + hdrlContent) + (8 + moviContent) +
        (8 + idxContent)
      s4("RIFF"); w32(riffContent); s4("AVI ")
      s4("LIST"); w32(hdrlContent); s4("hdrl")
      s4("avih"); w32(56)
      w32(1000000 / fps)        // dwMicroSecPerFrame
      w32(maxFrame * fps)       // dwMaxBytesPerSec
      w32(0)                    // dwPaddingGranularity
      w32(0x10)                 // dwFlags: AVIF_HASINDEX
      w32(frames.size)          // dwTotalFrames
      w32(0)                    // dwInitialFrames
      w32(1)                    // dwStreams
      w32(maxFrame)             // dwSuggestedBufferSize
      w32(w); w32(h)
      w32(0); w32(0); w32(0); w32(0) // dwReserved
      s4("LIST"); w32(4 + (8 + 56) + (8 + 40)); s4("strl")
      s4("strh"); w32(56)
      s4("vids"); s4("MJPG")    // fccType, fccHandler
      w32(0)                    // dwFlags
      w16(0); w16(0)            // wPriority, wLanguage
      w32(0)                    // dwInitialFrames
      w32(1); w32(fps)          // dwScale / dwRate = frame rate
      w32(0)                    // dwStart
      w32(frames.size)          // dwLength
      w32(maxFrame)             // dwSuggestedBufferSize
      w32(-1)                   // dwQuality (default)
      w32(0)                    // dwSampleSize (0: one sample = one frame)
      w16(0); w16(0); w16(w); w16(h) // rcFrame
      s4("strf"); w32(40)       // BITMAPINFOHEADER
      w32(40); w32(w); w32(h)
      w16(1); w16(24)           // biPlanes, biBitCount
      s4("MJPG")                // biCompression
      w32(w * h * 3)            // biSizeImage
      w32(0); w32(0); w32(0); w32(0)
      s4("LIST"); w32(moviContent); s4("movi")
      val frameOffsets = frames.map { f =>
        val rel = out.size() // offset of the chunk's fourcc...
        s4("00dc"); w32(f.length)
        out.write(f, 0, f.length)
        if ((f.length & 1) == 1) out.write(0) // word-align
        rel
      }
      val moviFourccAt = riffContent + 8 - (8 + moviContent) -
        (8 + idxContent) + 8 // absolute offset of "movi"
      s4("idx1"); w32(idxContent)
      frameOffsets.zip(frames).foreach { case (abs, f) =>
        s4("00dc")
        w32(0x10)               // AVIIF_KEYFRAME
        w32(abs - moviFourccAt) // offset relative to "movi" fourcc
        w32(f.length)
      }
      out.toByteArray
    }
  }

  /** Exact luma features of one MJPEG frame after a REAL compressed
    * decode (AVI chunk walk -> per-frame [[JpegCodec]] Huffman + IDCT).
    */
  final case class MjpegFrameFeatures(
      media_id: Long, frame_no: Int, width: Int, height: Int,
      sum_y: Long, min_y: Int, max_y: Int)

  /** REAL compressed-video decode: walk the AVI container, keep every
    * `everyN`-th video chunk, JPEG-decode it, and emit exact integer
    * luma-plane features. Payloads [[AviCodec.parse]] rejects drop
    * whole; frames [[JpegCodec.decode]] rejects drop individually
    * (per-frame quarantine — one corrupt frame doesn't sink the clip).
    * Same batched mapPartitions shape as every codec here.
    */
  def mjpegFrameFeatures(videos: Dataset[MediaRow],
                         everyN: Int): Dataset[MjpegFrameFeatures] = {
    import videos.sparkSession.implicits._
    require(everyN > 0, s"everyN must be positive, got $everyN")
    videos.mapPartitions { iter =>
      iter.flatMap { m =>
        val bytes = bytesOf(m)
        AviCodec.parse(bytes).iterator.flatMap { info =>
          AviCodec.frameChunks(bytes, info).zipWithIndex
            .collect { case ((off, len), f) if f % everyN == 0 =>
              JpegCodec.decode(
                  java.util.Arrays.copyOfRange(bytes, off, off + len))
                .map { img =>
                  val p = img.planes(0)
                  var s = 0L; var mn = 255; var mx = 0
                  var i = 0
                  while (i < p.pixels.length) {
                    val v = p.pixels(i)
                    s += v
                    if (v < mn) mn = v
                    if (v > mx) mx = v
                    i += 1
                  }
                  MjpegFrameFeatures(m.media_id, f, img.width, img.height,
                    s, mn, mx)
                }
            }.flatten.iterator
        }
      }
    }
  }

  /** Deterministic synthetic MJPEG-AVI corpus: per document a clip of
    * nf = 2 + id%3 frames at (1 + id%3) x (1 + id%2) flat 8x8 blocks;
    * block b of frame f decodes to exactly
    * ((id + f*131 + b*17) * 2654435761) mod 256 (DC-only blocks are
    * lossless), so the oracle recomputes every decoded pixel while the
    * payloads are real compressed AVIs (per-frame Huffman-coded JPEGs
    * inside a real RIFF container).
    */
  def syntheticMjpegMedia(spark: SparkSession,
                          sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    fixtureDocIds(spark, sfDir)
      .mapPartitions { iter =>
        iter.map { id =>
          val bw = (1 + id % 3).toInt
          val bh = (1 + id % 2).toInt
          val nf = (2 + id % 3).toInt
          val frames = (0 until nf).map { f =>
            val flats = Array.tabulate(bw * bh)(b =>
              (((id + f * 131L + b * 17L) * 2654435761L) % 256L).toInt)
            JpegCodec.encodeGrayFlatBlocks(bw * 8, bh * 8, flats)
          }
          MediaRow(id, "video", AviCodec.encodeMjpeg(bw * 8, bh * 8, 25,
            frames))
        }
      }
  }

  /** Wrap any DataFrame with a binary column into the typed media schema. */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String,
              kind: String): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long").as("media_id"),
        lit(kind).as("kind"),
        col(payloadCol).cast("binary").as("payload"))
      .as[MediaRow]
  }

  /** Deterministic fake media table derived from documents.text — lets the
    * full pipeline run end-to-end in this container without codecs.
    */
  def syntheticMedia(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    asMedia(docs, "doc_id", "text", "image")
  }
}
