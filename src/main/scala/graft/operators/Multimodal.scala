package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing (mission extension, SURVEY.md §7.4): media
 * travels as an opaque `binary` column plus typed metadata, exactly like
 * the reference treats JSON payloads as opaque strings. Decode/resize/
 * frame-sample run per-partition over iterators (the Scala analogue of
 * `mapInPandas` batching: one decoder instance per partition, streaming,
 * no per-row setup).
 *
 * Decode kernels: REAL for uncompressed containers — [[RawFormatsCodec]]
 * parses genuine BMP and WAV files (fixed-layout LE headers, RIFF chunk
 * walk) and computes real content features (per-region pixel intensity,
 * per-segment PCM RMS) — and REAL for compressed images via
 * [[ImageIOCodec]] (the JDK's own PNG/JPEG/GIF readers, zero new
 * dependencies). Compressed audio/video (MP3/MP4/...) still need a
 * decoder library this environment doesn't have, so they run on
 * [[StubCodec]] — a deterministic fake behind the same [[MediaCodec]]
 * seam; swapping in a JNI/javacv codec changes one constructor argument.
 * The Spark-side plumbing (schema, partitioning, batch iteration,
 * feature schema) is identical either way and fully tested.
 */
object Multimodal {

  /** Typed media envelope. `kind` ∈ {image, audio, video}. */
  final case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte])

  final case class MediaMeta(media_id: Long, kind: String, size_bytes: Int,
                             width: Int, height: Int, duration_ms: Long)

  final case class MediaFeature(media_id: Long, kind: String,
                                feature: Array[Float])

  final case class FrameSample(media_id: Long, frame_index: Int,
                               offset_ms: Long, phash: Long)

  /**
   * Decode-kernel seam: everything Spark-side (schema, partition-streamed
   * iteration, batch shape) is codec-agnostic; a real deployment supplies
   * a [[MediaCodec]] backed by javacv/ffmpeg/an encoder model, constructed
   * ONCE per partition. Must be Serializable (ships in task closures).
   */
  trait MediaCodec extends Serializable {
    /** (width, height, durationMs) from a container header. */
    def decodeHeader(kind: String, bytes: Array[Byte]): (Int, Int, Long)
    /** Fixed-dim feature vector for the media content. */
    def features(bytes: Array[Byte], dim: Int): Array[Float]
    /** Kind-aware variant — the one the pipeline calls. Default ignores
      * `kind` (content sniffing); codecs override it to fail loudly when
      * the declared kind is undecodable instead of silently degrading. */
    def features(kind: String, bytes: Array[Byte], dim: Int): Array[Float] =
      features(bytes, dim)
  }

  /**
   * STUB codec — deterministic fakes over the byte content (no
   * image/audio/video libraries exist in this environment). The default
   * instance everywhere; swapping in a real codec changes one argument.
   */
  object StubCodec extends MediaCodec {
    override def decodeHeader(kind: String, bytes: Array[Byte]): (Int, Int, Long) = {
      var h = 0xcbf29ce484222325L
      var i = 0
      val n = math.min(bytes.length, 64)
      while (i < n) { h ^= bytes(i); h *= 0x100000001b3L; i += 1 }
      val w = 160 + math.floorMod(h, 8).toInt * 160          // 160..1280
      val ht = 120 + math.floorMod(h >>> 8, 8).toInt * 120   // 120..960
      val dur = if (kind == "image") 0L else 1000L + math.floorMod(h >>> 16, 60000L)
      (w, ht, dur)
    }

    override def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      val acc = new Array[Float](dim)
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < bytes.length) {
        h ^= bytes(i); h *= 0x100000001b3L
        acc(math.floorMod(h, dim).toInt) += 1f
        i += 1
      }
      val norm = math.sqrt(acc.map(x => x * x).sum).toFloat max 1e-6f
      acc.map(_ / norm)
    }
  }

  private[operators] def decodeHeaderStub(kind: String, bytes: Array[Byte]): (Int, Int, Long) =
    StubCodec.decodeHeader(kind, bytes)

  private[operators] def featureStub(bytes: Array[Byte], dim: Int): Array[Float] =
    StubCodec.features(bytes, dim)

  /**
   * IMA/DVI ADPCM (public IMA Digital Audio Focus Group spec; WAV format
   * tag 0x0011): 4 bits per sample, 4:1 compression of 16-bit PCM, pure
   * integer arithmetic — an adaptive step-size table of 89 entries and a
   * per-code index walk. Blocks are self-contained: each starts with the
   * (predictor: s16 LE, stepIndex: u8, reserved) state header followed by
   * packed nibbles (low nibble first), so any block decodes without its
   * neighbors — which is also why the format suits splittable processing.
   * Shared by [[RawFormatsCodec]] (decode) and [[MediaSynth]] (encode:
   * the encoder embeds this decoder's arithmetic, per the spec).
   */
  private[operators] object ImaAdpcm {
    val StepTable: Array[Int] = Array(
      7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
      41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
      190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
      724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
      2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
      6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
      16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)
    val IndexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

    /** One decode step: (code, predictor, stepIndex) → (sample, index'). */
    def step(code: Int, pred: Int, index: Int): (Int, Int) = {
      val s = StepTable(index)
      var diff = s >> 3
      if ((code & 4) != 0) diff += s
      if ((code & 2) != 0) diff += s >> 1
      if ((code & 1) != 0) diff += s >> 2
      val p = if ((code & 8) != 0) pred - diff else pred + diff
      val clamped = math.max(-32768, math.min(32767, p))
      val idx = math.max(0, math.min(88, index + IndexTable(code & 7)))
      (clamped, idx)
    }

    /** Quantize `diff = target - pred` to the 4-bit code at `index` —
      * the spec's encoder: magnitude bits by step comparison, then the
      * state advances through [[step]] so encoder and decoder predictors
      * stay in lockstep. Returns (code, predictor', index'). */
    def encodeStep(target: Int, pred: Int, index: Int): (Int, Int, Int) = {
      val s = StepTable(index)
      var diff = target - pred
      var code = 0
      if (diff < 0) { code = 8; diff = -diff }
      if (diff >= s) { code |= 4; diff -= s }
      if (diff >= (s >> 1)) { code |= 2; diff -= s >> 1 }
      if (diff >= (s >> 2)) code |= 1
      val (p, idx) = step(code, pred, index)
      (code, p, idx)
    }

    /** Decode one mono block at `off` (blockAlign bytes): the 4-byte
      * state header's predictor is sample 0, then two samples per packed
      * byte, low nibble first. */
    def decodeBlock(b: Array[Byte], off: Int, blockAlign: Int): Array[Short] = {
      var pred = ((b(off) & 0xff) | (b(off + 1) << 8)).toShort.toInt
      var index = math.max(0, math.min(88, b(off + 2) & 0xff))
      val nData = blockAlign - 4
      val out = new Array[Short](1 + nData * 2)
      out(0) = pred.toShort
      var i = 0
      while (i < nData) {
        val byte = b(off + 4 + i) & 0xff
        val (s1, i1) = step(byte & 0x0f, pred, index)
        pred = s1; index = i1
        out(1 + 2 * i) = s1.toShort
        val (s2, i2) = step((byte >> 4) & 0x0f, pred, index)
        pred = s2; index = i2
        out(2 + 2 * i) = s2.toShort
        i += 1
      }
      out
    }
  }

  /**
   * REAL codec for uncompressed container formats — no external library
   * needed, the headers are fixed-layout little-endian structs:
   *  - image = BMP (BITMAPFILEHEADER + BITMAPINFOHEADER): width/height at
   *    byte offsets 18/22;
   *  - audio = WAV (RIFF/fmt/data): duration derived from the data-chunk
   *    byte length and the fmt chunk's byte rate.
   * Features are real content statistics: per-region mean pixel intensity
   * (BMP) / per-segment RMS amplitude (WAV). Compressed formats
   * (JPEG/MP4/...) still need a real decoder dependency — `video` stays
   * on [[StubCodec]], the documented seam.
   */
  object RawFormatsCodec extends MediaCodec {
    private def le32(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
    private def le16(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

    /** (fmtOff, dataOff, dataLen) by walking RIFF chunks. */
    private def wavChunks(b: Array[Byte]): (Int, Int, Int) = {
      require(b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(8) == 'W',
        "not a RIFF/WAVE stream")
      var off = 12
      var fmt = -1; var data = -1; var dataLen = -1
      while (off + 8 <= b.length && (fmt < 0 || data < 0)) {
        val id = new String(b, off, 4, "US-ASCII")
        val len = le32(b, off + 4)
        // an out-of-range chunk length is a corrupt header: negative
        // walks the offset BACKWARD (infinite loop) or propagates into
        // negative durations; oversized overstates duration silently and
        // can overflow the offset — both are the AU-header class of bug
        require(len >= 0 && len <= b.length - off - 8,
          s"malformed RIFF chunk '$id' length $len (${b.length - off - 8} left)")
        if (id == "fmt ") fmt = off + 8
        else if (id == "data") { data = off + 8; dataLen = len }
        off += 8 + len + (len & 1) // chunks are word-aligned
      }
      require(fmt >= 0 && data >= 0, "WAV missing fmt/data chunk")
      (fmt, data, dataLen)
    }

    private def be32(b: Array[Byte], off: Int): Int =
      ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
        ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

    private def isAu(b: Array[Byte]): Boolean =
      b.length >= 24 && b(0) == '.' && b(1) == 's' && b(2) == 'n' && b(3) == 'd'

    /** (dataOff, dataLen, encoding, sampleRate, channels) from a
      * big-endian Sun AU header (public format: ".snd" magic + 6 u32s). */
    private def auHeader(b: Array[Byte]): (Int, Int, Int, Int, Int) = {
      require(isAu(b), "not an AU stream")
      val off = be32(b, 4)
      require(off >= 24 && off <= b.length, s"malformed AU data offset $off")
      val len = be32(b, 8) match {
        case -1 => b.length - off // 0xFFFFFFFF = unknown: rest of stream
        case n =>
          // any other negative size is a corrupt header, not a sentinel —
          // without this, decodeHeader propagates a negative duration_ms
          require(n >= 0, s"malformed AU data size $n")
          n
      }
      (off, len, be32(b, 12), be32(b, 16), be32(b, 20))
    }

    /** (sampleRate, blockAlign, samplesPerBlock) from an IMA-ADPCM fmt
      * chunk (format tag 0x0011). Mono only — the per-channel nibble
      * interleave is a documented non-goal; stereo fails loudly. */
    private def adpcmFmt(b: Array[Byte], fmt: Int): (Int, Int, Int) = {
      require(le32(b, fmt - 4) >= 20, "IMA-ADPCM fmt chunk needs cbSize+samplesPerBlock")
      val channels = le16(b, fmt + 2)
      require(channels == 1, s"IMA-ADPCM: mono only, got $channels channels")
      val blockAlign = le16(b, fmt + 12)
      require(blockAlign > 4, s"IMA-ADPCM blockAlign $blockAlign too small")
      val spb = le16(b, fmt + 18)
      require(spb == (blockAlign - 4) * 2 + 1,
        s"IMA-ADPCM samplesPerBlock $spb inconsistent with blockAlign $blockAlign")
      (le32(b, fmt + 4), blockAlign, spb)
    }

    /** G.711 μ-law expansion (public CCITT spec — the standard bias-132
      * segment/mantissa form; inverse of [[MediaSynth.pcmToUlaw]]). */
    private[operators] def ulawToPcm(u: Byte): Int = {
      val x = (~u) & 0xff
      val exp = (x >> 4) & 0x07
      val mant = x & 0x0f
      val mag = (((mant << 3) + 0x84) << exp) - 0x84
      if ((x & 0x80) != 0) -mag else mag
    }

    override def decodeHeader(kind: String, bytes: Array[Byte]): (Int, Int, Long) =
      kind match {
        case "image" =>
          require(bytes.length >= 26 && bytes(0) == 'B' && bytes(1) == 'M',
            "not a BMP stream")
          (le32(bytes, 18), le32(bytes, 22), 0L)
        case "audio" if isAu(bytes) =>
          // 8-bit μ-law: one byte per sample per channel
          val (_, len, enc, rate, ch) = auHeader(bytes)
          require(enc == 1, s"AU encoding $enc unsupported (1 = G.711 u-law)")
          (0, 0, if (rate <= 0 || ch <= 0) 0L else len * 1000L / (rate.toLong * ch))
        case "audio" =>
          val (fmt, _, dataLen) = wavChunks(bytes)
          le16(bytes, fmt) match {
            case 0x0011 => // IMA ADPCM: whole blocks of samplesPerBlock
              val (rate, blockAlign, spb) = adpcmFmt(bytes, fmt)
              val nBlocks = dataLen / blockAlign
              (0, 0, if (rate <= 0) 0L else nBlocks * spb.toLong * 1000L / rate)
            case _ =>
              val byteRate = le32(bytes, fmt + 8)
              (0, 0, if (byteRate <= 0) 0L else dataLen * 1000L / byteRate)
          }
        case other => StubCodec.decodeHeader(other, bytes) // video: stub seam
      }

    override def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') {
        // BMP: mean pixel intensity per horizontal region of the image
        val pixOff = le32(bytes, 10)
        val counts = new Array[Long](dim)
        var i = pixOff
        while (i < bytes.length) {
          val region = ((i - pixOff).toLong * dim / (bytes.length - pixOff)).toInt
          out(region) += (bytes(i) & 0xff); counts(region) += 1
          i += 1
        }
        var r = 0
        while (r < dim) { if (counts(r) > 0) out(r) /= counts(r) * 255f; r += 1 }
        out
      } else if (isAu(bytes)) {
        // μ-law AU: expand each compressed byte, RMS per time segment —
        // the same content statistic as the PCM WAV path
        val (off, len, enc, _, _) = auHeader(bytes)
        require(enc == 1, s"AU encoding $enc unsupported (1 = G.711 u-law)")
        val n = math.min(len, bytes.length - off)
        if (n <= 0) return out
        val sums = new Array[Double](dim)
        val counts = new Array[Long](dim)
        var s = 0
        while (s < n) {
          // same 16-bit normalization as the WAV path (the bias-132
          // expansion spans ±32124), so AU/WAV of one signal compare
          val v = ulawToPcm(bytes(off + s)).toDouble / 32768.0
          val seg = (s.toLong * dim / n).toInt
          sums(seg) += v * v; counts(seg) += 1
          s += 1
        }
        var i = 0
        while (i < dim) {
          if (counts(i) > 0) out(i) = math.sqrt(sums(i) / counts(i)).toFloat
          i += 1
        }
        out
      } else if (bytes.length >= 12 && bytes(0) == 'R' && bytes(8) == 'W') {
        val (fmt, data, dataLen) = wavChunks(bytes)
        if (le16(bytes, fmt) == 0x0011) {
          // IMA ADPCM: real 4:1 decode block by block, then the same
          // per-segment RMS statistic as the PCM path (same ±32768
          // normalization, so ADPCM/PCM of one signal compare)
          val (_, blockAlign, spb) = adpcmFmt(bytes, fmt)
          val nBlocks = math.min(dataLen, bytes.length - data) / blockAlign
          val total = nBlocks.toLong * spb
          if (total <= 0) return out
          val sums = new Array[Double](dim)
          val counts = new Array[Long](dim)
          var blk = 0
          var s = 0L
          while (blk < nBlocks) {
            val pcm = ImaAdpcm.decodeBlock(bytes, data + blk * blockAlign,
              blockAlign)
            var j = 0
            while (j < spb) {
              val v = pcm(j).toDouble / 32768.0
              val seg = (s * dim / total).toInt
              sums(seg) += v * v; counts(seg) += 1
              s += 1; j += 1
            }
            blk += 1
          }
          var i = 0
          while (i < dim) {
            if (counts(i) > 0) out(i) = math.sqrt(sums(i) / counts(i)).toFloat
            i += 1
          }
          return out
        }
        // WAV: RMS amplitude per time segment (16-bit PCM assumed)
        val nSamp = dataLen / 2
        if (nSamp == 0) return out
        val sums = new Array[Double](dim)
        val counts = new Array[Long](dim)
        var s = 0
        while (s < nSamp && data + 2 * s + 1 < bytes.length) {
          val v = (le16(bytes, data + 2 * s).toShort).toDouble / 32768.0
          val seg = (s.toLong * dim / nSamp).toInt
          sums(seg) += v * v; counts(seg) += 1
          s += 1
        }
        var i = 0
        while (i < dim) {
          if (counts(i) > 0) out(i) = math.sqrt(sums(i) / counts(i)).toFloat
          i += 1
        }
        out
      } else StubCodec.features(bytes, dim)
    }
  }

  /**
   * REAL codec for COMPRESSED image containers via the JDK's own
   * `javax.imageio` (PNG/JPEG/GIF/BMP readers ship in every JRE — zero
   * new dependencies). Audio stays on [[RawFormatsCodec]]'s real WAV
   * kernel; compressed audio/video (MP3/MP4/...) remain the one
   * documented [[StubCodec]] seam left.
   *
   * Features are the same semantic as the BMP kernel: mean luminance per
   * row-major pixel region — so the SAME logical image encoded as PNG or
   * decoded raw yields comparable vectors (spec-pinned).
   */
  object ImageIOCodec extends MediaCodec {
    private def decode(bytes: Array[Byte]): java.awt.image.BufferedImage =
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))

    override def decodeHeader(kind: String, bytes: Array[Byte]): (Int, Int, Long) =
      kind match {
        case "image" =>
          val img = decode(bytes)
          require(img != null, "undecodable image stream (no ImageIO reader)")
          (img.getWidth, img.getHeight, 0L)
        case other => RawFormatsCodec.decodeHeader(other, bytes)
      }

    override def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      val img = try decode(bytes) catch { case _: Exception => null }
      if (img == null) RawFormatsCodec.features(bytes, dim)
      else luminance(img, dim)
    }

    /** Declared-image bytes that no ImageIO reader decodes fail LOUDLY —
      * the same contract as decodeHeader — instead of falling through to
      * deterministic stub features that would silently flow into
      * ANN/dedup. Non-image kinds keep the raw-format chain. */
    override def features(kind: String, bytes: Array[Byte], dim: Int): Array[Float] =
      kind match {
        case "image" =>
          val img = decode(bytes)
          require(img != null, "undecodable image stream (no ImageIO reader)")
          luminance(img, dim)
        case _ => RawFormatsCodec.features(bytes, dim)
      }

    private def luminance(img: java.awt.image.BufferedImage, dim: Int): Array[Float] = {
      val (w, h) = (img.getWidth, img.getHeight)
      val out = new Array[Float](dim)
      val counts = new Array[Long](dim)
      val total = w.toLong * h
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val luma = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3f
          val region = ((y.toLong * w + x) * dim / total).toInt
          out(region) += luma; counts(region) += 1
          x += 1
        }
        y += 1
      }
      var r = 0
      while (r < dim) { if (counts(r) > 0) out(r) /= counts(r) * 255f; r += 1 }
      out
    }
  }

  /** Deterministic REAL media synthesis (for tests/gates — and the proof
    * that [[RawFormatsCodec]] parses genuine files, not our own fakes). */
  object MediaSynth {
    private def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    private def le16(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

    /** A valid 24-bit BMP, deterministic pixel pattern from `seed`. */
    def bmp(w: Int, h: Int, seed: Long = 0L): Array[Byte] = {
      val rowBytes = (w * 3 + 3) / 4 * 4 // rows pad to 4-byte boundaries
      val pixBytes = rowBytes * h
      val fileSize = 54 + pixBytes
      val out = java.nio.ByteBuffer.allocate(fileSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put('B'.toByte).put('M'.toByte).putInt(fileSize)
        .putInt(0).putInt(54)                 // reserved, pixel offset
        .putInt(40).putInt(w).putInt(h)       // info header, dims
        .putShort(1).putShort(24)             // planes, bpp
        .putInt(0).putInt(pixBytes)           // BI_RGB, image size
        .putInt(2835).putInt(2835).putInt(0).putInt(0)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = ((x * 31L + y * 17L + seed) & 0xff).toInt
          out.put(v.toByte).put((v ^ 0x55).toByte).put((255 - v).toByte)
          x += 1
        }
        var pad = rowBytes - w * 3
        while (pad > 0) { out.put(0.toByte); pad -= 1 }
        y += 1
      }
      out.array()
    }

    /** A REAL compressed image via `ImageIO.write` — same deterministic
      * pixel pattern as [[bmp]], encoded by the JDK's own PNG/JPEG/GIF
      * writer (format ∈ {"png", "jpg", "gif"}). The decode gate is
      * honest: bytes go through a genuine compression round-trip. */
    def image(w: Int, h: Int, seed: Long = 0L, format: String = "png"): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = ((x * 31L + y * 17L + seed) & 0xff).toInt
          img.setRGB(x, y, (v << 16) | ((v ^ 0x55) << 8) | (255 - v))
          x += 1
        }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      require(javax.imageio.ImageIO.write(img, format, out),
        s"no ImageIO writer for $format")
      out.toByteArray
    }

    /** G.711 μ-law compression of one PCM sample (public CCITT spec:
      * clip, bias 132, segment search, 4-bit mantissa, complement). */
    private[operators] def pcmToUlaw(pcm: Int): Byte = {
      val sign = if (pcm < 0) 0x80 else 0
      var x = math.min(math.abs(pcm), 32635) + 0x84
      var exp = 7
      var mask = 0x4000
      while (exp > 0 && (x & mask) == 0) { exp -= 1; mask >>= 1 }
      val mant = (x >> (exp + 3)) & 0x0f
      (~(sign | (exp << 4) | mant)).toByte
    }

    /** A REAL compressed-audio file: Sun AU container (big-endian header)
      * holding G.711 μ-law — a genuine 2:1 audio codec, same sine signal
      * as [[wav]] so the two formats' content features are comparable. */
    def au(nSamples: Int, sampleRate: Int = 8000, seed: Long = 0L): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(24 + nSamples)
        .order(java.nio.ByteOrder.BIG_ENDIAN)
      out.put(".snd".getBytes("US-ASCII"))
        .putInt(24).putInt(nSamples) // data offset, data size
        .putInt(1)                   // encoding 1 = G.711 u-law
        .putInt(sampleRate).putInt(1) // rate, channels
      var s = 0
      while (s < nSamples) {
        out.put(pcmToUlaw((math.sin((s + seed) * 0.1) * 12000).toInt))
        s += 1
      }
      out.array()
    }

    /** A REAL IMA-ADPCM WAV (format tag 0x0011, mono, 4:1): the same
      * sine signal as [[wav]] pushed through a genuine spec encoder —
      * [[ImaAdpcm.encodeStep]] quantizes against the decoder's own
      * predicted state, so bytes only decode correctly through real
      * ADPCM arithmetic. `nSamples` rounds DOWN to whole blocks
      * (`samplesPerBlock = (blockAlign-4)*2+1`). */
    def adpcmWav(nSamples: Int, sampleRate: Int = 8000, seed: Long = 0L,
                 blockAlign: Int = 256): Array[Byte] = {
      val spb = (blockAlign - 4) * 2 + 1
      val nBlocks = nSamples / spb
      val dataLen = nBlocks * blockAlign
      val out = java.nio.ByteBuffer.allocate(48 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      // byteRate for ADPCM = rate * blockAlign / samplesPerBlock (ceil'd
      // by convention; our decoder derives duration from blocks instead)
      val byteRate = (sampleRate.toLong * blockAlign / spb).toInt
      out.put("RIFF".getBytes("US-ASCII")).putInt(40 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(20)
        .putShort(0x0011).putShort(1)           // IMA ADPCM, mono
        .putInt(sampleRate).putInt(byteRate)
        .putShort(blockAlign.toShort).putShort(4) // block align, bits
        .putShort(2).putShort(spb.toShort)      // cbSize, samplesPerBlock
        .put("data".getBytes("US-ASCII")).putInt(dataLen)
      def signal(s: Int): Int = (math.sin((s + seed) * 0.1) * 12000).toInt
      var blk = 0
      while (blk < nBlocks) {
        val base = blk * spb
        var pred = signal(base) // sample 0 rides verbatim in the header
        var index = 0
        out.putShort(pred.toShort).put(0.toByte).put(0.toByte)
        var i = 0
        while (i < blockAlign - 4) {
          val (c1, p1, i1) = ImaAdpcm.encodeStep(signal(base + 1 + 2 * i), pred, index)
          pred = p1; index = i1
          val (c2, p2, i2) = ImaAdpcm.encodeStep(signal(base + 2 + 2 * i), pred, index)
          pred = p2; index = i2
          out.put((c1 | (c2 << 4)).toByte)
          i += 1
        }
        blk += 1
      }
      out.array()
    }

    /** A valid 16-bit mono PCM WAV of `nSamples` at `sampleRate` Hz. */
    def wav(nSamples: Int, sampleRate: Int = 8000, seed: Long = 0L): Array[Byte] = {
      val dataLen = nSamples * 2
      val out = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1)              // PCM, mono
        .putInt(sampleRate).putInt(sampleRate * 2) // byte rate
        .putShort(2).putShort(16)             // block align, bits
        .put("data".getBytes("US-ASCII")).putInt(dataLen)
      var s = 0
      while (s < nSamples) {
        val v = (math.sin((s + seed) * 0.1) * 12000).toInt
        out.putShort(v.toShort)
        s += 1
      }
      out.array()
    }
  }

  // ── Real Spark plumbing ──────────────────────────────────────────────────

  /** Decode metadata per partition (one decoder per partition — the
    * mapInPandas batching shape). */
  def extractMeta(media: Dataset[MediaRow],
                  codec: MediaCodec = StubCodec): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // a real codec's per-partition init (contexts, models) goes in its
      // construction; the instance is reused for the whole partition
      rows.map { m =>
        val (w, h, d) = codec.decodeHeader(m.kind, m.bytes)
        MediaMeta(m.media_id, m.kind, m.bytes.length, w, h, d)
      }
    }
  }

  /** Feature extraction: binary → dense Array[Float], partition-streamed. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 64,
                      codec: MediaCodec = StubCodec): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(rows =>
      rows.map(m =>
        MediaFeature(m.media_id, m.kind, codec.features(m.kind, m.bytes, dim))))
  }

  /** Frame sampling for video-kind rows: every `everyMs` up to duration;
    * one output row per sampled frame (generator shape — flatMap). */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long = 1000L): Dataset[FrameSample] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val (_, _, dur) = decodeHeaderStub(m.kind, m.bytes)
      val n = math.min(dur / everyMs, 64L).toInt
      (0 until n).map { i =>
        // STUB perceptual hash: mixes media content hash with frame index
        var h = 0xcbf29ce484222325L
        m.bytes.take(32).foreach { b => h ^= b; h *= 0x100000001b3L }
        FrameSample(m.media_id, i, i * everyMs, h ^ (i.toLong * 0x9e3779b97f4a7c15L))
      }
    }
  }

  /** "Resize": rewrites the stub header so downstream meta reflects the
    * new dimensions — byte-level passthrough otherwise. */
  def resizeStub(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map { m =>
      val tag = s"GFT:$w:$h:".getBytes("UTF-8")
      MediaRow(m.media_id, m.kind, tag ++ m.bytes)
    }
  }

  /** Bridge: fabricate a media table from any (id, string) source so the
    * pipeline is exercisable on the driver test tables. */
  def fromText(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .map { case (id, text) =>
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        MediaRow(id, kind, text.getBytes("UTF-8"))
      }
  }
}
