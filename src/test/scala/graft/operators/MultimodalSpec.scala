package graft.operators

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.fromText(
    Seq((0L, "an image doc"), (1L, "an audio doc"), (2L, "a video doc"),
      (3L, "another image")).toDF("id", "text"), "id", "text")

  test("fromText fabricates typed media rows with binary payloads") {
    val rows = media.collect().sortBy(_.media_id)
    assert(rows.map(_.kind).toSeq === Seq("image", "audio", "video", "image"))
    assert(new String(rows(0).bytes, "UTF-8") === "an image doc")
  }

  test("extractMeta decodes deterministic dimensions per partition") {
    val meta = Multimodal.extractMeta(media).collect().sortBy(_.media_id)
    assert(meta.length === 4)
    meta.foreach { m =>
      assert(m.width >= 160 && m.width <= 1280)
      assert(m.height >= 120 && m.height <= 960)
      if (m.kind == "image") assert(m.duration_ms === 0L)
      else assert(m.duration_ms > 0L)
      assert(m.size_bytes > 0)
    }
    // determinism
    val meta2 = Multimodal.extractMeta(media).collect().sortBy(_.media_id)
    assert(meta.toSeq === meta2.toSeq)
  }

  test("extractFeatures yields unit-norm fixed-dim vectors") {
    val feats = Multimodal.extractFeatures(media, dim = 16).collect()
    assert(feats.length === 4)
    feats.foreach { f =>
      assert(f.feature.length === 16)
      val norm = math.sqrt(f.feature.map(x => x.toDouble * x).sum)
      assert(math.abs(norm - 1.0) < 1e-3)
    }
  }

  test("sampleFrames emits one row per sampled frame for video only") {
    val frames = Multimodal.sampleFrames(media, everyMs = 500).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.media_id === 2L))
    assert(frames.map(_.frame_index).toSeq === frames.indices.toSeq)
    assert(frames.map(_.phash).distinct.length === frames.length)
  }

  test("resizeStub rewrites header; meta pipeline still runs") {
    val resized = Multimodal.resizeStub(media, 320, 240)
    val bytes = resized.filter(_.media_id == 0L).head().bytes
    assert(new String(bytes.take(12), "UTF-8").startsWith("GFT:320:240:"))
    assert(Multimodal.extractMeta(resized).count() === 4)
  }

  test("RawFormatsCodec decodes REAL BMP and WAV files exactly") {
    // synthesized files are valid containers; the codec reads headers back
    val bmp = Multimodal.MediaSynth.bmp(37, 23, seed = 5)
    assert(Multimodal.RawFormatsCodec.decodeHeader("image", bmp) === ((37, 23, 0L)))
    // 12000 samples at 8000 Hz mono 16-bit = 1500 ms
    val wav = Multimodal.MediaSynth.wav(12000, 8000)
    assert(Multimodal.RawFormatsCodec.decodeHeader("audio", wav) === ((0, 0, 1500L)))

    // hand-built fixture (not via MediaSynth): a 1x1 BMP byte-for-byte
    val tiny = Array[Byte](
      'B', 'M', 58, 0, 0, 0, 0, 0, 0, 0, 54, 0, 0, 0, // file header
      40, 0, 0, 0, 1, 0, 0, 0, 1, 0, 0, 0,            // info: w=1 h=1
      1, 0, 24, 0, 0, 0, 0, 0, 4, 0, 0, 0,
      0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
      9, 8, 7, 0)                                      // one BGR pixel + pad
    assert(Multimodal.RawFormatsCodec.decodeHeader("image", tiny) === ((1, 1, 0L)))

    // features are real content statistics: a louder WAV has higher RMS
    val quiet = Multimodal.MediaSynth.wav(8000).map(b => b)
    val silent = {
      val w = Multimodal.MediaSynth.wav(8000)
      // zero the PCM payload, keep headers: RMS must drop to 0
      java.util.Arrays.fill(w, 44, w.length, 0.toByte); w
    }
    val fLoud = Multimodal.RawFormatsCodec.features(quiet, 8)
    val fSilent = Multimodal.RawFormatsCodec.features(silent, 8)
    assert(fLoud.sum > 0.1f && fSilent.sum === 0.0f)

    // malformed input fails loudly, not silently
    intercept[IllegalArgumentException] {
      Multimodal.RawFormatsCodec.decodeHeader("image", "not a bmp".getBytes)
    }
  }

  test("ImageIOCodec decodes real PNG/JPEG/GIF round-trips (dims + content)") {
    for (fmt <- Seq("png", "jpg", "gif")) {
      val bytes = Multimodal.MediaSynth.image(40, 24, seed = 7L, format = fmt)
      // a genuine compressed container, not our own header: PNG magic /
      // JFIF-or-Exif marker / GIF87a-89a signature
      fmt match {
        case "png" => assert((bytes(0) & 0xff) === 0x89 && bytes(1) === 'P'.toByte)
        case "jpg" => assert((bytes(0) & 0xff) === 0xFF && (bytes(1) & 0xff) === 0xD8)
        case "gif" => assert(bytes.take(3) === Array[Byte]('G', 'I', 'F'))
      }
      assert(Multimodal.ImageIOCodec.decodeHeader("image", bytes) === ((40, 24, 0L)))
    }
    // content features: an all-dark vs all-bright PNG must separate, and a
    // lossless PNG of the SAME pattern must match its own re-encode exactly
    def solid(v: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(16, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 16) img.setRGB(x, y, (v << 16) | (v << 8) | v)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val dark = Multimodal.ImageIOCodec.features(solid(10), 4)
    val bright = Multimodal.ImageIOCodec.features(solid(240), 4)
    assert(dark.forall(f => math.abs(f - 10f / 255f) < 1e-4))
    assert(bright.forall(f => math.abs(f - 240f / 255f) < 1e-4))
    // audio delegates to the real WAV kernel; undecodable bytes fail loudly
    val wav = Multimodal.MediaSynth.wav(8000)
    assert(Multimodal.ImageIOCodec.decodeHeader("audio", wav) === ((0, 0, 1000L)))
    intercept[IllegalArgumentException] {
      Multimodal.ImageIOCodec.decodeHeader("image", "not an image".getBytes)
    }
  }

  test("G.711 u-law AU: real compressed-audio decode (header, codec, content)") {
    // codec inverse: expand(compress(s)) within u-law quantization error
    // (error bound grows with the segment: <= 2^exp * 8 over the bias form)
    for (pcm <- Seq(0, 1, -1, 7, 130, -2000, 12000, -12000, 32000, -32635)) {
      val rt = Multimodal.RawFormatsCodec.ulawToPcm(Multimodal.MediaSynth.pcmToUlaw(pcm))
      val tol = math.max(8, math.abs(pcm) / 16 + 8)
      assert(math.abs(rt - math.max(-32635, math.min(32635, pcm))) <= tol,
        s"pcm $pcm -> $rt")
    }
    // header: 12000 u-law samples at 8 kHz mono = 1500 ms
    val au = Multimodal.MediaSynth.au(12000, 8000)
    assert(au.take(4) === ".snd".getBytes("US-ASCII"))
    assert(Multimodal.RawFormatsCodec.decodeHeader("audio", au) === ((0, 0, 1500L)))
    // content: same sine signal as WAV → per-segment RMS must agree
    // within a few percent despite the 2:1 compression cycle (u-law
    // quantization error is ~2% relative at these amplitudes)
    val fAu = Multimodal.RawFormatsCodec.features(au, 8)
    val fWav = Multimodal.RawFormatsCodec.features(Multimodal.MediaSynth.wav(12000, 8000), 8)
    fAu.zip(fWav).foreach { case (a, w) =>
      assert(w > 0.1f && math.abs(a - w) / w < 0.05f, s"AU rms $a vs WAV rms $w") }
    // silence compresses to silence
    val silent = {
      val a = Multimodal.MediaSynth.au(4000)
      java.util.Arrays.fill(a, 24, a.length,
        Multimodal.MediaSynth.pcmToUlaw(0))
      a
    }
    assert(Multimodal.RawFormatsCodec.features(silent, 4).sum < 0.01f)
    // unsupported AU encodings fail loudly
    val aLaw = Multimodal.MediaSynth.au(100)
    aLaw(15) = 27 // encoding field -> A-law
    intercept[IllegalArgumentException] {
      Multimodal.RawFormatsCodec.decodeHeader("audio", aLaw)
    }
  }

  test("undecodable declared-image bytes fail loudly in features, like decodeHeader") {
    val junk = Array.tabulate[Byte](64)(i => (i * 7 + 3).toByte)
    intercept[IllegalArgumentException] {
      Multimodal.ImageIOCodec.features("image", junk, 8)
    }
    // the kindless sniffing path (no declared kind to honor) still degrades
    assert(Multimodal.ImageIOCodec.features(junk, 8).length === 8)
    // non-image kinds keep the raw-format chain
    val wav = Multimodal.MediaSynth.wav(800)
    assert(Multimodal.ImageIOCodec.features("audio", wav, 8).toSeq
      === Multimodal.RawFormatsCodec.features(wav, 8).toSeq)
  }

  test("corrupt AU headers (negative size/offset) are malformed, not negative durations") {
    val au = Multimodal.MediaSynth.au(100)
    val badSize = au.clone()
    badSize(8) = 0x80.toByte // data size -> large negative, NOT the -1 sentinel
    intercept[IllegalArgumentException] {
      Multimodal.RawFormatsCodec.decodeHeader("audio", badSize)
    }
    val badOff = au.clone()
    badOff(4) = 0x80.toByte // data offset -> negative
    intercept[IllegalArgumentException] {
      Multimodal.RawFormatsCodec.decodeHeader("audio", badOff)
    }
    // the -1 unknown-length sentinel still decodes (rest-of-stream)
    val unknown = au.clone()
    unknown(8) = 0xFF.toByte; unknown(9) = 0xFF.toByte
    unknown(10) = 0xFF.toByte; unknown(11) = 0xFF.toByte
    val (_, _, dur) = Multimodal.RawFormatsCodec.decodeHeader("audio", unknown)
    assert(dur === 100L * 1000 / 8000)
  }

  test("corrupt RIFF chunk lengths are malformed, not negative durations or hangs") {
    // data-chunk size with bit 31 set: unguarded, decodeHeader returns a
    // negative duration_ms (PCM and ADPCM branches both divide by it) and
    // a negative length on a pre-fmt junk chunk walks the offset BACKWARD
    val wav = Multimodal.MediaSynth.wav(100)
    val badData = wav.clone(); badData(43) = 0x80.toByte
    intercept[IllegalArgumentException] {
      Multimodal.RawFormatsCodec.decodeHeader("audio", badData)
    }
    val adpcm = Multimodal.MediaSynth.adpcmWav(505)
    val badAdpcm = adpcm.clone(); badAdpcm(47) = 0x80.toByte
    intercept[IllegalArgumentException] {
      Multimodal.RawFormatsCodec.decodeHeader("audio", badAdpcm)
    }
  }

  test("IMA ADPCM: real 4:1 decode matches an independent reference decoder") {
    // reference decoder written straight from the public IMA spec,
    // independent of the production kernel (shares only the constants)
    def refDecode(b: Array[Byte]): Array[Short] = {
      val st = Multimodal.ImaAdpcm.StepTable
      val it = Multimodal.ImaAdpcm.IndexTable
      def le16(off: Int) = ((b(off) & 0xff) | (b(off + 1) << 8)).toShort.toInt
      def le32(off: Int) = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
      // fixed layout of MediaSynth.adpcmWav: fmt body at 20, data at 48
      assert(le16(20) === 0x0011)
      val blockAlign = le16(32)
      val dataLen = le32(44)
      val out = scala.collection.mutable.ArrayBuffer.empty[Short]
      var off = 48
      while (off + blockAlign <= 48 + dataLen) {
        var pred = le16(off)
        var idx = b(off + 2) & 0xff
        out += pred.toShort
        for (i <- 0 until blockAlign - 4; nib <- Seq(b(off + 4 + i) & 0x0f,
            (b(off + 4 + i) >> 4) & 0x0f)) {
          val s = st(idx)
          var d = s >> 3
          if ((nib & 4) != 0) d += s
          if ((nib & 2) != 0) d += s >> 1
          if ((nib & 1) != 0) d += s >> 2
          pred = if ((nib & 8) != 0) pred - d else pred + d
          pred = math.max(-32768, math.min(32767, pred))
          idx = math.max(0, math.min(88, idx + it(nib & 7)))
          out += pred.toShort
        }
        off += blockAlign
      }
      out.toArray
    }
    val bytes = Multimodal.MediaSynth.adpcmWav(2020, seed = 3L)
    // 2020 samples / 505-per-block = 4 whole blocks
    assert(bytes.length === 48 + 4 * 256)
    val ref = refDecode(bytes)
    val mine = (0 until 4).flatMap(blk =>
      Multimodal.ImaAdpcm.decodeBlock(bytes, 48 + blk * 256, 256)).toArray
    assert(mine.toSeq === ref.toSeq, "kernel must equal the reference decoder")

    // the codec is REAL and lossy-but-faithful: decoded signal tracks the
    // source sine within a small relative RMS error after adaptation
    val src = (0 until 2020).map(s => (math.sin((s + 3L) * 0.1) * 12000).toInt)
    val errRms = math.sqrt(ref.zip(src).map { case (d, s) =>
      val e = d.toDouble - s; e * e }.sum / ref.length)
    val sigRms = math.sqrt(src.map(s => s.toDouble * s).sum / src.length)
    assert(errRms / sigRms < 0.05,
      f"ADPCM decode error ${errRms / sigRms}%.3f too high — not tracking")

    // duration from whole blocks; features comparable to the PCM WAV of
    // the same signal (same RMS statistic, same normalization)
    val (_, _, dur) = Multimodal.RawFormatsCodec.decodeHeader("audio", bytes)
    assert(dur === 4L * 505 * 1000 / 8000)
    val fA = Multimodal.RawFormatsCodec.features(bytes, 16)
    val fW = Multimodal.RawFormatsCodec.features(
      Multimodal.MediaSynth.wav(2020, seed = 3L), 16)
    val dist = math.sqrt(fA.zip(fW).map { case (a, b) =>
      (a - b).toDouble * (a - b) }.sum)
    assert(dist < 0.05, f"ADPCM/PCM feature distance $dist%.4f too large")

    // stereo and inconsistent block geometry fail loudly
    val stereo = bytes.clone(); stereo(22) = 2
    intercept[IllegalArgumentException] {
      Multimodal.RawFormatsCodec.decodeHeader("audio", stereo)
    }
    val badSpb = bytes.clone(); badSpb(38) = 7
    intercept[IllegalArgumentException] {
      Multimodal.RawFormatsCodec.decodeHeader("audio", badSpb)
    }
  }

  test("extractMeta runs the REAL codec through the partition-streamed path") {
    val media = (0L until 30L).map { id =>
      if (id % 2 == 0)
        Multimodal.MediaRow(id, "image",
          Multimodal.MediaSynth.bmp(16 + (id % 32).toInt, 8 + (id % 16).toInt, id))
      else
        Multimodal.MediaRow(id, "audio",
          Multimodal.MediaSynth.wav(800 * (1 + (id % 10).toInt)))
    }.toDS()
    val meta = Multimodal.extractMeta(media, Multimodal.RawFormatsCodec)
      .collect().map(m => m.media_id -> m).toMap
    (0L until 30L).foreach { id =>
      if (id % 2 == 0) {
        assert(meta(id).width === 16 + (id % 32).toInt)
        assert(meta(id).height === 8 + (id % 16).toInt)
      } else
        // 800*(1+id%10) samples / 8000 Hz = 100*(1+id%10) ms
        assert(meta(id).duration_ms === 100L * (1 + (id % 10)))
    }
  }
}
