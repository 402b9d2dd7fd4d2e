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
}
