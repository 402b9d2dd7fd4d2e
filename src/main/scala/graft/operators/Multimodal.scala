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
 * NOTE: no image/audio/video codecs exist in this environment, so the
 * decode kernels are STUBS — deterministic fakes over the byte content,
 * clearly marked below. The Spark-side plumbing (schema, partitioning,
 * batch iteration, feature schema) is real and tested; swapping a stub
 * for a JNI/javacv call changes one function body.
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
      rows.map(m => MediaFeature(m.media_id, m.kind, codec.features(m.bytes, dim))))
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
