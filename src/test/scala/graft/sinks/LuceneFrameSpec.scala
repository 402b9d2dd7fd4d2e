package graft.sinks

import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.essnapshot.{LuceneFrame, Smile, SnapshotLayout}

/**
 * Golden-byte and corruption-detection tests for the Lucene CodecUtil
 * checksum frame around `.dat` SMILE bodies (the envelope
 * BaseTransport.java:169-201 reads when stitching a real ES 5.x repo).
 */
class LuceneFrameSpec extends AnyFunSuite {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  test("golden frame: codec 'snapshot' v1 around a 2-byte body, hand-derived") {
    // header magic | VInt(8) 'snapshot' | BE version 1 | body 'hi' |
    // footer magic | alg 0 | BE int64 CRC32 of everything prior
    val golden = bytes(
      0x3F, 0xD7, 0x6C, 0x17, 0x08, 0x73, 0x6E, 0x61, 0x70, 0x73, 0x68,
      0x6F, 0x74, 0x00, 0x00, 0x00, 0x01, 0x68, 0x69, 0xC0, 0x28, 0x93,
      0xE8, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0xB5, 0x18,
      0x9F, 0x82)
    val framed = LuceneFrame.wrap("snapshot", "hi".getBytes("UTF-8"))
    assert(framed.toSeq === golden.toSeq)
    val f = LuceneFrame.unwrap(golden)
    assert(f.codec === "snapshot")
    assert(f.version === 1)
    assert(new String(f.body, "UTF-8") === "hi")
  }

  test("any single flipped byte anywhere in the blob is detected") {
    val framed = LuceneFrame.wrap(LuceneFrame.SnapshotCodec,
      Smile.write(Smile.SObj.of("files" -> Smile.SArr.of(Smile.SStr("f1")))))
    for (i <- framed.indices) {
      val corrupt = framed.clone()
      corrupt(i) = (corrupt(i) ^ 0x40).toByte
      intercept[IllegalArgumentException] {
        LuceneFrame.unwrapExpecting(LuceneFrame.SnapshotCodec, corrupt)
      }
    }
  }

  test("truncated blobs fail loudly") {
    val framed = LuceneFrame.wrap("metadata", Array.fill[Byte](32)(7))
    intercept[IllegalArgumentException](LuceneFrame.unwrap(framed.take(10)))
    intercept[IllegalArgumentException](
      LuceneFrame.unwrap(framed.take(framed.length - 1)))
  }

  test("codec mismatch is rejected even when the checksum passes") {
    val framed = LuceneFrame.wrap("index-metadata", bytes(1, 2, 3))
    intercept[IllegalArgumentException](
      LuceneFrame.unwrapExpecting("snapshot", framed))
    assert(LuceneFrame.unwrapExpecting("index-metadata", framed).toSeq
      === Seq[Byte](1, 2, 3))
  }

  test("round-trip over arbitrary binary bodies including empty") {
    for (n <- Seq(0, 1, 7, 255, 4096)) {
      val body = Array.tabulate[Byte](n)(i => (i * 31 + 5).toByte)
      val f = LuceneFrame.unwrap(LuceneFrame.wrap("snapshot", body, version = 3))
      assert(f.version === 3)
      assert(f.body.toSeq === body.toSeq)
    }
  }

  test("datSmileBody: framed blobs are unwrapped, legacy bodies pass through") {
    val smile = Smile.write(Smile.SObj.of("k" -> Smile.SLong(1)))
    val framed = LuceneFrame.wrap(LuceneFrame.SnapshotCodec, smile)
    assert(SnapshotLayout.datSmileBody(framed).toSeq === smile.toSeq)
    assert(SnapshotLayout.datSmileBody(smile).toSeq === smile.toSeq)
    val legacyJson = """{"files":["a"]}""".getBytes("UTF-8")
    assert(SnapshotLayout.datSmileBody(legacyJson).toSeq === legacyJson.toSeq)
  }

  test("parseShardSnapFiles reads all three generations of snap bodies") {
    // current: framed SMILE (what shardSnapDat writes today)
    val current = SnapshotLayout.shardSnapDat("s", 1L, 2L, Seq(("f1", 1L), ("f2", 1L)))
    assert(LuceneFrame.isFramed(current))
    assert(SnapshotLayout.parseShardSnapFiles(current) === Seq("f1", "f2"))
    // round-5 repos: bare SMILE
    val bare = Smile.write(Smile.SObj.of(
      "files" -> Smile.SArr.of(Smile.SStr("g1"))))
    assert(SnapshotLayout.parseShardSnapFiles(bare) === Seq("g1"))
    // pre-round-5 repos: JSON
    val json = """{"files":["h1"]}""".getBytes("UTF-8")
    assert(SnapshotLayout.parseShardSnapFiles(json) === Seq("h1"))
  }
}
