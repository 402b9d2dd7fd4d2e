package graft.sinks

import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.essnapshot.Smile
import graft.sinks.essnapshot.Smile._

/**
 * Conformance of the minimal SMILE codec against HAND-DERIVED golden
 * bytes from the public smile-format-specification (token tables cited
 * per case below) — the encoder is never trusted to check itself except
 * in the explicit round-trip properties at the end.
 */
class SmileSpec extends AnyFunSuite {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  test("header: ':)\\n' magic + flags 0 (no shared names/values, no raw)") {
    assert(Smile.write(SNull).take(4) === bytes(0x3A, 0x29, 0x0A, 0x00))
  }

  test("literals: null / false / true / empty string (tokens 0x21-0x23, 0x20)") {
    assert(Smile.write(SNull).drop(4) === bytes(0x21))
    assert(Smile.write(SBool(false)).drop(4) === bytes(0x22))
    assert(Smile.write(SBool(true)).drop(4) === bytes(0x23))
    assert(Smile.write(SStr("")).drop(4) === bytes(0x20))
  }

  test("small ints -16..15: single byte 0xC0 + zigzag") {
    // zigzag(0)=0, zigzag(-1)=1, zigzag(1)=2, zigzag(-16)=31, zigzag(15)=30
    assert(Smile.write(SLong(0)).drop(4) === bytes(0xC0))
    assert(Smile.write(SLong(-1)).drop(4) === bytes(0xC1))
    assert(Smile.write(SLong(1)).drop(4) === bytes(0xC2))
    assert(Smile.write(SLong(-16)).drop(4) === bytes(0xDF))
    assert(Smile.write(SLong(15)).drop(4) === bytes(0xDE))
  }

  test("32-bit int: token 0x24 + zigzag VInt (6-bit final byte, 0x80 set)") {
    // 16 → zigzag 32 = 0b100000: fits the 6-bit final byte → 0x80|32
    assert(Smile.write(SLong(16)).drop(4) === bytes(0x24, 0xA0))
    // 64 → zigzag 128 = 0b10000000: 6-bit final 000000, one prefix group 10
    assert(Smile.write(SLong(64)).drop(4) === bytes(0x24, 0x02, 0x80))
    // 1000 → zigzag 2000 = 0b11111010000 → groups 11111 (prefix 0x1F),
    //   final 6 bits 010000 → 0x80|0x10 = 0x90
    assert(Smile.write(SLong(1000)).drop(4) === bytes(0x24, 0x1F, 0x90))
    // -1000 → zigzag 1999 = 0b11111001111 → prefix 0x1F, final 0x80|0x0F
    assert(Smile.write(SLong(-1000)).drop(4) === bytes(0x24, 0x1F, 0x8F))
  }

  test("64-bit long: token 0x25 + zigzag VInt") {
    // 2^40 → zigzag 2^41: bit 41 set. Final byte takes bits 0-5 (zero);
    // bits 6-41 split into 6 seven-bit groups, only the top group's lowest
    // bit (overall bit 41 = 6 + 5*7 + 0·… ) is set → prefix 01 00 00 00 00 00
    assert(Smile.write(SLong(1L << 40)).drop(4)
      === bytes(0x25, 0x01, 0x00, 0x00, 0x00, 0x00, 0x00, 0x80))
  }

  test("tiny/short ASCII strings: 0x40+len-1 / 0x60+len-33 + raw bytes") {
    assert(Smile.write(SStr("a")).drop(4) === bytes(0x40, 'a'))
    assert(Smile.write(SStr("abc")).drop(4) === bytes(0x42, 'a', 'b', 'c'))
    val s32 = "x" * 32
    assert(Smile.write(SStr(s32)).drop(4).head === 0x5F.toByte) // 0x40+31
    val s33 = "y" * 33
    assert(Smile.write(SStr(s33)).drop(4).head === 0x60.toByte) // 0x60+0
    val s64 = "z" * 64
    assert(Smile.write(SStr(s64)).drop(4).head === 0x7F.toByte) // 0x60+31
  }

  test("long ASCII string: 0xE0 + bytes + 0xFC end marker") {
    val s65 = "w" * 65
    val enc = Smile.write(SStr(s65)).drop(4)
    assert(enc.head === 0xE0.toByte && enc.last === 0xFC.toByte)
    assert(enc.length === 1 + 65 + 1)
  }

  test("tiny Unicode string: 0x80 + utf8len-2 + raw UTF-8 bytes") {
    // "é" = 2 UTF-8 bytes (0xC3 0xA9) → token 0x80
    assert(Smile.write(SStr("é")).drop(4) === bytes(0x80, 0xC3, 0xA9))
    // "aé" = 3 bytes → token 0x81
    assert(Smile.write(SStr("aé")).drop(4) === bytes(0x81, 'a', 0xC3, 0xA9))
  }

  test("double: token 0x29 + 10 bytes of big-endian 7-bit groups") {
    // 1.0 = IEEE 0x3FF0000000000000; bit 63 (sign) = 0 → first byte 0;
    // bits 62..56 = 0111111 = 0x3F; bits 55..49 = 1111000 = 0x78; rest 0
    val enc = Smile.write(SDouble(1.0)).drop(4)
    assert(enc.head === 0x29.toByte && enc.length === 11)
    assert(enc(1) === 0x00.toByte && enc(2) === 0x3F.toByte && enc(3) === 0x78.toByte)
    assert(enc.drop(4).forall(_ === 0x00.toByte))
  }

  test("object with short ASCII keys: 0xFA, 0x80+len-1 keys, 0xFB") {
    // {"a": 1} → FA, key 0x80 'a', value 0xC2, FB
    assert(Smile.write(SObj.of("a" -> SLong(1))).drop(4)
      === bytes(0xFA, 0x80, 'a', 0xC2, 0xFB))
    // nested: {"k": {"ab": true}} — key "ab" → 0x81
    assert(Smile.write(SObj.of("k" -> SObj.of("ab" -> SBool(true)))).drop(4)
      === bytes(0xFA, 0x80, 'k', 0xFA, 0x81, 'a', 'b', 0x23, 0xFB, 0xFB))
  }

  test("array: 0xF8 items 0xF9") {
    assert(Smile.write(SArr.of(SLong(0), SStr("ab"), SNull)).drop(4)
      === bytes(0xF8, 0xC0, 0x41, 'a', 'b', 0x21, 0xF9))
  }

  test("golden document: a realistic shard-snap shape, full byte dump") {
    val doc = SObj.of(
      "snapshot" -> SStr("snap"),
      "shard" -> SLong(3),
      "files" -> SArr.of(SStr("f1")))
    val expected = bytes(
      0x3A, 0x29, 0x0A, 0x00, // header
      0xFA, // {
      0x87, 's', 'n', 'a', 'p', 's', 'h', 'o', 't', // key "snapshot" (8)
      0x43, 's', 'n', 'a', 'p', // value "snap" (tiny ASCII 4)
      0x84, 's', 'h', 'a', 'r', 'd', // key "shard" (5)
      0xC6, // small int zigzag(3)=6
      0x84, 'f', 'i', 'l', 'e', 's', // key "files" (5)
      0xF8, 0x41, 'f', '1', 0xF9, // ["f1"]
      0xFB) // }
    assert(Smile.write(doc) === expected)
    assert(Smile.read(expected) === doc)
  }

  test("round-trip: decode(encode(v)) == v across the value space") {
    val samples: Seq[SVal] = Seq(
      SNull, SBool(true), SBool(false), SStr(""), SStr("a" * 100),
      SStr("unicode é中文 " + ("é" * 40)),
      SLong(0), SLong(-16), SLong(15), SLong(16), SLong(-17),
      SLong(Int.MaxValue), SLong(Int.MinValue), SLong(Long.MaxValue),
      SLong(Long.MinValue), SDouble(0.0), SDouble(-1.5), SDouble(math.Pi),
      SArr(Seq.empty), SObj(Seq.empty),
      SObj.of(
        "key-with-a-rather-long-ascii-name-padded-" + ("x" * 40) -> SLong(7),
        "unicodé-key" -> SStr("v"),
        "nested" -> SArr.of(SObj.of("deep" -> SArr.of(SLong(1), SNull)))))
    for (v <- samples)
      assert(Smile.read(Smile.write(v)) === v, s"round-trip failed for $v")
    // and a full metadata-shaped tree
    val tree = SObj.of(
      "name" -> SStr("snapname"), "uuid" -> SStr("u" * 36),
      "state" -> SStr("SUCCESS"),
      "indices" -> SArr.of(SStr("idx_a"), SStr("idx_b")),
      "total_docs" -> SLong(1234567890123L),
      "version" -> SStr("graft-layout-1"))
    assert(Smile.read(Smile.write(tree)) === tree)
  }

  test("lone surrogates degrade to valid SMILE (UTF-8 replacement), never a bad token") {
    // "\uD800" has no UTF-8 encoding; getBytes yields the 1-byte '?'. A
    // char-based ASCII check would route it to the tiny-Unicode class
    // (minimum length 2) and emit the invalid token 0x7F — byte-based
    // classification keeps the document well-formed.
    val enc = Smile.write(SStr("\uD800"))
    assert(enc.drop(4) === bytes(0x40, '?'))
    assert(Smile.read(enc) === SStr("?"))
  }

  test("parseShardSnapFiles reads legacy JSON bodies AND current SMILE bodies") {
    import graft.sinks.essnapshot.SnapshotLayout
    // pre-round-5 repos wrote JSON .dat bodies; swallowing a parse
    // failure would let the commit sweep delete their data files
    val legacy = """{"snapshot":"s","files":["docs-a.ndjson.gz","docs-b.ndjson.gz"]}"""
      .getBytes("UTF-8")
    assert(SnapshotLayout.parseShardSnapFiles(legacy)
      === Seq("docs-a.ndjson.gz", "docs-b.ndjson.gz"))
    val smile = SnapshotLayout.shardSnapDat("s", 1L, 2L, Seq(("f1", 2L)))
    assert(SnapshotLayout.parseShardSnapFiles(smile) === Seq("f1"))
  }

  test("metadata blobs carry user JSON as parsed trees in ES 5.x shapes") {
    import graft.sinks.essnapshot.SnapshotLayout
    val mappings = """{"doc":{"properties":{
      "user_id":{"type":"keyword"},"n":{"type":"long","null_value":null},
      "boost":1.5,"enabled":true,"tags":["a","b"]}}}"""
    val im = Smile.field(Smile.read(SnapshotLayout.datSmileBody(
      SnapshotLayout.indexMetaDat("idx", "IDXID", 2, mappings))), "idx").get
    val mapped = Smile.arr(im, "mappings").head
    val props = Smile.field(Smile.field(mapped, "doc").get, "properties").get
    // nested objects, strings, longs, doubles, booleans, nulls, arrays all
    // survive as typed SMILE values — not a quoted JSON string
    assert(Smile.str(Smile.field(props, "user_id").get, "type")
      .contains("keyword"))
    assert(Smile.field(Smile.field(props, "n").get, "null_value")
      .contains(SNull))
    assert(Smile.field(props, "boost").contains(SDouble(1.5)))
    assert(Smile.field(props, "enabled").contains(SBool(true)))
    assert(Smile.field(props, "tags")
      .contains(SArr(Seq(SStr("a"), SStr("b")))))
    // template lands under its NAME inside meta-data.templates
    val rt = Smile.read(SnapshotLayout.datSmileBody(SnapshotLayout
      .rootMetaDat("cluster-x", "tmpl_events",
        """{"template":"idx*","settings":{"index.refresh_interval":"-1"}}""")))
    val tmpl = Smile.field(Smile.field(
      Smile.field(rt, "meta-data").get, "templates").get, "tmpl_events").get
    assert(Smile.str(tmpl, "template").contains("idx*"))
  }

  test("reader rejects shared-VALUE headers and unknown tokens; raw flag tolerated") {
    intercept[IllegalArgumentException](
      Smile.read(bytes(0x3A, 0x29, 0x0A, 0x02, 0x21))) // shared values
    // the raw-binary bit only DECLARES 0xFD may appear — ES sets it on
    // every blob (flags 0x05), so the header must pass and rejection
    // happens at an actual raw token
    assert(Smile.read(bytes(0x3A, 0x29, 0x0A, 0x04, 0x21)) === SNull)
    assert(Smile.read(bytes(0x3A, 0x29, 0x0A, 0x05, 0xFA, 0x80, 'a', 0xC2,
      0xFB)) === SObj.of("a" -> SLong(1))) // the real-repo header shape
    intercept[IllegalArgumentException](
      Smile.read(bytes(0x3A, 0x29, 0x0A, 0x05, 0xFD))) // actual raw token
    intercept[IllegalArgumentException](Smile.read(bytes(0x7B, 0x7D))) // "{}"
    // unsupported value token (BigDecimal 0x2A)
    intercept[IllegalArgumentException](
      Smile.read(bytes(0x3A, 0x29, 0x0A, 0x00, 0x2A)))
  }

  test("shared-name flag: short key back-references resolve (hand-derived)") {
    // flags 0x01 (shared names — what Jackson/ES 5.x writes by default);
    // {"a":1,"b":{"a":2}} with the second "a" as short shared ref #0:
    //   FA  80 'a'  C2   80 'b'  FA  40  C4  FB  FB
    // ("a" enters the table at first literal appearance; 0x40+0 refs it)
    val doc = bytes(0x3A, 0x29, 0x0A, 0x01,
      0xFA, 0x80, 'a', 0xC2, 0x80, 'b',
      0xFA, 0x40, 0xC4, 0xFB, 0xFB)
    assert(Smile.read(doc) === SObj.of(
      "a" -> SLong(1),
      "b" -> SObj.of("a" -> SLong(2))))
    // a reference in a flags-0 document is still rejected
    intercept[IllegalArgumentException](Smile.read(bytes(
      0x3A, 0x29, 0x0A, 0x00, 0xFA, 0x40, 0xC2, 0xFB)))
    // a reference beyond the table is rejected, not mis-resolved
    intercept[IllegalArgumentException](Smile.read(bytes(
      0x3A, 0x29, 0x0A, 0x01, 0xFA, 0x41, 0xC2, 0xFB)))
  }

  test("shared-name flag: long (2-byte) refs and the 1024-entry clear-on-full table") {
    // Build {"k0000":0,...,"k0099":0,"k0065":0} with the repeat encoded as
    // the 2-byte long-ref form (index 65 >= 64 → token 0x30, low byte 65)
    val out = new java.io.ByteArrayOutputStream()
    out.write(bytes(0x3A, 0x29, 0x0A, 0x01)); out.write(0xFA)
    for (i <- 0 until 100) {
      val k = f"k$i%04d" // 5 ASCII bytes → short-name token 0x80+4
      out.write(0x80 + k.length - 1); out.write(k.getBytes("UTF-8"))
      out.write(0xC0) // zigzag(0)
    }
    out.write(0x30); out.write(65); out.write(0xC0) // long ref #65
    out.write(0xFB)
    val tree = Smile.read(out.toByteArray).asInstanceOf[SObj]
    assert(tree.fields.length === 101)
    assert(tree.fields.last === ("k0065" -> SLong(0)))

    // Clear-on-full: after 1024 names the table resets, so ref #0 then
    // resolves to the 1025th name, not the 1st
    val big = new java.io.ByteArrayOutputStream()
    big.write(bytes(0x3A, 0x29, 0x0A, 0x01)); big.write(0xFA)
    for (i <- 0 until 1025) {
      val k = f"n$i%04d"
      big.write(0x80 + k.length - 1); big.write(k.getBytes("UTF-8"))
      big.write(0xC0)
    }
    big.write(0x40); big.write(0xC0) // short ref #0 → "n1024" post-reset
    big.write(0xFB)
    val bigTree = Smile.read(big.toByteArray).asInstanceOf[SObj]
    assert(bigTree.fields.last === ("n1024" -> SLong(0)))
  }
}
