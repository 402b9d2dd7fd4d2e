package graft.sinks.essnapshot

import java.util.zip.CRC32

/**
 * Lucene `CodecUtil` checksum framing, the envelope a real ES 5.x
 * `ChecksumBlobStoreFormat` wraps every `snap-*.dat` / `meta-*.dat` blob in
 * before the SMILE body (the reference inherits the framed blobs from its
 * embedded node and copies them byte-for-byte — BaseTransport.java:169-201
 * reads exactly these framed files when stitching). Public format, from the
 * Lucene 6.x `CodecUtil` javadoc/source:
 *
 * {{{
 *   header: BE int32 magic 0x3FD76C17
 *           codec name as a Lucene string (VInt byte length + UTF-8 bytes)
 *           BE int32 version
 *   body:   the wrapped content (SMILE here)
 *   footer: BE int32 magic 0xC02893E8 (~CODEC_MAGIC)
 *           BE int32 algorithm id 0 (CRC32 is the only defined algorithm)
 *           BE int64 CRC32 of every preceding byte (header + body + footer
 *           magic + algorithm id)
 * }}}
 *
 * Codec names/version are the ones ES 5.x's `BlobStoreRepository` registers
 * for its three `ChecksumBlobStoreFormat` instances: "snapshot" (root
 * SnapshotInfo AND per-shard BlobStoreIndexShardSnapshot), "index-metadata",
 * "metadata" (global cluster metadata), all at version 1.
 *
 * Zero dependencies — `java.util.zip.CRC32` and hand-rolled VInt.
 */
object LuceneFrame {

  val CodecMagic: Int = 0x3FD76C17
  val FooterMagic: Int = 0xC02893E8
  val FooterLength: Int = 16

  /** ES 5.x ChecksumBlobStoreFormat codec names. */
  val SnapshotCodec = "snapshot"
  val IndexMetadataCodec = "index-metadata"
  val MetadataCodec = "metadata"
  val Version = 1

  final case class Framed(codec: String, version: Int, body: Array[Byte])

  def isFramed(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 &&
      ((bytes(0) & 0xFF) << 24 | (bytes(1) & 0xFF) << 16 |
        (bytes(2) & 0xFF) << 8 | (bytes(3) & 0xFF)) == CodecMagic

  def wrap(codec: String, body: Array[Byte], version: Int = Version): Array[Byte] = {
    val name = codec.getBytes("UTF-8")
    require(name.length <= 127, s"codec name too long: $codec")
    val out = new java.io.ByteArrayOutputStream(
      4 + 1 + name.length + 4 + body.length + FooterLength)
    writeBeInt(out, CodecMagic)
    out.write(name.length) // VInt; always single-byte for these names
    out.write(name, 0, name.length)
    writeBeInt(out, version)
    out.write(body, 0, body.length)
    writeBeInt(out, FooterMagic)
    writeBeInt(out, 0) // algorithm id: CRC32
    val crc = new CRC32()
    val soFar = out.toByteArray
    crc.update(soFar, 0, soFar.length)
    writeBeLong(out, crc.getValue)
    out.toByteArray
  }

  /** Verify both magics and the CRC32 footer; throws on any corruption
    * (a flipped byte anywhere in the blob is detected). */
  def unwrap(bytes: Array[Byte]): Framed = {
    require(bytes.length >= 4 + 1 + 4 + FooterLength,
      s"blob too short for a CodecUtil frame: ${bytes.length} bytes")
    require(beInt(bytes, 0) == CodecMagic,
      f"bad header magic 0x${beInt(bytes, 0)}%08x (expected 0x$CodecMagic%08x)")
    var pos = 4
    // Lucene VInt: 7-bit groups little-endian, high bit = continuation
    var nameLen = 0
    var shift = 0
    var cont = true
    while (cont) {
      require(pos < bytes.length - FooterLength, "corrupt codec-name length")
      val b = bytes(pos) & 0xFF
      nameLen |= (b & 0x7F) << shift
      shift += 7
      pos += 1
      cont = (b & 0x80) != 0
    }
    require(nameLen >= 0 &&
      pos.toLong + nameLen + 4 + FooterLength <= bytes.length,
      s"corrupt codec-name length $nameLen")
    val codec = new String(bytes, pos, nameLen, "UTF-8")
    pos += nameLen
    val version = beInt(bytes, pos)
    pos += 4
    val footerStart = bytes.length - FooterLength
    require(footerStart >= pos, "frame footer overlaps header")
    require(beInt(bytes, footerStart) == FooterMagic,
      f"bad footer magic 0x${beInt(bytes, footerStart)}%08x")
    require(beInt(bytes, footerStart + 4) == 0,
      s"unknown checksum algorithm id ${beInt(bytes, footerStart + 4)}")
    val crc = new CRC32()
    crc.update(bytes, 0, footerStart + 8)
    val expected = beLong(bytes, footerStart + 8)
    require(crc.getValue == expected,
      f"checksum failed: computed 0x${crc.getValue}%016x, stored 0x$expected%016x")
    Framed(codec, version, java.util.Arrays.copyOfRange(bytes, pos, footerStart))
  }

  def unwrapExpecting(codec: String, bytes: Array[Byte]): Array[Byte] = {
    val f = unwrap(bytes)
    require(f.codec == codec, s"codec mismatch: '${f.codec}' (expected '$codec')")
    f.body
  }

  private def writeBeInt(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >>> 24) & 0xFF); out.write((v >>> 16) & 0xFF)
    out.write((v >>> 8) & 0xFF); out.write(v & 0xFF)
  }

  private def writeBeLong(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    writeBeInt(out, (v >>> 32).toInt); writeBeInt(out, v.toInt)
  }

  private def beInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) << 24 | (b(off + 1) & 0xFF) << 16 |
      (b(off + 2) & 0xFF) << 8 | (b(off + 3) & 0xFF)

  private def beLong(b: Array[Byte], off: Int): Long =
    (beInt(b, off).toLong << 32) | (beInt(b, off + 4).toLong & 0xFFFFFFFFL)
}
