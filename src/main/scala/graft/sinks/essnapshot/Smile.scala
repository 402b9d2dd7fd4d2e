package graft.sinks.essnapshot

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

/**
 * Minimal SMILE codec (Jackson's binary JSON wire format — public
 * specification at github.com/FasterXML/smile-format-specification) for
 * the snapshot-repository metadata bodies. A real Elasticsearch 5.x
 * `_restore` parses its `snap-*.dat` / `meta-*.dat` blobs as SMILE
 * (the reference gets the encoding for free from the embedded node —
 * ESEmbededContainer.java:169-221 — and rewrites the already-SMILE trees
 * in IndexingPostProcessor.java:195-216); this sink now writes the same
 * wire format from first principles.
 *
 * Deliberate subset, all within the spec:
 *  - WRITER emits header flags 0: shared property names, shared string
 *    values, and raw binary are never emitted (back-references save
 *    bytes but cost determinism-reasoning; metadata blobs are tiny).
 *  - READER additionally accepts the shared-property-names flag (0x01)
 *    and resolves both short (0x40-0x7F) and long (0x30-0x33) key
 *    back-references with the spec's 1024-entry clear-on-full table —
 *    Jackson, and hence a real ES 5.x node, writes SMILE with shared
 *    names enabled by default, so metadata copied OUT of a live repo
 *    parses. The raw-binary header flag (0x04) is likewise accepted —
 *    ES's SmileXContent declares it on every blob — with rejection
 *    deferred to an actual 0xFD token; shared string values (0x02,
 *    Jackson-default off) remain header-rejected.
 *  - integers always fit the int/long zigzag-VInt forms (no BigInteger),
 *    doubles use the 10-byte 7-bit-packed form, strings/keys cover every
 *    length class incl. the 0xFC-terminated long forms.
 *  - no optional 0xFF end-of-content marker (Jackson omits it too).
 *
 * Token values cited inline are from the public spec's token tables.
 */
object Smile {

  sealed trait SVal
  case object SNull extends SVal
  final case class SBool(v: Boolean) extends SVal
  final case class SLong(v: Long) extends SVal
  final case class SDouble(v: Double) extends SVal
  final case class SStr(v: String) extends SVal
  final case class SArr(items: Seq[SVal]) extends SVal
  /** Field order is preserved — byte-exact output needs a stable order. */
  final case class SObj(fields: Seq[(String, SVal)]) extends SVal

  object SObj { def of(fields: (String, SVal)*): SObj = SObj(fields.toSeq) }
  object SArr { def of(items: SVal*): SArr = SArr(items.toSeq) }

  /** ":)\n" magic + version/flags byte (0x00: V1, no shared names/values,
    * no raw binary). */
  val Header: Array[Byte] = Array(0x3A, 0x29, 0x0A, 0x00).map(_.toByte)

  // ── writer ──────────────────────────────────────────────────────────

  def write(v: SVal): Array[Byte] = {
    val out = new ByteArrayOutputStream(256)
    out.write(Header, 0, Header.length)
    writeVal(out, v)
    out.toByteArray
  }

  private def writeVal(out: ByteArrayOutputStream, v: SVal): Unit = v match {
    case SNull => out.write(0x21)
    case SBool(false) => out.write(0x22)
    case SBool(true) => out.write(0x23)
    case SLong(n) => writeLong(out, n)
    case SDouble(d) =>
      // 0x29 + 10 bytes: the 64 IEEE bits split big-endian into 7-bit
      // groups (first byte carries the single most-significant bit)
      out.write(0x29)
      val bits = java.lang.Double.doubleToLongBits(d)
      out.write(((bits >>> 63) & 0x7F).toInt)
      var j = 1
      while (j <= 9) { out.write(((bits >>> (63 - 7 * j)) & 0x7F).toInt); j += 1 }
    case SStr(s) => writeStringValue(out, s)
    case SArr(items) =>
      out.write(0xF8) // START_ARRAY
      items.foreach(writeVal(out, _))
      out.write(0xF9) // END_ARRAY
    case SObj(fields) =>
      out.write(0xFA) // START_OBJECT
      fields.foreach { case (k, fv) => writeKey(out, k); writeVal(out, fv) }
      out.write(0xFB) // END_OBJECT
  }

  private def writeLong(out: ByteArrayOutputStream, n: Long): Unit =
    if (n >= -16 && n <= 15) {
      // small-int token class 0xC0-0xDF embeds zigzag(-16..15) = 0..31
      out.write(0xC0 + zigzag(n).toInt)
    } else if (n >= Int.MinValue && n <= Int.MaxValue) {
      out.write(0x24) // 32-bit integer, zigzag VInt
      writeVInt(out, zigzag(n))
    } else {
      out.write(0x25) // 64-bit integer, zigzag VInt
      writeVInt(out, zigzag(n))
    }

  private def zigzag(n: Long): Long = (n << 1) ^ (n >> 63)
  private def unzigzag(u: Long): Long = (u >>> 1) ^ -(u & 1L)

  /** SMILE VInt: big-endian 7-bit groups with the high bit CLEAR,
    * terminated by one byte carrying the 6 low bits with 0x80 SET. */
  private def writeVInt(out: ByteArrayOutputStream, u: Long): Unit = {
    val last = ((u & 0x3F) | 0x80).toInt
    var rest = u >>> 6
    val pre = new Array[Int](10)
    var n = 0
    while (rest != 0) { pre(n) = (rest & 0x7F).toInt; rest >>>= 7; n += 1 }
    var i = n - 1
    while (i >= 0) { out.write(pre(i)); i -= 1 }
    out.write(last)
  }

  private def writeStringValue(out: ByteArrayOutputStream, s: String): Unit = {
    val b = s.getBytes(UTF_8)
    // classify by the ENCODED bytes, not the chars: a lone surrogate
    // encodes to the 1-byte replacement '?' — char-based classification
    // would route it to the tiny-Unicode class whose minimum length is 2
    // and emit an invalid token
    val ascii = asciiBytes(b)
    if (b.length == 0) out.write(0x20) // empty string
    else if (ascii && b.length <= 32) { out.write(0x40 + b.length - 1); out.write(b, 0, b.length) }
    else if (ascii && b.length <= 64) { out.write(0x60 + b.length - 33); out.write(b, 0, b.length) }
    else if (!ascii && b.length <= 33) { out.write(0x80 + b.length - 2); out.write(b, 0, b.length) }
    else if (!ascii && b.length <= 65) { out.write(0xA0 + b.length - 34); out.write(b, 0, b.length) }
    else {
      out.write(if (ascii) 0xE0 else 0xE4) // long text, 0xFC-terminated
      out.write(b, 0, b.length)
      out.write(0xFC)
    }
  }

  private def asciiBytes(b: Array[Byte]): Boolean = {
    var i = 0
    while (i < b.length) { if ((b(i) & 0x80) != 0) return false; i += 1 }
    true
  }

  private def writeKey(out: ByteArrayOutputStream, k: String): Unit = {
    val b = k.getBytes(UTF_8)
    val ascii = asciiBytes(b)
    if (b.length == 0) out.write(0x20) // empty key name
    else if (ascii && b.length <= 64) { out.write(0x80 + b.length - 1); out.write(b, 0, b.length) }
    else if (!ascii && b.length >= 2 && b.length <= 57) { out.write(0xC0 + b.length - 2); out.write(b, 0, b.length) }
    else {
      out.write(0x34) // long (unshared) key name, 0xFC-terminated
      out.write(b, 0, b.length)
      out.write(0xFC)
    }
  }

  // ── reader ──────────────────────────────────────────────────────────

  /** Decode one SMILE document. The reader accepts the shared-property-
    * names header flag (0x01) and resolves key back-references — Jackson,
    * and hence a real ES 5.x node, writes SMILE with shared names enabled
    * by default, so metadata copied out of a live repo now parses.
    * Shared string VALUES (0x02, off by default in Jackson) and raw
    * binary (0x04) stay rejected with a clear error. */
  def read(bytes: Array[Byte]): SVal = {
    require(bytes.length >= 4 && bytes(0) == 0x3A && bytes(1) == 0x29 &&
      bytes(2) == 0x0A, "not a SMILE document (missing :)\\n header)")
    // flags low nibble: 0x01 shared names (supported, read-side) /
    // 0x02 shared values (unsupported) / 0x04 raw binary — the raw bit
    // only DECLARES that token 0xFD may appear, and ES's SmileXContent
    // sets it on every blob (ENCODE_BINARY_AS_7BIT disabled), so a
    // header-level reject would refuse all real-repo metadata; accept
    // the flag and reject at an actual 0xFD token instead.
    require((bytes(3) & 0x02) == 0,
      f"unsupported SMILE features in header flags 0x${bytes(3)}%02x")
    val in = new Cursor(bytes, 4, sharedNames = (bytes(3) & 0x01) != 0)
    val v = readVal(in)
    v
  }

  private final class Cursor(val a: Array[Byte], var p: Int,
                             val sharedNames: Boolean = false) {
    def next(): Int = { val b = a(p) & 0xFF; p += 1; b }
    def take(n: Int): Array[Byte] = {
      val r = java.util.Arrays.copyOfRange(a, p, p + n); p += n; r
    }
    def untilMarker(): Array[Byte] = {
      val s = p
      while ((a(p) & 0xFF) != 0xFC) p += 1
      val r = java.util.Arrays.copyOfRange(a, s, p)
      p += 1 // consume 0xFC
      r
    }
    // Shared-name back-reference table (spec §"Shared name references"):
    // every literal key of 1-64 encoded bytes is appended in order of
    // appearance; at 1024 entries the table CLEARS before the next add.
    private val names = scala.collection.mutable.ArrayBuffer.empty[String]
    def noteName(key: String, encodedLen: Int): String = {
      if (sharedNames && encodedLen >= 1 && encodedLen <= 64) {
        if (names.length == 1024) names.clear()
        names += key
      }
      key
    }
    def sharedName(idx: Int): String = {
      require(sharedNames,
        s"shared key reference #$idx in a document whose header declares no shared names")
      require(idx < names.length,
        s"shared key reference #$idx beyond table size ${names.length}")
      names(idx)
    }
  }

  private def readVal(in: Cursor): SVal = {
    val t = in.next()
    t match {
      case 0x20 => SStr("")
      case 0x21 => SNull
      case 0x22 => SBool(false)
      case 0x23 => SBool(true)
      case 0x24 | 0x25 => SLong(unzigzag(readVInt(in)))
      case 0x29 =>
        var bits = 0L
        var j = 0
        while (j <= 9) { bits = (bits << 7) | in.next().toLong; j += 1 }
        SDouble(java.lang.Double.longBitsToDouble(bits))
      case 0xF8 =>
        val items = Seq.newBuilder[SVal]
        while ((in.a(in.p) & 0xFF) != 0xF9) items += readVal(in)
        in.p += 1
        SArr(items.result())
      case 0xFA =>
        val fields = Seq.newBuilder[(String, SVal)]
        while ((in.a(in.p) & 0xFF) != 0xFB) {
          val key = readKey(in)
          fields += ((key, readVal(in)))
        }
        in.p += 1
        SObj(fields.result())
      case n if n >= 0x40 && n <= 0x5F => SStr(new String(in.take(n - 0x40 + 1), UTF_8))
      case n if n >= 0x60 && n <= 0x7F => SStr(new String(in.take(n - 0x60 + 33), UTF_8))
      case n if n >= 0x80 && n <= 0x9F => SStr(new String(in.take(n - 0x80 + 2), UTF_8))
      case n if n >= 0xA0 && n <= 0xBF => SStr(new String(in.take(n - 0xA0 + 34), UTF_8))
      case n if n >= 0xC0 && n <= 0xDF => SLong(unzigzag((n - 0xC0).toLong))
      case 0xE0 | 0xE4 => SStr(new String(in.untilMarker(), UTF_8))
      case other =>
        throw new IllegalArgumentException(
          f"unsupported SMILE value token 0x$other%02x at ${in.p - 1}")
    }
  }

  private def readKey(in: Cursor): String = {
    val t = in.next()
    t match {
      case 0x20 => "" // never added to the shared table (has its own token)
      // 2-byte long shared ref: low 2 bits of the token are the high bits
      // of a 10-bit index (only indices >= 64 use this form)
      case n if n >= 0x30 && n <= 0x33 =>
        in.sharedName(((n - 0x30) << 8) | in.next())
      case 0x34 =>
        // long-form names are NOT added to the shared table — Jackson's
        // reader never notes long-name tokens, so noting a nonconforming
        // writer's short-name-in-long-form here would desynchronize
        // every later back-reference index
        val b = in.untilMarker()
        new String(b, UTF_8)
      // 1-byte short shared ref: indices 0-63
      case n if n >= 0x40 && n <= 0x7F => in.sharedName(n - 0x40)
      case n if n >= 0x80 && n <= 0xBF =>
        val len = n - 0x80 + 1
        in.noteName(new String(in.take(len), UTF_8), len)
      case n if n >= 0xC0 && n <= 0xF7 =>
        val len = n - 0xC0 + 2
        in.noteName(new String(in.take(len), UTF_8), len)
      case other =>
        throw new IllegalArgumentException(
          f"unsupported SMILE key token 0x$other%02x at ${in.p - 1}")
    }
  }

  private def readVInt(in: Cursor): Long = {
    var acc = 0L
    var b = in.next()
    while ((b & 0x80) == 0) { acc = (acc << 7) | b.toLong; b = in.next() }
    (acc << 6) | (b & 0x3F).toLong
  }

  // ── convenience accessors for decoded trees ─────────────────────────

  def field(v: SVal, name: String): Option[SVal] = v match {
    case SObj(fs) => fs.collectFirst { case (`name`, fv) => fv }
    case _ => None
  }
  def str(v: SVal, name: String): Option[String] =
    field(v, name).collect { case SStr(s) => s }
  def long(v: SVal, name: String): Option[Long] =
    field(v, name).collect { case SLong(n) => n }
  def arr(v: SVal, name: String): Seq[SVal] =
    field(v, name).collect { case SArr(items) => items }.getOrElse(Seq.empty)
}
