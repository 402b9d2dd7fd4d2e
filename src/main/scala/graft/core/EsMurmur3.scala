package graft.core

/**
 * Exact re-implementation of the document-routing hash Elasticsearch 5.x
 * uses for shard placement, as consumed by the reference pipeline
 * (reference: src/main/java/com/simondata/elasticfreight/index/routing/
 * ElasticsearchRoutingStrategyV5.java:115-118, which delegates to
 * org.elasticsearch.cluster.routing.Murmur3HashFunction).
 *
 * Semantics (public knowledge — MurmurHash3 by Austin Appleby, public
 * domain; ES routing behavior documented in the ES reference guide):
 *   1. Encode the id string as bytes: each UTF-16 code unit becomes two
 *      little-endian bytes (low byte first). NOT UTF-8.
 *   2. murmur3_x86_32 over those bytes with seed 0.
 *
 * Spark's builtin `hash()` is murmur3 over UTF-8 bytes with seed 42 and a
 * different tail/encoding, so it CANNOT be used — a wrong hash silently
 * misplaces every document (SURVEY.md §7.3 hard part #2).
 */
object EsMurmur3 extends Serializable {

  /** murmur3_x86_32(bytes of `s` as LE UTF-16 code units, seed=0). */
  def hash(s: String): Int = {
    val len = s.length
    val nBytes = len * 2
    var h1 = 0 // seed 0
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593

    // Process 4 bytes (= 2 chars) at a time without materializing a byte[].
    var i = 0
    val nPairs = len & ~1 // round down to even char count
    while (i < nPairs) {
      val lo = s.charAt(i).toInt     // bytes 0,1 (LE)
      val hi = s.charAt(i + 1).toInt // bytes 2,3 (LE)
      var k1 = (lo & 0xffff) | ((hi & 0xffff) << 16)
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h1 ^= k1
      h1 = Integer.rotateLeft(h1, 13)
      h1 = h1 * 5 + 0xe6546b64
      i += 2
    }

    // Tail: odd char count leaves exactly 2 trailing bytes.
    if ((len & 1) == 1) {
      var k1 = s.charAt(len - 1).toInt & 0xffff
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h1 ^= k1
    }

    // fmix
    h1 ^= nBytes
    h1 ^= h1 >>> 16
    h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13
    h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }

  /** Non-negative shard index for a doc id: floorMod(hash(id), numShards)
    * (reference: ElasticsearchRoutingStrategyV5.java:115-118). */
  def shard(docId: String, numShards: Int): Int =
    Math.floorMod(hash(docId), numShards)
}
