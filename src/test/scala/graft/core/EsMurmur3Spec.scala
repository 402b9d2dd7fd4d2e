package graft.core

import org.scalatest.funsuite.AnyFunSuite

/**
 * Locks the ES-murmur3 port (SURVEY.md §7.3 hard part #2).
 *
 * Fixture vectors were generated with an independent Python
 * murmur3_x86_32-over-UTF-16LE implementation, which itself reproduces the
 * publicly known Elasticsearch Murmur3HashFunction test values
 * ("hell" → 0x5a0cb7c3, "hello" → 0xd7c31989, "hello w" → 0x22ab2984,
 * lazy dog → 0xe07db09c, lazy cog → 0x4e63d2ad).
 */
class EsMurmur3Spec extends AnyFunSuite {

  test("publicly known ES Murmur3HashFunction vectors") {
    assert(EsMurmur3.hash("hell") === 0x5a0cb7c3)
    assert(EsMurmur3.hash("hello") === 0xd7c31989.toInt)
    assert(EsMurmur3.hash("hello w") === 0x22ab2984)
    assert(EsMurmur3.hash("The quick brown fox jumps over the lazy dog") === 0xe07db09c.toInt)
    assert(EsMurmur3.hash("The quick brown fox jumps over the lazy cog") === 0x4e63d2ad)
  }

  test("empty and non-ASCII strings hash deterministically") {
    // len 0: fmix(seed=0 ^ 0) == 0
    assert(EsMurmur3.hash("") === 0)
    // non-ASCII chars exercise the high byte of the UTF-16 code unit
    assert(EsMurmur3.hash("é") === EsMurmur3.hash("é")) // stable
    assert(EsMurmur3.hash("é") !== EsMurmur3.hash("e")) // high byte matters
  }

  // The reference's fixed test fixtures (reference:
  // src/test/java/com/simondata/elasticfreight/ElasticsearchRoutingStrategyV5Test.java:29-43)
  // with independently computed raw hashes.
  val orgHashes: Map[String, Int] = Map(
    "ed1121bf-5e61-4ac5-ad99-c24f8c4f79db" -> 1488290167,
    "b8864a7e-98d9-4bef-af1e-54c8bea7ae40" -> -1779608763,
    "decccc4f-2c96-4f4c-890f-eb1433ff4c90" -> 1542941743,
    "1650943b-b125-41cf-9729-3bd3e164da16" -> 1244686175,
    "005a22cc-afbb-4bbe-97e9-6f1447293ed7" -> 2040531125,
    "e29469e1-02a1-4d63-91ef-40affca740a8" -> 1311057454,
    "400cdb2f-7573-444e-9612-e218ff1c8387" -> -1166009709,
    "aec66b84-6c34-466b-8991-031cba01241b" -> 1388052565,
    "53adf13e-ce20-4112-9809-6aa29c60dfa5" -> 748678093,
    "f7f8ff19-81bf-49b1-a896-e996674d5a1f" -> -971487870,
    "2eb8db9f-d3ae-4d9a-ac78-55cb792e0d2d" -> 1885382507,
    "3b984743-49bd-47d9-b38f-da3f822db03a" -> 834949501,
    "b68edfd1-305f-4d31-9443-605ba05eb5cc" -> -1331732304,
    "0c8ce21d-3bb5-4dab-9531-1e2f3320259e" -> -886712676,
    "254f6bec-8b3d-48d2-976a-ba4a3517558b" -> -117634291,
  )

  test("reference UUID fixtures hash to the independently computed values") {
    orgHashes.foreach { case (id, h) => assert(EsMurmur3.hash(id) === h, id) }
  }

  test("shard-number routing-table hashes (strategy V5 shard→routing)") {
    val expected = Seq(384918240, -126235597, -303927213, -1151172406,
      -1265741853, -1501624929, -1677976503, -1167431322, 735335986, 824610026)
    (0 until 10).foreach(i => assert(EsMurmur3.hash(i.toString) === expected(i)))
  }

  test("shard() is floorMod and always in range (property over seeded random ids)") {
    val rnd = new scala.util.Random(42)
    (1 to 2000).foreach { _ =>
      val s = rnd.alphanumeric.take(rnd.nextInt(40)).mkString +
        (if (rnd.nextBoolean()) "é中" else "")
      val n = 1 + rnd.nextInt(1024)
      val sh = EsMurmur3.shard(s, n)
      assert(sh >= 0 && sh < n)
      assert(sh === Math.floorMod(EsMurmur3.hash(s), n))
    }
  }
}
