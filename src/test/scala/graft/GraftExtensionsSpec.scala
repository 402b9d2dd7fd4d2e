package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.EsMurmur3

class GraftExtensionsSpec extends AnyFunSuite {

  test("SQL functions registered via SparkSessionExtensions") {
    // getOrCreate would return the shared no-extensions session; this suite
    // needs its own (suites run sequentially: Test/parallelExecution=false)
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .foreach(_.stop())
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("ext-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions())
      .getOrCreate()
    try {
      val r = spark.sql(
        """SELECT es_murmur3('hello') AS h, es_shard('hello', 5) AS s,
          |       simhash64('the quick brown fox') AS f,
          |       size(minhash_sig('some text to sketch', 32, 4)) AS k,
          |       hyperplane_sig(array(cast(1.0 as float), cast(0.0 as float)), 8, 42) AS hp,
          |       cosine_sim(array(cast(1.0 as float), cast(0.0 as float)),
          |                  array(cast(1.0 as float), cast(0.0 as float))) AS cs,
          |       sig_agree(minhash_sig('abcdef', 32, 4),
          |                 minhash_sig('abcdef', 32, 4)) AS sa,
          |       canonical_tokens('B a b') AS ct,
          |       word_ngrams('New York City', 2) AS ng,
          |       word_skipgrams('a b c', 2) AS sg,
          |       repetition_stats('a b a b', 2) AS rs,
          |       char_entropy('aabb') AS ce,
          |       zorder62(3, 1) AS z,
          |       zorder63(1, 1, 1) AS z3,
          |       canonical_url('HTTPS://WWW.Example.COM:443/Path/?utm_source=x#f') AS cu,
          |       nfc_clean('  a\tb  ') AS nc,
          |       jaro_sim('martha', 'marhta') AS js,
          |       jaro_winkler_sim('martha', 'marhta') AS jws
          |""".stripMargin).head()
      assert(r.getInt(0) === EsMurmur3.hash("hello"))
      assert(r.getInt(1) === EsMurmur3.shard("hello", 5))
      assert(r.getLong(2) !== 0L)
      assert(r.getInt(3) === 32)
      assert(r.getLong(4) >= 0L && r.getLong(4) < 256L)
      assert(r.getDouble(5) === 1.0)
      assert(r.getInt(6) === 32)
      assert(r.getString(7) === "a b")
      assert(r.getSeq[String](8) === Seq("new york", "york city"))
      assert(r.getSeq[String](9) === Seq("a b", "b a", "a c", "c a",
        "b c", "c b"))
      // [ntok=4, grams=3, max("a b")=2, dup occurrences=2]
      assert(r.getSeq[Long](10) === Seq(4L, 3L, 2L, 2L))
      assert(r.getDouble(11) === 1.0)
      // a=0b11 → even bits 0,2; b=0b1 → odd bit 1 → 0b111 = 7
      assert(r.getLong(12) === 7L)
      // three dims, bit 0 each → bits 0,1,2 → 7
      assert(r.getLong(13) === 7L)
      assert(r.getString(14) === "https://example.com/Path")
      assert(r.getString(15) === "a b")
      assert(math.abs(r.getDouble(16) - 0.9444444444444445) < 1e-12)
      assert(math.abs(r.getDouble(17) - 0.9611111111111111) < 1e-12)

      // sketch probes: the serialized sketch rides in as a binary literal
      val cms = org.apache.spark.util.sketch.CountMinSketch.create(0.01, 0.99, 42)
      Seq(7L, 7L, 7L, 9L).foreach(v => cms.add(java.lang.Long.valueOf(v)))
      val cmsOut = new java.io.ByteArrayOutputStream()
      cms.writeTo(cmsOut)
      val cmsHex = cmsOut.toByteArray.map("%02X".format(_)).mkString
      val bf = org.apache.spark.util.sketch.BloomFilter.create(4, 0.01)
      bf.putLong(42L)
      val bfOut = new java.io.ByteArrayOutputStream()
      bf.writeTo(bfOut)
      val bfHex = bfOut.toByteArray.map("%02X".format(_)).mkString
      val r2 = spark.sql(
        s"""SELECT cms_ge(CAST(7 AS BIGINT), X'$cmsHex', 3) AS heavy,
           |       cms_ge(CAST(9 AS BIGINT), X'$cmsHex', 3) AS light,
           |       bloom_contains(CAST(42 AS BIGINT), X'$bfHex') AS present
           |""".stripMargin).head()
      assert(r2.getBoolean(0) === true)   // count(7)=3 >= 3
      assert(r2.getBoolean(1) === false)  // count(9)=1 < 3 (no collision at this width)
      assert(r2.getBoolean(2) === true)   // no false negatives
    } finally spark.stop() // this suite owns its session (extensions differ)
  }
}
