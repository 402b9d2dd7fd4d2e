package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import org.apache.spark.sql.graft.ZOrderRuntime

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Bit-by-bit reference: z bit 2i = a bit i, z bit 2i+1 = b bit i. */
  private def refZ(a: Long, b: Long): Long = {
    var z = 0L
    for (i <- 0 until 31) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("zorder62 matches the bit-by-bit reference on random and edge values") {
    val rnd = new scala.util.Random(7)
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L),
        (0x7FFFFFFFL, 0x7FFFFFFFL), (0x7FFFFFFFL, 0L),
        (0xFFFFFFFFFFL, 5L) /* masked down to 31 bits */) ++
      Seq.fill(500)((rnd.nextLong().abs, rnd.nextLong().abs))
    cases.foreach { case (a, b) =>
      assert(ZOrderRuntime.zorder62(a, b) ===
        refZ(a & 0x7FFFFFFFL, b & 0x7FFFFFFFL), s"a=$a b=$b")
      assert(ZOrderRuntime.zorder62(a, b) >= 0L, "must stay positive")
    }
    // expression path agrees with the runtime
    val viaExpr = Seq((12345L, 67890L)).toDF("a", "b")
      .select(graft.functions.Layout.zorder62(col("a"), col("b")))
      .as[Long].head()
    assert(viaExpr === ZOrderRuntime.zorder62(12345L, 67890L))
  }

  test("zorder63 matches a bit-by-bit 3-way reference") {
    def ref3(a: Long, b: Long, c: Long): Long = {
      var z = 0L
      for (i <- 0 until 21) {
        z |= ((a >> i) & 1L) << (3 * i)
        z |= ((b >> i) & 1L) << (3 * i + 1)
        z |= ((c >> i) & 1L) << (3 * i + 2)
      }
      z
    }
    val rnd = new scala.util.Random(11)
    val cases = Seq((0L, 0L, 0L), (0x1FFFFFL, 0x1FFFFFL, 0x1FFFFFL),
        (1L, 2L, 4L), (0xFFFFFFFFL, 0L, 7L)) ++
      Seq.fill(300)((rnd.nextLong().abs, rnd.nextLong().abs, rnd.nextLong().abs))
    cases.foreach { case (a, b, c) =>
      assert(ZOrderRuntime.zorder63(a, b, c) ===
        ref3(a & 0x1FFFFFL, b & 0x1FFFFFL, c & 0x1FFFFFL), s"($a,$b,$c)")
      assert(ZOrderRuntime.zorder63(a, b, c) >= 0L)
    }
  }

  test("withQuantileBucket: order-preserving, bounded range, ~uniform occupancy") {
    import graft.operators.DataLayout
    // heavily skewed domain (epoch-nano-scale magnitudes)
    val df = spark.range(0, 20000).select(
      (col("id") * col("id") * 1000000L + 1700000000000000000L).as("v"))
    val out = DataLayout.withQuantileBucket(df, col("v"), "b", buckets = 64)
    val stats = out.agg(min("b"), max("b"),
      countDistinct("b")).head()
    assert(stats.getLong(0) >= 0L && stats.getLong(1) < 64L)
    assert(stats.getLong(2) > 48L) // skew flattened into most buckets
    // order-preserving: bucket is monotone in the value
    val viol = out.join(out.withColumnRenamed("v", "v2").withColumnRenamed("b", "b2")
        .sample(0.01, 7), col("v") < col("v2") && col("b") > col("b2"), "inner")
      .count()
    assert(viol === 0L)
  }

  test("withQuantileBucket: NULL values stay NULL, not bucket 0") {
    import graft.operators.DataLayout
    val df = spark.range(0, 100).select(
      when(col("id") % 10 === 0, lit(null).cast("long"))
        .otherwise(col("id")).as("v"))
    val out = DataLayout.withQuantileBucket(df, col("v"), "b", buckets = 8)
    assert(out.filter(col("v").isNull && col("b").isNotNull).count() === 0L)
    assert(out.filter(col("v").isNull).count() === 10L)
    // non-null rows still bucket normally
    assert(out.filter(col("v").isNotNull && col("b").isNull).count() === 0L)
  }

  test("clusterByZOrder co-clusters BOTH dimensions; single-key sort does not") {
    import graft.operators.DataLayout
    val n = 65536
    val df = spark.range(n).select(
      (col("id") * 2654435761L % 1024).as("u"),
      (col("id") * 40503L % 1024).as("t"))

    def meanSpreads(laid: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val s = laid
        .withColumn("p", spark_partition_id())
        .groupBy("p")
        .agg((max("u") - min("u")).as("su"), (max("t") - min("t")).as("st"))
        .agg(avg("su").as("au"), avg("st").as("at"))
        .head()
      (s.getDouble(0), s.getDouble(1))
    }

    // explicit 16 tiles (AQE would coalesce an un-sized range exchange
    // at this row count, flattening the layout under test)
    val (zu, zt) = meanSpreads(
      DataLayout.clusterByZOrder(df, "u", "t", numPartitions = Some(16)))
    val (ku, kt) = meanSpreads(
      df.repartitionByRange(16, col("u")).sortWithinPartitions("u"))

    // z-layout: per-partition range well under the 1024 domain in BOTH dims
    assert(zu < 1024 * 0.5 && zt < 1024 * 0.5, s"z spreads: $zu / $zt")
    // single-key layout tightens u but leaves t at ~full domain
    assert(ku < 1024 * 0.2, s"key layout u spread: $ku")
    assert(kt > 1024 * 0.8, s"key layout t spread: $kt")
    // and z beats single-key on the second dimension by a wide margin
    assert(zt < kt * 0.5)
  }
}
