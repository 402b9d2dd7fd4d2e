package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MixesSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(aN: Int, bN: Int, cN: Int) = {
    val rows =
      (0 until aN).map(i => (i.toLong, "a", 10L)) ++
      (0 until bN).map(i => (1000L + i, "b", 10L)) ++
      (0 until cN).map(i => (2000L + i, "c", 10L))
    rows.toDF("id", "src", "cost")
  }

  test("binding source keeps everything; others downsample toward targets") {
    // costs: a=100, b=400; targets 0.5/0.5 → T = min(200, 800) = 200
    // → rate_a = 1.0 (exact), rate_b = 0.25
    val df = corpus(10, 40, 0)
    val out = Mixes.toTargetShares(df, "id", "src", "cost",
      Map("a" -> 0.5, "b" -> 0.5), seed = 1L)
    val bySrc = out.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(bySrc("a") === 10L) // rate 1.0 → 'g' threshold keeps all
    assert(bySrc.getOrElse("b", 0L) > 0L && bySrc("b") < 40L)
  }

  test("a target stratum absent from the input fails fast") {
    val df = corpus(5, 5, 0)
    val ex = intercept[IllegalArgumentException] {
      Mixes.toTargetShares(df, "id", "src", "cost",
        Map("a" -> 0.5, "b" -> 0.25, "zz" -> 0.25))
    }
    assert(ex.getMessage.contains("zz"))
  }

  test("a target stratum with zero or all-NULL cost fails fast") {
    // zero-cost stratum: present, but its rate would be 0/0 = NaN — under
    // NaN-is-largest ordering the output would be exactly this stratum
    val zero = Seq((1L, "a", 10L), (2L, "b", 0L), (3L, "b", 0L))
      .toDF("id", "src", "cost")
    val ex = intercept[IllegalArgumentException] {
      Mixes.toTargetShares(zero, "id", "src", "cost",
        Map("a" -> 0.5, "b" -> 0.5))
    }
    assert(ex.getMessage.contains("b") && ex.getMessage.contains("zero/NULL"))
    val allNull = Seq((1L, "a", Some(10L)), (2L, "b", None))
      .toDF("id", "src", "cost")
    val ex2 = intercept[IllegalArgumentException] {
      Mixes.toTargetShares(allNull, "id", "src", "cost",
        Map("a" -> 0.5, "b" -> 0.5))
    }
    assert(ex2.getMessage.contains("b"))
  }

  test("strata without a target weight are dropped") {
    val df = corpus(5, 5, 5)
    val out = Mixes.toTargetShares(df, "id", "src", "cost",
      Map("a" -> 0.5, "b" -> 0.5))
    assert(out.filter(col("src") === "c").count() === 0L)
  }

  test("deterministic: identical kept set across runs and repartitionings") {
    val df = corpus(50, 80, 30)
    val targets = Map("a" -> 0.2, "b" -> 0.5, "c" -> 0.3)
    val once = Mixes.toTargetShares(df, "id", "src", "cost", targets)
      .select("id").as[Long].collect().sorted.toSeq
    val again = Mixes.toTargetShares(df.repartition(7), "id", "src", "cost", targets)
      .select("id").as[Long].collect().sorted.toSeq
    assert(once === again && once.nonEmpty)
  }

  test("temperature α=1 keeps the natural mix (everything)") {
    val df = corpus(10, 40, 5)
    val out = Mixes.temperatureSample(df, "id", "src", "cost", alpha = 1.0)
    assert(out.count() === 55L) // every rate is (c/cmin)^0 = 1.0
  }

  test("temperature flattens toward uniform: smallest stratum keeps all, " +
      "kept mass tracks c^alpha") {
    val df = spark.range(0, 42000).select(col("id"),
      when(col("id") < 2000L, "small")
        .when(col("id") < 10000L, "mid").otherwise("big").as("src"),
      lit(1L).as("cost"))
    // costs: small=2000, mid=8000, big=32000; α=0.5 →
    // rate_small=1, rate_mid=(4)^-0.5=0.5, rate_big=(16)^-0.5=0.25
    val out = Mixes.temperatureSample(df, "id", "src", "cost", alpha = 0.5)
    val n = out.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(n("small") === 2000L) // rate exactly 1.0 keeps all
    assert(math.abs(n("mid") / 8000.0 - 0.5) < 0.03)
    assert(math.abs(n("big") / 32000.0 - 0.25) < 0.03)
  }

  test("temperature: null-stratum rows are dropped; zero-cost stratum fails") {
    val withNull = Seq((1L, Some("a"), 10L), (2L, None, 10L), (3L, Some("b"), 10L))
      .toDF("id", "src", "cost")
    val out = Mixes.temperatureSample(withNull, "id", "src", "cost", 1.0)
    assert(out.select("id").as[Long].collect().sorted.toSeq === Seq(1L, 3L))
    val zero = Seq((1L, "a", 10L), (2L, "b", 0L)).toDF("id", "src", "cost")
    val ex = intercept[IllegalArgumentException] {
      Mixes.temperatureSample(zero, "id", "src", "cost", 0.5)
    }
    assert(ex.getMessage.contains("b"))
    intercept[IllegalArgumentException] {
      Mixes.temperatureSample(withNull, "id", "src", "cost", 0.0)
    }
  }

  test("temperature: deterministic across repartitionings") {
    val df = corpus(50, 80, 30)
    val once = Mixes.temperatureSample(df, "id", "src", "cost", 0.7, seed = 5L)
      .select("id").as[Long].collect().sorted.toSeq
    val again = Mixes.temperatureSample(df.repartition(7), "id", "src", "cost",
        0.7, seed = 5L)
      .select("id").as[Long].collect().sorted.toSeq
    assert(once === again && once.nonEmpty)
  }

  test("kept mixture tracks the target shares on a large corpus") {
    val df = spark.range(0, 30000).select(col("id"),
      concat(lit("s"), (col("id") % 3).cast("string")).as("src"), lit(1L).as("cost"))
    // equal input mass, skewed targets
    val out = Mixes.toTargetShares(df, "id", "src", "cost",
      Map("s0" -> 0.6, "s1" -> 0.3, "s2" -> 0.1))
    val n = out.groupBy("src").count().as[(String, Long)].collect().toMap
    val total = n.values.sum.toDouble
    // binding source is s0 (10000/0.6 smallest) → kept ≈ 16667 rows
    assert(n("s0") === 10000L) // binding source keeps everything
    assert(math.abs(n("s1") / total - 0.3) < 0.02)
    assert(math.abs(n("s2") / total - 0.1) < 0.02)
  }

  test("repeatUpsample: integer factors exact, fractional deterministic, guards") {
    import spark.implicits._
    val df = (1L to 400L).map(i => (i, if (i % 2 == 0) "de" else "en"))
      .toDF("doc_id", "lang")
    // integer factor: every de row exactly 3x, en (default 1.0) exactly 1x
    val tripled = Mixes.repeatUpsample(df, "doc_id", "lang",
      Map("de" -> 3.0))
    assert(tripled.filter($"lang" === "de").count() === 600L)
    assert(tripled.filter($"lang" === "en").count() === 200L)
    // copies carry 1-based indices
    assert(tripled.filter($"lang" === "de").select("copy")
      .distinct().as[Long].collect().toSet === Set(1L, 2L, 3L))
    // fractional factor: floor copies guaranteed, extra copy ~frac share;
    // exact row set is deterministic — two runs agree exactly
    val a = Mixes.repeatUpsample(df, "doc_id", "lang", Map("de" -> 2.5))
      .select("doc_id", "copy").as[(Long, Long)].collect().toSet
    val b = Mixes.repeatUpsample(df, "doc_id", "lang", Map("de" -> 2.5))
      .select("doc_id", "copy").as[(Long, Long)].collect().toSet
    assert(a === b)
    val deCount = a.count { case (id, _) => id % 2 == 0 }
    assert(deCount >= 400 && deCount <= 600) // 2x guaranteed, 3x max
    // factor 0 drops the stratum
    val dropped = Mixes.repeatUpsample(df, "doc_id", "lang",
      Map("de" -> 0.0))
    assert(dropped.filter($"lang" === "de").count() === 0L)
    intercept[IllegalArgumentException] {
      Mixes.repeatUpsample(df, "doc_id", "lang", Map("de" -> -1.0))
    }
    intercept[IllegalArgumentException] {
      Mixes.repeatUpsample(df, "doc_id", "lang", Map("de" -> Double.NaN))
    }
  }
}
