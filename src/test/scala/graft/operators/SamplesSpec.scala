package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplesSpec extends SparkSpec {
  import spark.implicits._

  private def ids(n: Int) = (0 until n).map(_.toLong).toDF("id")

  test("bernoulli is deterministic and partition-layout independent") {
    val a = Samples.bernoulli(ids(5000), "id", 0.3).as[Long].collect().sorted
    val b = Samples.bernoulli(ids(5000).repartition(7), "id", 0.3)
      .as[Long].collect().sorted
    assert(a.toSeq === b.toSeq)
  }

  test("bernoulli fraction is approximately honored") {
    val n = Samples.bernoulli(ids(20000), "id", 0.25).count()
    assert(math.abs(n / 20000.0 - 0.25) < 0.02)
  }

  test("bernoulli edge fractions: 0 keeps nothing, 1 keeps everything") {
    assert(Samples.bernoulli(ids(100), "id", 0.0).count() === 0L)
    assert(Samples.bernoulli(ids(100), "id", 1.0).count() === 100L)
  }

  test("different seeds select different (but same-sized-ish) subsets") {
    val a = Samples.bernoulli(ids(5000), "id", 0.5, seed = 1).as[Long].collect().toSet
    val b = Samples.bernoulli(ids(5000), "id", 0.5, seed = 2).as[Long].collect().toSet
    assert(a !== b)
    // independent halves overlap on ~a quarter
    assert(math.abs(a.intersect(b).size / 5000.0 - 0.25) < 0.05)
  }

  test("matches a reference MD5 selection computed in plain JVM code") {
    val got = Samples.bernoulli(ids(500), "id", 0.25, seed = 7)
      .as[Long].collect().toSet
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = (0L until 500L).filter { i =>
      md.reset()
      val hex = md.digest(s"7:$i".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 8)
      hex < "40000000"
    }.toSet
    assert(got === expected)
    assert(expected.nonEmpty)
  }

  test("byTokenBudget packs best-first per group, drops the crossing row") {
    val df = Seq(
      // lang en: priority = score desc → 40 + 50 = 90 ≤ 100; +20 crosses
      (1L, "en", 40L, 3.0), (2L, "en", 50L, 2.0), (3L, "en", 20L, 1.0),
      // lang de: single row over budget → nothing kept
      (4L, "de", 150L, 9.0),
      // lang fr: everything fits
      (5L, "fr", 30L, 5.0), (6L, "fr", 30L, 4.0)
    ).toDF("doc_id", "lang", "cost", "score")
    val kept = Samples.byTokenBudget(df, "lang", "cost", budget = 100L,
        priority = Seq(col("score").desc, col("doc_id").asc))
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 2L, 5L, 6L))
  }

  test("byTokenBudget is invariant to input partitioning") {
    val df = (0 until 1000)
      .map(i => (i.toLong, s"l${i % 4}", (i % 37 + 1).toLong))
      .toDF("doc_id", "lang", "cost")
    def run(d: org.apache.spark.sql.DataFrame) =
      Samples.byTokenBudget(d, "lang", "cost", budget = 500L,
          priority = Seq(col("cost").desc, col("doc_id").asc))
        .select("doc_id").as[Long].collect().sorted.toSeq
    assert(run(df) === run(df.repartition(13)))
  }

  test("weighted: negative and near-1.0 weights hit the scaled-threshold guards") {
    // negative: scaled long is negative → 16-digit sign-extended hex
    // would lpad-truncate to "ffffffff" (keep ~all); the clamp keeps none
    val neg = (0 until 1000).map(i => (i.toLong, -0.5)).toDF("id", "w")
    assert(Samples.weighted(neg, "id", "w").count() === 0L)
    // 1 - 2^-40: rounds to 2^32, whose 9-digit hex would lpad-truncate
    // to "10000000" (keep ~6%); the guard keeps everything
    val near1 = (0 until 1000).map(i => (i.toLong, 1.0 - math.pow(2, -40)))
      .toDF("id", "w")
    assert(Samples.weighted(near1, "id", "w").count() === 1000L)
  }

  test("weighted: keep rate tracks the per-row weight; w>=1 always kept, w=0 never") {
    val df = (0 until 4000)
      .map(i => (i.toLong, if (i % 4 == 0) 0.0 else if (i % 4 == 1) 0.25
        else if (i % 4 == 2) 0.75 else 1.0))
      .toDF("id", "w")
    val kept = Samples.weighted(df, "id", "w").groupBy("w")
      .count().as[(Double, Long)].collect().toMap
    assert(!kept.contains(0.0))
    assert(kept(1.0) === 1000L)
    assert(kept(0.25) > 150 && kept(0.25) < 350)   // ≈250
    assert(kept(0.75) > 650 && kept(0.75) < 850)   // ≈750
    // deterministic: same call, same rows
    val a = Samples.weighted(df, "id", "w").select("id").as[Long].collect().sorted
    val b = Samples.weighted(df.repartition(7), "id", "w")
      .select("id").as[Long].collect().sorted
    assert(a.toSeq === b.toSeq)
  }

  test("kPerGroup: exact k per group, partitioning-independent") {
    val df = (0 until 1000).map(i => (i.toLong, s"g${i % 3}")).toDF("id", "g")
    val out = Samples.kPerGroup(df, "id", "g", k = 40)
    val byG = out.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(byG.values.toSet === Set(40L))
    // a group smaller than k keeps all its rows
    val small = (0 until 5).map(i => (i.toLong, "only")).toDF("id", "g")
    assert(Samples.kPerGroup(small, "id", "g", 40).count() === 5)
    val a = out.select("id").as[Long].collect().sorted
    val b = Samples.kPerGroup(df.repartition(11), "id", "g", 40)
      .select("id").as[Long].collect().sorted
    assert(a.toSeq === b.toSeq)
  }

  test("byTokenBudgetScalable keeps the identical set to byTokenBudget") {
    // random costs, several strata, deliberate priority TIES (score % 7)
    // so chunk boundaries land on equal values and the tieBreak matters
    val rnd = new scala.util.Random(11)
    val df = (0 until 2000).map { i =>
      (i.toLong, s"l${rnd.nextInt(3)}", (rnd.nextInt(50) + 1).toLong,
        (rnd.nextInt(100) % 7).toDouble)
    }.toDF("doc_id", "lang", "cost", "score")

    for (budget <- Seq(0L, 100L, 5000L, 1000000L); chunks <- Seq(2, 8, 64)) {
      val exact = Samples.byTokenBudget(df, "lang", "cost", budget,
          priority = Seq(col("score").asc, col("doc_id").asc))
        .select("doc_id").as[Long].collect().sorted.toSeq
      val scalable = Samples.byTokenBudgetScalable(df, "lang", "cost", budget,
          priorityValue = col("score"), tieBreak = Seq(col("doc_id").asc),
          chunks = chunks)
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(scalable === exact, s"budget=$budget chunks=$chunks diverged")
    }
    // best-first (desc) via negation matches too
    val exactDesc = Samples.byTokenBudget(df, "lang", "cost", 3000L,
        priority = Seq(col("score").desc, col("doc_id").asc))
      .select("doc_id").as[Long].collect().sorted.toSeq
    val scalableDesc = Samples.byTokenBudgetScalable(df, "lang", "cost", 3000L,
        priorityValue = negate(col("score")), tieBreak = Seq(col("doc_id").asc))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(scalableDesc === exactDesc)
  }

  test("stratified applies per-stratum fractions with default for the rest") {
    val df = (0 until 9000).map(i => (i.toLong, s"s${i % 3}")).toDF("id", "lang")
    val kept = Samples.stratified(df, "id", "lang",
      Map("s0" -> 1.0, "s1" -> 0.2), defaultFraction = 0.0)
    val byStratum = kept.groupBy("lang").count().as[(String, Long)]
      .collect().toMap
    assert(byStratum("s0") === 3000L)
    assert(math.abs(byStratum("s1") / 3000.0 - 0.2) < 0.05)
    assert(!byStratum.contains("s2"))
  }

  test("weightedKPerGroup: exact k per group, matches the A-Res reference") {
    val rows = (0 until 300).map(i =>
      (i.toLong, s"g${i % 3}", 1.0 + (i % 7))).toDF("id", "grp", "w")
    val got = Samples.weightedKPerGroup(rows, "id", "w", "grp", k = 5)
      .select("grp", "id").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(got.values.forall(_.size == 5))
    // in-memory A-Res replica: same md5-uniform, same quantized key
    def u(id: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"42:$id".getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(13)
      java.lang.Long.parseLong(hex, 16).toDouble / 4503599627370496.0
    }
    val expect = (0 until 300).map(i =>
        (s"g${i % 3}", i.toLong, 1.0 + (i % 7)))
      .groupBy(_._1).view.mapValues { xs =>
        xs.sortBy { case (_, id, w) =>
          (-BigDecimal(math.log(u(id)) / w)
            .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble, id)
        }.take(5).map(_._2).toSet
      }.toMap
    assert(got === expect)
  }

  test("weightedKPerGroup: higher weights win more slots; bad weights fail") {
    // two weight classes in one group: weight-1000 rows should crowd out
    // weight-0.01 rows almost surely
    val rows = (0 until 100).map(i =>
      (i.toLong, "g", if (i < 10) 1000.0 else 0.01)).toDF("id", "grp", "w")
    val kept = Samples.weightedKPerGroup(rows, "id", "w", "grp", k = 10)
      .select("id").as[Long].collect().toSet
    assert(kept.count(_ < 10) >= 9, s"heavy rows under-sampled: $kept")
    intercept[IllegalArgumentException] {
      Samples.weightedKPerGroup(
        Seq((1L, "g", 0.0)).toDF("id", "grp", "w"), "id", "w", "grp", 1)
    }
    intercept[IllegalArgumentException] {
      Samples.weightedKPerGroup(
        Seq((1L, "g", Option.empty[Double])).toDF("id", "grp", "w"),
        "id", "w", "grp", 1)
    }
  }

  test("balanceClasses: every class trimmed to the minority count, deterministic") {
    import spark.implicits._
    val df = ((1L to 3L).map(i => (i, "a")) ++ (10L to 14L).map(i => (i, "b")) ++
      Seq((99L, null.asInstanceOf[String]))).toDF("id", "cls")
    val got = Samples.balanceClasses(df, "id", "cls")
    val counts = got.groupBy("cls").count()
      .as[(String, Long)].collect().toMap
    assert(counts === Map("a" -> 3L, "b" -> 3L)) // null class excluded
    val again = Samples.balanceClasses(df, "id", "cls")
      .select("id").as[Long].collect().toSet
    assert(again === got.select("id").as[Long].collect().toSet)
    intercept[IllegalArgumentException] {
      Samples.balanceClasses(df.filter($"cls".isNull), "id", "cls")
    }
  }
}
