package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  private def frame = Seq(
    (1L, Some("en"), Some(10L)),
    (2L, Some("de"), Some(20L)),
    (3L, None, Some(20L)),
    (4L, Some("en"), None)
  ).toDF("id", "lang", "n")

  test("profile: per-column nulls, distincts, min/max as strings") {
    val out = Profiling.profile(frame)
      .as[(String, Long, Long, Long, Option[String], Option[String])]
      .collect().map(r => r._1 -> r).toMap
    assert(out("id") === (("id", 4L, 0L, 4L, Some("1"), Some("4"))))
    assert(out("lang") === (("lang", 4L, 1L, 2L, Some("de"), Some("en"))))
    assert(out("n") === (("n", 4L, 1L, 2L, Some("10"), Some("20"))))
  }

  test("profile: column subset, approx mode, bad column fails") {
    val sub = Profiling.profile(frame, Seq("lang"))
    assert(sub.count() === 1L)
    // approx distinct is exact at tiny cardinalities
    val approx = Profiling.profile(frame, approxDistinct = true)
      .select("col_name", "n_distinct").as[(String, Long)].collect().toMap
    assert(approx("id") === 4L && approx("lang") === 2L)
    intercept[IllegalArgumentException] {
      Profiling.profile(frame, Seq("nope"))
    }
    intercept[IllegalArgumentException] {
      Profiling.profile(frame.limit(0).drop("id", "lang", "n"))
    }
  }

  test("correlationMatrix: perfect/anti/constant pairs, one row per pair") {
    val rows = Seq((1.0, 2.0, -1.0, 7.0), (2.0, 4.0, -2.0, 7.0),
      (3.0, 6.0, -3.0, 7.0)).toDF("a", "b", "c", "k")
    val got = Profiling.correlationMatrix(rows, Seq("a", "b", "c", "k"))
      .as[(String, String, Option[Double])].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got.size === 10) // 4 diag + 6 upper
    assert(got(("a", "a")) === Some(1.0) && got(("a", "b")) === Some(1.0))
    assert(got(("a", "c")) === Some(-1.0))
    assert(got(("a", "k")) === None) // constant column: undefined
    intercept[IllegalArgumentException] {
      Profiling.correlationMatrix(rows, Seq("a"))
    }
  }

  test("equiDepthHistogram: quantile boundaries, map-side binning") {
    val vals = ((1 to 10).map(_.toDouble).map(Some(_)) :+ None).toDF("v")
    val got = Profiling.equiDepthHistogram(vals, "v", 2)
      .as[(Long, Long)].collect().toMap
    // p50 of 1..10 = 5.5: bucket 0 = {1..5}, bucket 1 = {6..10}
    assert(got === Map(0L -> 5L, 1L -> 5L))
    // duplicate-heavy: all-equal values share one bucket
    val dup = Seq.fill(8)(3.0).toDF("v")
    val g2 = Profiling.equiDepthHistogram(dup, "v", 4)
      .as[(Long, Long)].collect().toMap
    assert(g2 === Map(0L -> 8L))
  }

  test("skewReport: hand-computed Gini and top share") {
    val rows = (Seq.fill(3)("b") ++ Seq("a") ++ Seq.fill(0)("x"))
      .map(k => Tuple1(k)).toDF("k")
    val got = Profiling.skewReport(rows, "k")
      .as[(Long, Long, Double, Double)].head()
    // counts sorted: a=1 (i=1), b=3 (i=2); G = 2·7/(2·4) − 3/2 = 0.25
    assert(got === ((2L, 4L, 0.75, 0.25)))
    // uniform distribution → gini 0
    val uni = (1 to 8).map(i => s"k${i % 4}").map(Tuple1(_)).toDF("k")
    val g0 = Profiling.skewReport(uni, "k")
      .as[(Long, Long, Double, Double)].head()
    assert(g0 === ((4L, 8L, 0.25, 0.0)))
  }

  test("snapshotDiff classifies added/removed/changed; unchanged omitted") {
    val old = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30), (4L, "d", 40))
      .toDF("id", "s", "n")
    val nw = Seq((1L, "a", 10), // unchanged
      (2L, "B", 20), // changed (s)
      (3L, "c", 31), // changed (n)
      (5L, "e", 50)) // added; 4 removed
      .toDF("id", "s", "n")
    val got = Profiling.snapshotDiff(old, nw, "id", Seq("s", "n"))
      .as[(Long, String)].collect().toMap
    assert(got === Map(2L -> "changed", 3L -> "changed",
      4L -> "removed", 5L -> "added"))
  }

  test("snapshotDiff: null→value edits are changes; dup keys fail loudly") {
    val old = Seq((1L, Option.empty[String]), (2L, Some("x")))
      .toDF("id", "s")
    val nw = Seq((1L, Some("now-set")), (2L, Some("x"))).toDF("id", "s")
    val got = Profiling.snapshotDiff(old, nw, "id", Seq("s"))
      .as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "changed"))
    val dup = Seq((1L, "a"), (1L, "b")).toDF("id", "s")
    val ex = intercept[IllegalArgumentException] {
      Profiling.snapshotDiff(dup, nw, "id", Seq("s"))
    }
    assert(ex.getMessage.contains("not unique"))
  }

  test("histogram: hand-computed buckets, clamped edges, only non-empty") {
    // [0, 10) in 5 buckets of width 2; 10.0 clamps into bucket 4;
    // -3 clamps into bucket 0 under caller-given bounds; null dropped
    val vals = Seq(Some(0.0), Some(1.9), Some(2.0), Some(9.9), Some(10.0),
      Some(-3.0), None).toDF("v")
    val got = Profiling.histogram(vals, "v", 5, bounds = Some((0.0, 10.0)))
      .as[(Long, Double, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got === Map(
      0L -> ((0.0, 2.0, 3L)), // 0.0, 1.9, clamped -3
      1L -> ((2.0, 4.0, 1L)),
      4L -> ((8.0, 10.0, 2L)))) // 9.9 and clamped 10.0
  }

  test("histogram: derived bounds and degenerate inputs fail loudly") {
    val vals = Seq(1.0, 2.0, 3.0).toDF("v")
    val got = Profiling.histogram(vals, "v", 2)
      .as[(Long, Double, Double, Long)].collect().sortBy(_._1)
    // derived [1, 3], width 1: {1.0} and {2.0, 3.0 (clamped max)}
    assert(got.toSeq === Seq((0L, 1.0, 2.0, 1L), (1L, 2.0, 3.0, 2L)))
    intercept[IllegalArgumentException] {
      Profiling.histogram(Seq(Option.empty[Double]).toDF("v"), "v", 4)
    }
    intercept[IllegalArgumentException] {
      Profiling.histogram(Seq(5.0, 5.0).toDF("v"), "v", 4) // hi == lo
    }
  }

  test("populationStability: hand-computed smoothed PSI contributions") {
    import spark.implicits._
    val ref = (1 to 10).map(_.toDouble).toDF("v")
    val cur = Seq(6.0, 7.0, 8.0, 9.0).toDF("v")
    // 2 buckets, boundary = median of ref (5.5); ref 5/5, cur 0/4;
    // smoothed: p = 5.5/11 = 0.5 both; q0 = 0.5/5 = 0.1, q1 = 4.5/5 = 0.9
    val got = Profiling.populationStability(ref, cur, "v", nBuckets = 2)
      .as[(Long, Double, Double, Double)].collect().sortBy(_._1)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(0) === ((0L, 0.5, 0.1, r6((0.1 - 0.5) * math.log(0.1 / 0.5)))))
    assert(got(1) === ((1L, 0.5, 0.9, r6((0.9 - 0.5) * math.log(0.9 / 0.5)))))
    // identical samples: every contribution is exactly 0
    val same = Profiling.populationStability(ref, ref, "v", nBuckets = 5)
      .as[(Long, Double, Double, Double)].collect()
    assert(same.forall(_._4 === 0.0))
    intercept[IllegalArgumentException] {
      Profiling.populationStability(ref, cur.filter($"v" < 0), "v", 2)
    }
  }

  test("cramerVonMises: hand squared-gap integral; identical samples " +
      "read 0; randomized parity vs a brute pooled-ECDF reference") {
    import spark.implicits._
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // treated {1,3}, control {2,4}: pooled gaps at levels 1..4 are
    // (1/2, 0, 1/2, 0) -> sum cnt·gap² = 1/4 + 1/4; T = (4/16)·(1/2)
    val rows = Seq(("s", "t", 1.0), ("s", "c", 2.0),
      ("s", "t", 3.0), ("s", "c", 4.0)).toDF("seg", "grp", "v")
    val got = Profiling.cramerVonMises(rows, "seg", "grp", "t", "v", 1L)
      .as[(String, Long, Long, Double)].collect().head
    assert(got === (("s", 2L, 2L, r6(0.125))))
    // one distribution twice: every gap is 0 -> T = 0 exactly
    val same = Seq(("s", "t", 1.0), ("s", "c", 1.0),
      ("s", "t", 2.0), ("s", "c", 2.0)).toDF("seg", "grp", "v")
    assert(Profiling.cramerVonMises(same, "seg", "grp", "t", "v", 1L)
      .as[(String, Long, Long, Double)].collect().head._4 === 0.0)
    // randomized parity vs a brute reference over pooled levels
    val rnd = new scala.util.Random(5511)
    for (trial <- 1 to 3) {
      val n = 20 + rnd.nextInt(80)
      val data = (1 to n).map(_ =>
        (if (rnd.nextBoolean()) "t" else "c", rnd.nextInt(12).toDouble))
      if (data.exists(_._1 == "t") && data.exists(_._1 == "c")) {
        val nt = data.count(_._1 == "t").toDouble
        val nc = n - nt
        val lv = data.map(_._2).distinct.sorted
        var cumT = 0.0; var cumC = 0.0; var acc = 0.0
        lv.foreach { v =>
          val ct = data.count(d => d._1 == "t" && d._2 == v)
          val cc = data.count(d => d._1 == "c" && d._2 == v)
          cumT += ct; cumC += cc
          val gap = cumT / nt - cumC / nc
          acc += (ct + cc) * gap * gap
        }
        val tRef = nt * nc / ((nt + nc) * (nt + nc)) * acc
        val g = Profiling.cramerVonMises(
          data.map(d => ("s", d._1, d._2)).toDF("seg", "grp", "v"),
          "seg", "grp", "t", "v", 1L)
          .as[(String, Long, Long, Double)].collect().head
        assert(g._2 === nt.toLong && g._3 === nc.toLong, s"trial $trial")
        assert(math.abs(g._4 - tRef) < 2e-6,
          s"trial $trial t ${g._4} vs $tRef")
      }
    }
  }

  test("mannKendall / andersonDarling / cupedAdjust: randomized parity " +
      "vs brute references") {
    import spark.implicits._
    val rnd = new scala.util.Random(24601)
    for (trial <- 1 to 3) {
      val n = 20 + rnd.nextInt(60)
      // MK reference: brute pair loop + tie-corrected variance
      val vs = (1 to n).map(_ => rnd.nextInt(12).toDouble)
      val mkDf = vs.zipWithIndex.map { case (v, i) => (i.toLong + 1, v) }
        .toDF("ts", "v").withColumn("id", col("ts"))
      var sRef = 0L
      for (i <- 0 until n; j <- i + 1 until n)
        sRef += java.lang.Long.signum(math.round(vs(j) - vs(i)))
      val tie = vs.groupBy(identity).values.map(_.size.toLong)
        .map(t => t * (t - 1) * (2 * t + 5)).sum
      val varRef = (n.toLong * (n - 1) * (2L * n + 5) - tie) / 18.0
      val mk = Profiling.mannKendallTrend(mkDf, "ts", "id", "v", 1L)
        .as[(Long, Long, Option[Double], Option[Double])].collect().head
      assert(mk._2 === sRef, s"trial $trial S")
      assert(math.abs(mk._3.get - varRef) < 1e-6, s"trial $trial var")
      if (varRef > 0) {
        val zRef = (sRef - java.lang.Long.signum(sRef)).toDouble /
          math.sqrt(varRef)
        assert(math.abs(mk._4.get - zRef) < 1e-6, s"trial $trial z")
      }
      // AD reference: brute level loop over the pooled sample
      val tvals = (1 to 15 + rnd.nextInt(40)).map(_ =>
        rnd.nextInt(25).toDouble)
      val cvals = (1 to 15 + rnd.nextInt(40)).map(_ =>
        rnd.nextInt(25).toDouble)
      val adDf = (tvals.map(("s", "t", _)) ++ cvals.map(("s", "c", _)))
        .toDF("seg", "grp", "v")
      val nt = tvals.size.toLong; val nc = cvals.size.toLong
      val nn = nt + nc
      val levels = (tvals ++ cvals).distinct.sorted
      var cumT = 0L; var cum = 0L; var a2Ref = 0.0
      levels.foreach { u =>
        val ht = tvals.count(_ == u).toLong
        val hc = cvals.count(_ == u).toLong
        cumT += ht; cum += ht + hc
        if (cum < nn) {
          val d = (nn * cumT - nt * cum).toDouble
          a2Ref += (ht + hc).toDouble * d * d / (cum * (nn - cum)).toDouble
        }
      }
      a2Ref /= (nt * nc).toDouble
      val ad = Profiling.andersonDarling(adDf, "seg", "grp", "t", "v", 1L)
        .as[(String, Long, Long, Double)].collect().head
      assert(ad._2 === nt && ad._3 === nc)
      assert(math.abs(ad._4 - a2Ref) < 1e-6, s"trial $trial a2 $ad vs $a2Ref")
      // CUPED reference: explicit per-row adjusted values
      val units = (1 to 40 + rnd.nextInt(40)).map { i =>
        val x = rnd.nextInt(50).toDouble
        (if (i % 2 == 0) "A" else "B", x,
          2.0 * x + rnd.nextInt(30).toDouble)
      }
      val cuDf = units.toDF("arm", "x", "y")
      val gn = units.size
      val gsx = units.map(_._2).sum; val gsy = units.map(_._3).sum
      val gsxx = units.map(u => u._2 * u._2).sum
      val gsxy = units.map(u => u._2 * u._3).sum
      val thetaRef = (gn * gsxy - gsx * gsy) / (gn * gsxx - gsx * gsx)
      val xbarRef = gsx / gn
      val cu = Profiling.cupedAdjust(cuDf, "arm", "x", "y", 1L)
        .as[(String, Long, Double, Option[Double], Option[Double],
          Option[Double], Option[Double])].collect()
        .map(r => r._1 -> r).toMap
      Seq("A", "B").foreach { arm =>
        val ys = units.filter(_._1 == arm)
        val adj = ys.map(u => u._3 - thetaRef * (u._2 - xbarRef))
        val mAdj = adj.sum / adj.size
        val vAdj = adj.map(a => (a - mAdj) * (a - mAdj)).sum /
          (adj.size - 1)
        val got = cu(arm)
        assert(math.abs(got._4.get - mAdj) < 1e-6, s"trial $trial $arm mean")
        assert(math.abs(got._6.get - vAdj) < 1e-4 * (1.0 + vAdj),
          s"trial $trial $arm var")
      }
    }
  }

  test("jarqueBera / durbinWatson / brownForsythe: randomized parity " +
      "vs direct-computation references") {
    import spark.implicits._
    val rnd = new scala.util.Random(86420)
    for (trial <- 1 to 3) {
      val n = 30 + rnd.nextInt(100)
      val us = (1 to n).map(_ => rnd.nextInt(200).toDouble)
      val df = us.toDF("v")
      // JB reference: central moments computed DIRECTLY (different
      // factorization than the operator's raw-moment chains)
      val mean = us.sum / n
      val m2 = us.map(u => math.pow(u - mean, 2)).sum / n
      val m3 = us.map(u => math.pow(u - mean, 3)).sum / n
      val m4 = us.map(u => math.pow(u - mean, 4)).sum / n
      if (m2 > 0) {
        val skew = m3 / math.pow(m2, 1.5)
        val exk = m4 / (m2 * m2) - 3.0
        val jb = n / 6.0 * (skew * skew + exk * exk / 4.0)
        val got = Profiling.jarqueBera(df, "v", unitScale = 1L)
          .as[(Long, Option[Double], Option[Double], Option[Double],
            Option[Double])].collect().head
        assert(math.abs(got._2.get - skew) < 1e-6, s"trial $trial skew")
        assert(math.abs(got._3.get - exk) < 1e-6, s"trial $trial kurt")
        assert(math.abs(got._4.get - jb) < 1e-3 * (1.0 + jb),
          s"trial $trial jb")
      }
      // DW reference: direct residual loop on the same integers
      val ys = (1 to n).map(i => (0.5 * (i % 7)).floor + rnd.nextInt(20))
      val pairs = (1 to n).map(i => (i.toDouble, ys(i - 1).toDouble))
      val dwDf = pairs.zipWithIndex.map { case ((x, y), i) =>
        (i.toLong + 1L, x, y)
      }.toDF("ts", "x", "y").withColumn("id", col("ts"))
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val den = n * sxx - sx * sx
      val b = (n * sxy - sx * sy) / den
      val a = (sy - b * sx) / n
      val es = pairs.map { case (x, y) => y - (a + b * x) }
      val dwRef = es.sliding(2).map { w =>
        math.pow(w(1) - w(0), 2)
      }.sum / es.map(e => e * e).sum
      val gdw = Profiling.durbinWatson(dwDf, "ts", "id", "x", "y", 1L)
        .as[(Long, Option[Double], Option[Double], Option[Double])]
        .collect().head
      assert(math.abs(gdw._4.get - dwRef) < 1e-6, s"trial $trial dw")
      // Brown-Forsythe reference: direct two-pass over 3 groups
      val gs = (1 to n).map(i =>
        (s"g${i % 3}", rnd.nextInt(30 * (1 + i % 3)).toDouble))
      val bfDf = gs.toDF("g", "v")
      val zs = gs.groupBy(_._1).toSeq.flatMap { case (g, xs) =>
        val vs = xs.map(_._2).sorted
        val med = if (vs.size % 2 == 1) vs(vs.size / 2)
          else (vs(vs.size / 2 - 1) + vs(vs.size / 2)) / 2.0
        xs.map(x => (g, math.abs(x._2 - med)))
      }
      val k = 3
      val zbar = zs.map(_._2).sum / n
      val grpMeans = zs.groupBy(_._1).map { case (g, xs) =>
        g -> (xs.map(_._2).sum / xs.size, xs.size)
      }
      val ssb = grpMeans.values.map { case (mg, ng) =>
        ng * math.pow(mg - zbar, 2)
      }.sum
      val ssw = zs.map { case (g, z) =>
        math.pow(z - grpMeans(g)._1, 2)
      }.sum
      val wRef = ((n - k).toDouble / (k - 1).toDouble) * ssb / ssw
      val gbf = Profiling.brownForsythe(bfDf, "v", "g", unitScale = 1L)
        .as[(Long, Int, Int, Long, Option[Double])].collect().head
      assert(math.abs(gbf._5.get - wRef) < 1e-3 * (1.0 + wRef),
        s"trial $trial w ${gbf._5} vs $wRef")
    }
  }

  test("expectedCalibrationError: weighted |gap| rollup agrees with " +
      "the per-bin report; perfect calibration reads 0") {
    import spark.implicits._
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // two bins: (p=.25, y: 1 of 2) gap .25; (p=.75, y: 3 of 4) gap 0
    val rows = Seq((0.25, true), (0.25, false),
      (0.75, true), (0.75, true), (0.75, true), (0.75, false))
      .toDF("p", "y")
    val got = Profiling.expectedCalibrationError(rows, "p", "y",
      nBins = 2)
      .as[(Long, Int, Double)].collect().head
    assert(got === ((6L, 2, r6((2.0 * 0.25 + 4.0 * 0.0) / 6.0))))
    // perfectly calibrated: every bin's frac_pos == mean_pred -> 0
    val perfect = Seq((0.0, false), (1.0, true)).toDF("p", "y")
    assert(Profiling.expectedCalibrationError(perfect, "p", "y", 2)
      .as[(Long, Int, Double)].collect().head._3 === 0.0)
  }

  test("durbinWatson: hand OLS + residual fold; perfect fit NULL dw; " +
      "maxRows guard") {
    import spark.implicits._
    // x=(1..4), y=(2,0,2,0): b=-0.4, a=2; residuals (.4,-1.2,1.2,-.4)
    // -> num=10.88, den=3.2, DW=3.4 exactly (alternating = near-4)
    val rows = Seq((1L, 2.0), (2L, 0.0), (3L, 2.0), (4L, 0.0))
      .toDF("x", "y").withColumn("ts", col("x")).withColumn("id", col("x"))
    val got = Profiling.durbinWatson(rows, "ts", "id", "x", "y",
      unitScale = 1L)
      .as[(Long, Option[Double], Option[Double], Option[Double])]
      .collect().head
    assert(got._1 === 4L && got._2 === Some(-0.4) && got._3 === Some(2.0))
    assert(got._4 === Some(3.4))
    // perfect fit: zero residual variance -> NULL dw, fit still ships
    val perfect = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0))
      .toDF("x", "y").withColumn("ts", col("x")).withColumn("id", col("x"))
    val gp = Profiling.durbinWatson(perfect, "ts", "id", "x", "y", 1L)
      .as[(Long, Option[Double], Option[Double], Option[Double])]
      .collect().head
    assert(gp._2 === Some(1.0) && gp._3 === Some(0.0) && gp._4 === None)
    // constant x: degenerate design -> NULL everything but n
    val cx = Seq((1L, 1.0), (2L, 2.0)).toDF("id", "y")
      .withColumn("x", lit(5.0)).withColumn("ts", col("id"))
    val gc = Profiling.durbinWatson(cx, "ts", "id", "x", "y", 1L)
      .as[(Long, Option[Double], Option[Double], Option[Double])]
      .collect().head
    assert(gc._2 === None && gc._4 === None)
    intercept[IllegalArgumentException] {
      Profiling.durbinWatson(rows, "ts", "id", "x", "y", 1L, maxRows = 2L)
    }
    // signed zero: a tiny NEGATIVE slope (-3e-7 here) rounds to zero at
    // 6dp — the output must be POSITIVE zero bit-for-bit (round 14:
    // DuckDB preserved -0.0, the driver hash is sign-bit sensitive;
    // graft.core.Num.roundz normalizes both engines)
    val flat = Seq((0L, 1.0), (1000000L, 1.0), (2000000L, 1.0),
      (3000000L, 0.0)).toDF("x", "y")
      .withColumn("ts", col("x")).withColumn("id", col("x"))
    val gz = Profiling.durbinWatson(flat, "ts", "id", "x", "y", 1L)
      .as[(Long, Option[Double], Option[Double], Option[Double])]
      .collect().head
    assert(gz._2 === Some(0.0))
    assert(java.lang.Double.doubleToRawLongBits(gz._2.get) === 0L,
      "rounded-to-zero slope must be +0.0, not -0.0")
  }

  test("andersonDarling: hand A2 on a 3-point pool; identical " +
      "samples read 0; tail shift outranks the CvM-equal center") {
    import spark.implicits._
    // pooled levels 1(t), 2(c), 3(t): n_t=2, n_c=1, N=3
    // j=1: d = 3·1-2·1 = 1, term = 1/(1·2); j=2: d = 3·1-2·2 = -1,
    // term = 1/(2·1); j=3 excluded (B=N) -> A2 = (0.5+0.5)/(2·1) = 0.5
    val rows = Seq(("s", "t", 1.0), ("s", "c", 2.0), ("s", "t", 3.0))
      .toDF("seg", "grp", "v")
    val got = Profiling.andersonDarling(rows, "seg", "grp", "t", "v",
      unitScale = 1L).as[(String, Long, Long, Double)].collect().head
    assert(got === (("s", 2L, 1L, 0.5)))
    // both groups at one identical level: A2 = 0 (the zero-term path)
    val same = Seq(("s", "t", 5.0), ("s", "c", 5.0)).toDF("seg", "grp", "v")
    val gz = Profiling.andersonDarling(same, "seg", "grp", "t", "v", 1L)
      .as[(String, Long, Long, Double)].collect().head
    assert(gz._4 === 0.0)
  }

  test("mannKendallTrend: hand S/var/z with ties; all-tied NULL z; " +
      "monotone series maximal S; maxRows guard") {
    import spark.implicits._
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // time-ordered values 1,2,3,2: S = +1+1+1+1+0-1 = 3; tie level 2
    // (t=2): var = (4·3·13 - 2·1·9)/18 = 138/18; z = 2/sqrt(var)
    val rows = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 2.0))
      .toDF("ts", "v").withColumn("id", col("ts"))
    val got = Profiling.mannKendallTrend(rows, "ts", "id", "v",
      unitScale = 1L)
      .as[(Long, Long, Option[Double], Option[Double])].collect().head
    assert(got._1 === 4L && got._2 === 3L)
    assert(got._3 === Some(r6(138.0 / 18.0)))
    assert(got._4 === Some(r6(2.0 / math.sqrt(138.0 / 18.0))))
    // strictly increasing: S = n(n-1)/2; decreasing mirrors negative
    val up = (1 to 6).map(i => (i.toLong, i.toDouble)).toDF("ts", "v")
      .withColumn("id", col("ts"))
    val gu = Profiling.mannKendallTrend(up, "ts", "id", "v", 1L)
      .as[(Long, Long, Option[Double], Option[Double])].collect().head
    assert(gu._2 === 15L && gu._4.get > 0.0)
    // all values tied: var = 0 -> NULL z, S = 0
    val flat = (1 to 5).map(i => (i.toLong, 7.0)).toDF("ts", "v")
      .withColumn("id", col("ts"))
    val gf = Profiling.mannKendallTrend(flat, "ts", "id", "v", 1L)
      .as[(Long, Long, Option[Double], Option[Double])].collect().head
    assert(gf._2 === 0L && gf._3 === Some(0.0) && gf._4 === None)
    intercept[IllegalArgumentException] {
      Profiling.mannKendallTrend(up, "ts", "id", "v", 1L, maxRows = 3L)
    }
  }

  test("brierDecomposition: hand Murphy terms; rel - res + unc equals " +
      "the direct Brier score exactly on quantized forecasts") {
    import spark.implicits._
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // levels (unitScale 10): up=2 -> t=2, s=1; up=8 -> t=3, s=2;
    // n=5, obar=0.6
    val rows = Seq((0.2, false), (0.2, true), (0.8, true), (0.8, true),
      (0.8, false)).toDF("p", "y")
    val got = Profiling.brierDecomposition(rows, "p", "y",
      unitScale = 10L)
      .as[(Long, Double, Double, Double, Double)].collect().head
    val rel = 2.0 * ((2.0 / 10 - 1.0 / 2) * (2.0 / 10 - 1.0 / 2)) / 5.0 +
      3.0 * ((8.0 / 10 - 2.0 / 3) * (8.0 / 10 - 2.0 / 3)) / 5.0
    val res = 2.0 * ((1.0 / 2 - 3.0 / 5) * (1.0 / 2 - 3.0 / 5)) / 5.0 +
      3.0 * ((2.0 / 3 - 3.0 / 5) * (2.0 / 3 - 3.0 / 5)) / 5.0
    assert(got === ((5L, r6(rel - res + 0.24), r6(rel), r6(res), 0.24)))
    // identity vs the direct score at the same quantization
    val direct = Profiling.brierScore(rows, "p", "y", unitScale = 10L)
      .as[(Long, Double)].collect().head._2
    assert(math.abs(got._2 - direct) <= 1e-6, s"${got._2} vs $direct")
    assert(got._2 === 0.28) // (0.04+0.64+0.04+0.04+0.64)/5
    intercept[Exception] {
      Profiling.brierDecomposition(
        Seq((1.2, true)).toDF("p", "y"), "p", "y", 10L).collect()
    }
  }

  test("poissonBootstrapMeanCI: deterministic; constant data collapses " +
      "the CI to the mean; CI brackets the mean on real spread; guards") {
    import spark.implicits._
    // thresholds are a monotone CDF grid ending at the w = 12 clamp
    val ths = Profiling.poissonHexThresholds
    assert(ths.size === 12 && ths === ths.sorted)
    assert(ths.head === f"${math.floor(math.exp(-1.0) * 4294967296.0).toLong}%08x")
    // constant values: every replicate mean IS the constant
    val const = (1L to 100L).map(i => (i, 7.0)).toDF("id", "v")
    val gc = Profiling.poissonBootstrapMeanCI(const, "id", "v",
      reps = 52, alpha = 0.1, unitScale = 1L)
      .as[(Long, Int, Double, Double, Double)].collect().head
    assert(gc === ((100L, 52, 7.0, 7.0, 7.0)))
    // spread data: lo < mean < hi, fully deterministic across runs
    val rnd = new scala.util.Random(42)
    val rows = (1L to 200L).map(i => (i, rnd.nextInt(100).toDouble))
      .toDF("id", "v")
    val g1 = Profiling.poissonBootstrapMeanCI(rows, "id", "v",
      reps = 100, alpha = 0.05, unitScale = 1L)
      .as[(Long, Int, Double, Double, Double)].collect().head
    val g2 = Profiling.poissonBootstrapMeanCI(rows, "id", "v",
      reps = 100, alpha = 0.05, unitScale = 1L)
      .as[(Long, Int, Double, Double, Double)].collect().head
    assert(g1 === g2)
    assert(g1._4 < g1._3 && g1._3 < g1._5, g1.toString)
    // the CI should be in the right ballpark (sd/sqrt(n) scale)
    assert(g1._5 - g1._4 < 20.0 && g1._5 - g1._4 > 2.0)
    intercept[IllegalArgumentException] {
      Profiling.poissonBootstrapMeanCI(
        (1L to 10L).map(i => (i, 1.0)).toDF("id", "v"), "id", "v")
    }
    intercept[IllegalArgumentException] {
      Profiling.poissonBootstrapMeanCI(rows, "id", "v", reps = 50) // %4
    }
  }

  test("poissonBootstrapDiffCI: constant arms collapse the CI to the " +
      "exact diff; deterministic; per-arm size guard") {
    import spark.implicits._
    // arm 't' constant 10, arm 'c' constant 4: every replicate diff
    // is exactly 6 regardless of weights
    val rows = ((1L to 40L).map(i => (i, "t", 10.0)) ++
      (41L to 80L).map(i => (i, "c", 4.0))).toDF("id", "arm", "v")
    val got = Profiling.poissonBootstrapDiffCI(rows, "id", "arm", "t",
      "v", reps = 52, alpha = 0.1, unitScale = 1L)
      .as[(Long, Long, Int, Double, Double, Double)].collect().head
    assert(got === ((40L, 40L, 52, 6.0, 6.0, 6.0)))
    val again = Profiling.poissonBootstrapDiffCI(rows, "id", "arm", "t",
      "v", reps = 52, alpha = 0.1, unitScale = 1L)
      .as[(Long, Long, Int, Double, Double, Double)].collect().head
    assert(again === got)
    intercept[IllegalArgumentException] { // arm below 30 units
      Profiling.poissonBootstrapDiffCI(
        rows.filter(col("id") <= 60L), "id", "arm", "t", "v")
    }
  }

  test("poissonBootstrap gates count DISTINCT UNITS, not rows: 6 units " +
      "x 1000 rows trips; a cross-arm unit is refused; duplicate ids " +
      "share the draw (cluster bootstrap)") {
    import spark.implicits._
    // 6 distinct user ids, 1000 event rows each = 6000 ROWS — the old
    // row-count gate sailed past while Poisson(6) zeroes a replicate
    // with p ~ 0.25%; the unit gate must trip
    val clustered = (1L to 6000L).map(i => (i % 6, 1.0)).toDF("id", "v")
    val e1 = intercept[IllegalArgumentException] {
      Profiling.poissonBootstrapMeanCI(clustered, "id", "v",
        reps = 52, unitScale = 1L)
    }
    assert(e1.getMessage.contains("6 distinct units"))
    // same trap on the diff: 6 units per arm, 500 rows each
    val clusteredArms = (1L to 6000L).map { i =>
      val arm = if (i % 2 == 0) "t" else "c"
      (i % 12, arm, 1.0)
    }.toDF("id", "arm", "v")
    intercept[IllegalArgumentException] {
      Profiling.poissonBootstrapDiffCI(clusteredArms, "id", "arm", "t",
        "v", reps = 52, unitScale = 1L)
    }
    // a unit present in BOTH arms is refused loudly even when both
    // arms clear 30 units (id 1 carries a row in each arm)
    val crossed = ((1L to 40L).map(i => (i, "t", 10.0)) ++
      (41L to 80L).map(i => (i, "c", 4.0)) ++
      Seq((1L, "c", 4.0))).toDF("id", "arm", "v")
    val e2 = intercept[IllegalArgumentException] {
      Profiling.poissonBootstrapDiffCI(crossed, "id", "arm", "t", "v",
        reps = 52, unitScale = 1L)
    }
    assert(e2.getMessage.contains("BOTH arms"))
    // cluster semantics: duplicating every row under the SAME id must
    // leave the replicate means (hence lo/hi) unchanged on constant
    // data and keep the unit gate satisfied at 40 units
    val base = (1L to 40L).map(i => (i, 7.0)).toDF("id", "v")
    val doubled = base.union(base)
    val g1 = Profiling.poissonBootstrapMeanCI(base, "id", "v",
      reps = 52, unitScale = 1L)
      .as[(Long, Int, Double, Double, Double)].collect().head
    val g2 = Profiling.poissonBootstrapMeanCI(doubled, "id", "v",
      reps = 52, unitScale = 1L)
      .as[(Long, Int, Double, Double, Double)].collect().head
    assert(g1._3 === g2._3 && g1._4 === g2._4 && g1._5 === g2._5)
    assert(g2._1 === 80L) // n reports ROWS; the gate counted units
  }

  test("cupedWelchTTest: zero-covariance covariate pins it to raw " +
      "welchTTest; zero-variance covariate reports NULL; guards") {
    import spark.implicits._
    // global cov(x, y) = 0 EXACTLY (integer construction): theta = 0,
    // the adjusted metric IS the raw metric, and t/df must equal
    // welchTTest's on the same rows bit-for-bit
    val rows = Seq(("t", 1.0, 10.0), ("t", 3.0, 10.0), ("t", 2.0, 14.0),
      ("c", 1.0, 6.0), ("c", 3.0, 6.0), ("c", 2.0, 2.0))
      .toDF("arm", "x", "y")
    val cuped = Profiling.cupedWelchTTest(rows, "arm", "t", "x", "y",
      unitScale = 1L)
      .as[(Long, Long, Option[Double], Option[Double], Option[Double],
        Option[Double], Option[Double])].collect().head
    val welch = Profiling.welchTTest(rows.withColumn("seg", lit("all")),
      "seg", "arm", "t", "y", unitScale = 1L)
      .select("n_t", "n_c", "mean_t", "mean_c", "t_stat", "df")
      .as[(Long, Long, Double, Double, Option[Double], Option[Double])]
      .collect().head
    assert(cuped._1 === 3L && cuped._2 === 3L)
    assert(cuped._3 === Some(0.0)) // theta exactly zero
    assert(cuped._6 === welch._5 && cuped._7 === welch._6)
    // adjusted means = raw means (theta = 0)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(cuped._4 === Some(r6(welch._3)) &&
      cuped._5 === Some(r6(welch._4)))
    // a genuinely predictive covariate shrinks the variance: |t| grows
    val pred = Seq.tabulate(40) { i =>
      val arm = if (i % 2 == 0) "t" else "c"
      val x = (i % 7).toDouble
      (arm, x, 2.0 * x + (if (arm == "t") 1.0 else 0.0) + (i % 3) * 0.1)
    }.toDF("arm", "x", "y")
    val tc = Profiling.cupedWelchTTest(pred, "arm", "t", "x", "y", 100L)
      .select("t_stat").as[Option[Double]].collect().head
    val tw = Profiling.welchTTest(pred.withColumn("seg", lit("all")),
      "seg", "arm", "t", "y", 100L)
      .select("t_stat").as[Option[Double]].collect().head
    assert(tc.isDefined && tw.isDefined && math.abs(tc.get) > math.abs(tw.get))
    // zero-variance covariate: theta undefined -> NULL adjusted outputs
    val flat = Profiling.cupedWelchTTest(
      rows.withColumn("x", lit(5.0)), "arm", "t", "x", "y", 1L)
      .as[(Long, Long, Option[Double], Option[Double], Option[Double],
        Option[Double], Option[Double])].collect().head
    assert(flat._3.isEmpty && flat._6.isEmpty && flat._7.isEmpty)
    // deterministic across runs
    val again = Profiling.cupedWelchTTest(rows, "arm", "t", "x", "y", 1L)
      .as[(Long, Long, Option[Double], Option[Double], Option[Double],
        Option[Double], Option[Double])].collect().head
    assert(again === cuped)
  }

  test("mannKendallSeasonal: one season equals mannKendallTrend; two " +
      "seasons sum S and variance; per-season gate trips") {
    import spark.implicits._
    val series = (1L to 12L).map(i => (i, i, ((i * 7) % 5).toDouble))
      .toDF("ts", "id", "v")
    val trend = Profiling.mannKendallTrend(series, "ts", "id", "v",
      unitScale = 1L)
      .as[(Long, Long, Option[Double], Option[Double])].collect().head
    val one = Profiling.mannKendallSeasonal(
      series.withColumn("season", lit("all")), "ts", "season", "id", "v",
      unitScale = 1L)
      .as[(Long, Long, Long, Option[Double], Option[Double])]
      .collect().head
    assert(one === ((trend._1, 1L, trend._2, trend._3, trend._4)))
    // two seasons: S = S_1 + S_2 and Var = Var_1 + Var_2 (per-season
    // tie correction) — assembled from the per-season trend runs
    val sA = (1L to 10L).map(i => (i, i, (i % 4).toDouble))
    val sB = (1L to 8L).map(i => (i, 100L + i, ((i * 3) % 5).toDouble))
    val tA = Profiling.mannKendallTrend(sA.toDF("ts", "id", "v"),
      "ts", "id", "v", unitScale = 1L)
      .as[(Long, Long, Option[Double], Option[Double])].collect().head
    val tB = Profiling.mannKendallTrend(sB.toDF("ts", "id", "v"),
      "ts", "id", "v", unitScale = 1L)
      .as[(Long, Long, Option[Double], Option[Double])].collect().head
    val both = (sA.map(r => ("a", r._1, r._2, r._3)) ++
      sB.map(r => ("b", r._1, r._2, r._3)))
      .toDF("season", "ts", "id", "v")
    val got = Profiling.mannKendallSeasonal(both, "ts", "season", "id",
      "v", unitScale = 1L)
      .as[(Long, Long, Long, Option[Double], Option[Double])]
      .collect().head
    assert(got._1 === 18L && got._2 === 2L)
    assert(got._3 === tA._2 + tB._2)
    val varSum = tA._3.get + tB._3.get
    assert(math.abs(got._4.get - varSum) < 1e-5, s"${got._4} vs $varSum")
    val s = got._3
    val zExp =
      if (s > 0) (s - 1).toDouble / math.sqrt(got._4.get)
      else if (s < 0) (s + 1).toDouble / math.sqrt(got._4.get)
      else 0.0
    assert(math.abs(got._5.get - zExp) < 1e-5)
    // the gate is PER SEASON: a 10-row season trips maxRowsPerSeason=9
    // even though another valid split would pass
    val e = intercept[IllegalArgumentException] {
      Profiling.mannKendallSeasonal(both, "ts", "season", "id", "v",
        unitScale = 1L, maxRowsPerSeason = 9L)
    }
    assert(e.getMessage.contains("maxRowsPerSeason"))
  }

  test("sequentialMSPRT: brute replayed-looks reference; p_always is " +
      "non-increasing; the CI is a running intersection; guards") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = for (look <- 1 to 5; i <- 1 to 8) yield
      (look.toLong, if (i % 2 == 0) "t" else "c",
        rnd.nextInt(50) / 10.0 + (if (i % 2 == 0) 1.0 else 0.0))
    val df = rows.toDF("look", "arm", "v")
    val tau2 = 0.5
    val got = Profiling.sequentialMSPRT(df, "look", "arm", "t", "v",
      tau2 = tau2, alpha = 0.05, unitScale = 10L)
      .as[(Long, Long, Long, Option[Double], Option[Double],
        Option[Double], Option[Double])].collect().sortBy(_._1)
    assert(got.length === 5)
    // brute: REPLAY each look as a from-scratch fixed-horizon compute
    // over the cumulative subset, then fold min/max by hand
    var pmin = Double.PositiveInfinity
    var lomax = Double.NegativeInfinity
    var himin = Double.PositiveInfinity
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    for (row <- got) {
      val sub = rows.filter(_._1 <= row._1)
      def mom(a: String): (Long, Double, Double) = {
        val us = sub.filter(_._2 == a).map(r => math.round(r._3 * 10))
        (us.size.toLong, us.map(_.toDouble).sum,
          us.map(u => u.toDouble * u).sum)
      }
      val (nt, s1t, s2t) = mom("t")
      val (nc, s1c, s2c) = mom("c")
      val mt = s1t / (nt * 10.0)
      val mc = s1c / (nc * 10.0)
      val vt = ((s2t - s1t * s1t / nt) / (nt - 1.0)) / 100.0
      val vc = ((s2c - s1c * s1c / nc) / (nc - 1.0)) / 100.0
      val v = vt / nt + vc / nc
      val d = mt - mc
      val lam = math.sqrt(v / (v + tau2)) *
        math.exp(d * d * tau2 / (2.0 * v * (v + tau2)))
      pmin = math.min(pmin, math.min(1.0, 1.0 / lam))
      val radius = math.sqrt((v * (v + tau2) / tau2) *
        math.log((v + tau2) / (0.05 * 0.05 * v)))
      lomax = math.max(lomax, d - radius)
      himin = math.min(himin, d + radius)
      assert(row._2 === nt && row._3 === nc)
      assert(math.abs(row._4.get - r6(d)) < 2e-6, s"diff @${row._1}")
      assert(math.abs(row._5.get - r6(pmin)) < 2e-6, s"p @${row._1}")
      assert(math.abs(row._6.get - r6(lomax)) < 2e-6, s"lo @${row._1}")
      assert(math.abs(row._7.get - r6(himin)) < 2e-6, s"hi @${row._1}")
    }
    // always-valid semantics: p never increases, the CI never widens
    val ps = got.flatMap(_._5)
    assert(ps.zip(ps.tail).forall { case (a, b) => b <= a })
    val los = got.flatMap(_._6)
    assert(los.zip(los.tail).forall { case (a, b) => b >= a })
    val his = got.flatMap(_._7)
    assert(his.zip(his.tail).forall { case (a, b) => b <= a })
    // a look where one arm has n < 2 reports NULL for that look and
    // the running fold skips it
    val sparse = (Seq((1L, "t", 1.0), (1L, "c", 2.0)) ++
      rows.map(r => (r._1 + 1L, r._2, r._3))).toDF("look", "arm", "v")
    val g2 = Profiling.sequentialMSPRT(sparse, "look", "arm", "t", "v",
      tau2 = tau2, unitScale = 10L)
      .as[(Long, Long, Long, Option[Double], Option[Double],
        Option[Double], Option[Double])].collect().sortBy(_._1)
    assert(g2.head._5.isEmpty && g2.head._6.isEmpty)
    assert(g2(1)._5.isDefined)
    intercept[IllegalArgumentException] {
      Profiling.sequentialMSPRT(df, "look", "arm", "t", "v", tau2 = 0.0)
    }
    val e = intercept[IllegalArgumentException] {
      Profiling.sequentialMSPRT(df, "look", "arm", "t", "v",
        tau2 = tau2, maxLooks = 2L)
    }
    assert(e.getMessage.contains("maxLooks"))
  }

  test("pairedTTest: hand diffs; constant diff NULLs t; " +
      "twoProportionZ: hand pooled z; degenerate pooled rate NULL") {
    import spark.implicits._
    // d = 2, 3, 0, 3 -> mean 2, s_d^2 = 2, t = 2/sqrt(2/4)
    val pairs = Seq((1.0, 3.0), (2.0, 5.0), (4.0, 4.0), (6.0, 9.0))
      .toDF("pre", "post")
    val got = Profiling.pairedTTest(pairs, "pre", "post", unitScale = 1L)
      .as[(Long, Option[Double], Option[Double], Option[Long])]
      .collect().head
    assert(got._1 === 4L && got._2 === Some(2.0))
    assert(math.abs(got._3.get - 2.0 / math.sqrt(0.5)) < 1e-3)
    assert(got._4 === Some(3L))
    // constant diff: zero variance -> NULL t, mean intact
    val flat = Seq((1.0, 3.0), (5.0, 7.0)).toDF("pre", "post")
    val g2 = Profiling.pairedTTest(flat, "pre", "post", unitScale = 1L)
      .as[(Long, Option[Double], Option[Double], Option[Long])]
      .collect().head
    assert(g2._2 === Some(2.0) && g2._3.isEmpty)
    // two-prop: 4/10 vs 2/10 -> pooled 0.3
    val conv = ((1 to 10).map(i => ("t", i <= 4)) ++
      (1 to 10).map(i => ("c", i <= 2))).toDF("arm", "y")
    val gz = Profiling.twoProportionZ(conv, "arm", "t", "y")
      .as[(Long, Long, Option[Double], Option[Double], Option[Double],
        Option[Double])].collect().head
    val se = math.sqrt(0.3 * 0.7 * (0.1 + 0.1))
    assert(gz === ((10L, 10L, Some(0.4), Some(0.2), Some(0.2),
      gz._6)))
    assert(math.abs(gz._6.get - 0.2 / se) < 1e-3)
    // all-true labels: pooled rate 1, zero variance -> NULL z
    val allTrue = Profiling.twoProportionZ(
      conv.withColumn("y", lit(true)), "arm", "t", "y")
      .select("z").as[Option[Double]].collect().head
    assert(allTrue.isEmpty)
  }

  test("ratioMetricDelta: hand ratio-of-sums; brute delta-method " +
      "parity; zero-spread arms report NULL z; missing arm NULL") {
    import spark.implicits._
    // constant cells: R_t = 2, R_c = 1, all variances 0 -> se = 0,
    // z NULL (stated), ratios exact
    val const = ((1 to 40).map(_ => ("t", 2.0, 1.0)) ++
      (1 to 40).map(_ => ("c", 1.0, 1.0))).toDF("arm", "x", "y")
    val gc = Profiling.ratioMetricDelta(const, "arm", "t", "x", "y", 1L)
      .as[(Long, Long, Option[Double], Option[Double], Option[Double],
        Option[Double], Option[Double])].collect().head
    assert(gc === ((40L, 40L, Some(2.0), Some(1.0), Some(1.0), None,
      None)))
    // brute parity on spread data
    val rnd = new scala.util.Random(17)
    val rows = (1 to 200).map { i =>
      val arm = if (i % 2 == 0) "t" else "c"
      (arm, rnd.nextInt(20).toDouble + (if (arm == "t") 5 else 0),
        1.0 + rnd.nextInt(9))
    }
    val got = Profiling.ratioMetricDelta(rows.toDF("arm", "x", "y"),
      "arm", "t", "x", "y", 1L)
      .as[(Long, Long, Option[Double], Option[Double], Option[Double],
        Option[Double], Option[Double])].collect().head
    def brute(a: String): (Double, Double) = {
      val xs = rows.filter(_._1 == a)
      val n = xs.size.toDouble
      val (sx, sy) = (xs.map(_._2).sum, xs.map(_._3).sum)
      val r = sx / sy
      val yb = sy / n
      val vx = (xs.map(v => v._2 * v._2).sum - sx * sx / n) / (n - 1)
      val vy = (xs.map(v => v._3 * v._3).sum - sy * sy / n) / (n - 1)
      val cxy = (xs.map(v => v._2 * v._3).sum - sx * sy / n) / (n - 1)
      (r, (vx - 2.0 * r * cxy + r * r * vy) / (n * yb * yb))
    }
    val (rt, vt) = brute("t")
    val (rc, vc) = brute("c")
    assert(math.abs(got._3.get - rt) < 1e-5)
    assert(math.abs(got._4.get - rc) < 1e-5)
    assert(math.abs(got._6.get - math.sqrt(vt + vc)) < 1e-5)
    assert(math.abs(got._7.get - (rt - rc) / math.sqrt(vt + vc)) < 1e-3)
    // missing arm: counts survive, everything else NULL
    val solo = Profiling.ratioMetricDelta(
      rows.filter(_._1 == "t").toDF("arm", "x", "y"),
      "arm", "t", "x", "y", 1L)
      .as[(Long, Long, Option[Double], Option[Double], Option[Double],
        Option[Double], Option[Double])].collect().head
    assert(solo._2 === 0L && solo._4.isEmpty && solo._7.isEmpty)
  }

  test("eventStudy: base period att is exactly zero; hand two-period " +
      "gaps; missing base fails loud") {
    import spark.implicits._
    // period 1 (base): T mean 10, C mean 8 -> gap 2; period 2:
    // T mean 15, C mean 9 -> gap 6, att = 4
    val rows = Seq(
      (true, 1L, 9.0), (true, 1L, 11.0), (false, 1L, 7.0),
      (false, 1L, 9.0),
      (true, 2L, 14.0), (true, 2L, 16.0), (false, 2L, 8.0),
      (false, 2L, 10.0)).toDF("tr", "p", "v")
    val got = Profiling.eventStudy(rows, "tr", "p", "v",
      basePeriod = 1L, unitScale = 1L)
      .as[(Long, Long, Long, Option[Double], Option[Double],
        Option[Double])].collect().sortBy(_._1)
    assert(got(0) === ((1L, 2L, 2L, Some(2.0), Some(0.0),
      got(0)._6)))
    assert(got(1)._4 === Some(6.0) && got(1)._5 === Some(4.0))
    // the base row's att is EXACT zero (same-chain subtraction) and
    // positive-signed (roundz)
    assert(got(0)._5.get === 0.0 &&
      (1.0 / got(0)._5.get) === Double.PositiveInfinity)
    // SE pools the four cells: each cell var 2, n 2 -> sqrt(4*2/2) = 2
    assert(math.abs(got(1)._6.get - 2.0) < 1e-9)
    // missing base raises IN-PLAN (r17: the postStratifiedMean
    // raise_error convention replaced the eager count job — the check
    // now fires at action time, inside the one-scan plan)
    val missingBase = intercept[Exception] {
      Profiling.eventStudy(rows, "tr", "p", "v", basePeriod = 99L)
        .collect()
    }
    assert(missingBase.getMessage.contains("base period 99 has no rows"))
    // period-frame gate trips loud (maxPeriods = 1 < 2 observed)
    val gate = intercept[IllegalArgumentException] {
      Profiling.eventStudy(rows, "tr", "p", "v", basePeriod = 1L,
        maxPeriods = 1L)
    }
    assert(gate.getMessage.contains("maxPeriods"))
  }

  test("postStratifiedMean: hand re-weighting; coverage failures are " +
      "loud both ways; singleton stratum NULLs the SE") {
    import spark.implicits._
    // strata a (n=4, mean 10) and b (n=2, mean 20): observed mix 2:1
    // but designed 50/50 -> est = 15, not the raw mean 40/3
    val rows = (Seq.fill(4)(("a", 10.0)) ++ Seq.fill(2)(("b", 20.0)))
      .toDF("s", "v")
    val got = Profiling.postStratifiedMean(rows, "s", "v",
      Map("a" -> 0.5, "b" -> 0.5), unitScale = 1L)
      .as[(Long, Long, Double, Option[Double])].collect().head
    assert(got._1 === 6L && got._2 === 2L && got._3 === 15.0)
    assert(got._4 === Some(0.0)) // zero within-stratum variance
    // observed stratum outside the design fails loud
    intercept[Exception] {
      Profiling.postStratifiedMean(
        rows.union(Seq(("ghost", 1.0)).toDF("s", "v")), "s", "v",
        Map("a" -> 0.5, "b" -> 0.5), unitScale = 1L).collect()
    }
    // designed stratum with NO rows fails loud (silently renormalizing
    // would hide the coverage gap)
    intercept[Exception] {
      Profiling.postStratifiedMean(rows, "s", "v",
        Map("a" -> 0.4, "b" -> 0.4, "missing" -> 0.2),
        unitScale = 1L).collect()
    }
    // singleton stratum: mean contributes, SE is NULL
    val single = (Seq.fill(4)(("a", 10.0)) :+ ("b", 20.0)).toDF("s", "v")
    val g2 = Profiling.postStratifiedMean(single, "s", "v",
      Map("a" -> 0.5, "b" -> 0.5), unitScale = 1L)
      .as[(Long, Long, Double, Option[Double])].collect().head
    assert(g2._3 === 15.0 && g2._4.isEmpty)
    intercept[IllegalArgumentException] { // shares must sum to 1
      Profiling.postStratifiedMean(rows, "s", "v",
        Map("a" -> 0.5, "b" -> 0.4), unitScale = 1L)
    }
  }

  test("yuenTTest: trim = 0 pins it to welchTTest; one whale cannot " +
      "move the trimmed readout; hand trim counts; guards") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val base = (1L to 400L).map { i =>
      val arm = if (i % 2 == 0) "t" else "c"
      (i, arm, rnd.nextInt(100) / 10.0 + (if (arm == "t") 1.5 else 0.0))
    }
    val df0 = base.toDF("id", "arm", "v")
    // trim = 0: g = 0, winsorized == raw, d = s^2/n -> Yuen IS Welch
    val y0 = Profiling.yuenTTest(df0, "arm", "t", "v", "id", trim = 0.0,
      unitScale = 10L)
      .select("t_stat", "df").as[(Option[Double], Option[Double])]
      .collect().head
    val w0 = Profiling.welchTTest(df0.withColumn("seg", lit("all")),
      "seg", "arm", "t", "v", unitScale = 10L)
      .select("t_stat", "df").as[(Option[Double], Option[Double])]
      .collect().head
    assert(y0._1.isDefined && math.abs(y0._1.get - w0._1.get) < 2e-4)
    assert(math.abs(y0._2.get - w0._2.get) < 2e-4)
    // one whale in the CONTROL arm: Welch's t collapses toward 0 (or
    // flips), Yuen's 20%-trimmed t barely moves
    val whale = base :+ (9999L, "c", 1.0e6)
    val dfW = whale.toDF("id", "arm", "v")
    val yW = Profiling.yuenTTest(dfW, "arm", "t", "v", "id", trim = 0.2,
      unitScale = 10L).select("t_stat").as[Option[Double]].collect().head
    val yClean = Profiling.yuenTTest(df0, "arm", "t", "v", "id",
      trim = 0.2, unitScale = 10L)
      .select("t_stat").as[Option[Double]].collect().head
    val wW = Profiling.welchTTest(dfW.withColumn("seg", lit("all")),
      "seg", "arm", "t", "v", unitScale = 10L)
      .select("t_stat").as[Option[Double]].collect().head
    assert(math.abs(yW.get - yClean.get) < 0.5, s"$yW vs $yClean")
    assert(math.abs(wW.get) < math.abs(yW.get) / 2,
      s"welch $wW should collapse, yuen $yW should hold")
    // hand trim counts: n = 10 per arm at 20% -> g = 2, h = 6
    val ten = ((1L to 10L).map(i => (i, "t", i.toDouble)) ++
      (11L to 20L).map(i => (i, "c", i.toDouble))).toDF("id", "arm", "v")
    val hs = Profiling.yuenTTest(ten, "arm", "t", "v", "id", trim = 0.2,
      unitScale = 1L).select("n_t", "h_t", "mean_t")
      .as[(Long, Long, Option[Double])].collect().head
    // kept ranks 3..8 of 1..10 -> mean (3+4+5+6+7+8)/6 = 5.5
    assert(hs === ((10L, 6L, Some(5.5))))
    intercept[IllegalArgumentException] {
      Profiling.yuenTTest(ten, "arm", "t", "v", "id", trim = 0.5)
    }
  }

  test("mdeEstimate: brute formula parity; more data shrinks the MDE; " +
      "off-grid alpha/power rejected") {
    import spark.implicits._
    val rows = ((1 to 50).flatMap(_ => Seq(("t", 1.0), ("t", 3.0))) ++
      (1 to 50).flatMap(_ => Seq(("c", 2.0), ("c", 4.0))))
      .toDF("arm", "v")
    val got = Profiling.mdeEstimate(rows, "arm", "t", "v",
      alpha = 0.05, power = 0.8, unitScale = 1L)
      .as[(Long, Long, Option[Double], Option[Double], Option[Double],
        Option[Double])].collect().head
    // brute: each arm 100 rows alternating x, x+2 -> SS = 100,
    // pooled var = 200/198; mde = (1.96..+0.84..)*sqrt(v*(2/100))
    val varP = 200.0 / 198.0
    val mde = (1.959963984540054 + 0.8416212335729143) *
      math.sqrt(varP * (1.0 / 100 + 1.0 / 100))
    assert(got._1 === 100L && got._2 === 100L)
    assert(math.abs(got._3.get - 3.0) < 1e-9) // control mean
    assert(math.abs(got._4.get - math.sqrt(varP)) < 1e-6)
    assert(math.abs(got._5.get - mde) < 1e-6)
    assert(math.abs(got._6.get - mde / 3.0) < 1e-6)
    // 4x the data ~halves the MDE (sqrt law; exact up to the n-2
    // pooled-variance denominator)
    val big = rows.union(rows).union(rows).union(rows)
    val g2 = Profiling.mdeEstimate(big, "arm", "t", "v",
      alpha = 0.05, power = 0.8, unitScale = 1L)
      .select("mde_abs").as[Option[Double]].collect().head
    val mde4 = (1.959963984540054 + 0.8416212335729143) *
      math.sqrt((800.0 / 798.0) * (1.0 / 400 + 1.0 / 400))
    assert(math.abs(g2.get - mde4) < 1e-6)
    assert(g2.get < got._5.get * 0.51)
    intercept[IllegalArgumentException] {
      Profiling.mdeEstimate(rows, "arm", "t", "v", alpha = 0.07)
    }
    intercept[IllegalArgumentException] {
      Profiling.mdeEstimate(rows, "arm", "t", "v", power = 0.5)
    }
  }

  test("holmBonferroni: hand step-down; monotone in rank; dominates " +
      "BH pointwise; NULL p fails loud") {
    import spark.implicits._
    val hyp = Seq((1L, 0.01), (2L, 0.02), (3L, 0.03), (4L, 0.5))
      .toDF("id", "p")
    val got = Profiling.holmBonferroni(hyp, "id", "p", alpha = 0.05)
      .as[(Long, Double, Long, Long, Double, Boolean)]
      .collect().sortBy(_._3)
    // stepped: 4*0.01, 3*0.02, 2*0.03, 1*0.5 -> prefix max
    assert(got.map(_._5).toSeq === Seq(0.04, 0.06, 0.06, 0.5))
    assert(got.map(_._6).toSeq === Seq(true, false, false, false))
    assert(got.map(_._4).forall(_ === 4L))
    // Holm (FWER) is never more liberal than BH (FDR): adjusted p
    // dominates pointwise on a random frame
    val rnd = new scala.util.Random(11)
    val rand = (1L to 200L).map(i => (i, rnd.nextDouble())).toDF("id", "p")
    val holm = Profiling.holmBonferroni(rand, "id", "p")
      .select("id", "p_adj").as[(Long, Double)].collect().toMap
    val bh = Profiling.benjaminiHochberg(rand, "id", "p")
      .select("id", "p_adj").as[(Long, Double)].collect().toMap
    assert(holm.forall { case (id, h) => h >= bh(id) - 1e-9 })
    // monotone non-decreasing in rank
    val ordered = Profiling.holmBonferroni(rand, "id", "p")
      .orderBy("rank").select("p_adj").as[Double].collect()
    assert(ordered.zip(ordered.tail).forall { case (a, b) => b >= a })
    intercept[Exception] {
      Profiling.holmBonferroni(
        Seq((1L, Some(0.1)), (2L, None)).toDF("id", "p"), "id", "p")
        .collect()
    }
  }

  test("clusterDesignEffect: perfectly clustered data reads icc = 1, " +
      "deff = m; randomized brute parity; degenerate shapes NULL") {
    import spark.implicits._
    // two clusters of 2, zero within-cluster variance: icc = 1,
    // deff = 1 + (2-1)*1 = 2, n_eff = 2
    val hand = Seq(("a", 1.0), ("a", 1.0), ("b", 3.0), ("b", 3.0))
      .toDF("g", "v")
    val got = Profiling.clusterDesignEffect(hand, "g", "v", 1L)
      .as[(Long, Long, Option[Double], Option[Double], Option[Double],
        Option[Double])].collect().head
    assert(got === ((4L, 2L, Some(1.0), Some(2.0), Some(2.0), Some(2.0))))
    // randomized brute parity (unbalanced clusters, real spread)
    val rnd = new scala.util.Random(31)
    for (_ <- 1 to 3) {
      val rows = (1 to 300).map { _ =>
        val g = rnd.nextInt(20)
        (s"c$g", (g % 5).toDouble + rnd.nextInt(10))
      }
      val exp = {
        val by = rows.groupBy(_._1)
        val n = rows.size.toDouble
        val k = by.size.toDouble
        val a = by.values.toSeq
          .map(xs => (xs.map(_._2).sum, xs.size))
          .groupBy(_._2).toSeq.sortBy(_._1)
          .map { case (s, gs) =>
            gs.map(x => x._1 * x._1).sum / s.toDouble }.sum
        val s = rows.map(_._2).sum
        val q = rows.map(x => x._2 * x._2).sum
        val ssb = a - s * s / n
        val ssw = q - a
        val msb = ssb / (k - 1.0)
        val msw = ssw / (n - k)
        val sumsq = by.values.map(xs =>
          xs.size.toDouble * xs.size).sum
        val n0 = (n - sumsq / n) / (k - 1.0)
        val icc = (msb - msw) / (msb + (n0 - 1.0) * msw)
        (icc, 1.0 + (n / k - 1.0) * icc)
      }
      val g2 = Profiling.clusterDesignEffect(rows.toDF("g", "v"),
        "g", "v", 1L)
        .as[(Long, Long, Option[Double], Option[Double], Option[Double],
          Option[Double])].collect().head
      assert(math.abs(g2._3.get - exp._1) < 1e-5, s"icc ${g2._3}")
      assert(math.abs(g2._5.get - exp._2) < 1e-5, s"deff ${g2._5}")
    }
    // size-1 clusters everywhere: N = k, no within replication -> NULL
    val singletons = (1 to 5).map(i => (s"c$i", i.toDouble)).toDF("g", "v")
    val g3 = Profiling.clusterDesignEffect(singletons, "g", "v", 1L)
      .as[(Long, Long, Option[Double], Option[Double], Option[Double],
        Option[Double])].collect().head
    assert(g3._1 === 5L && g3._3.isEmpty && g3._5.isEmpty)
    // one cluster: k < 2 -> NULL everything including n0
    val one = Seq(("a", 1.0), ("a", 2.0)).toDF("g", "v")
    val g4 = Profiling.clusterDesignEffect(one, "g", "v", 1L)
      .as[(Long, Long, Option[Double], Option[Double], Option[Double],
        Option[Double])].collect().head
    assert(g4._2 === 1L && g4._3.isEmpty && g4._4.isEmpty)
  }

  test("ebShrinkRates: small groups shrink harder; brute MoM parity; " +
      "degenerate priors NULL; maxGroups gate") {
    import spark.implicits._
    // same raw rate 0.5 at n = 4 vs n = 400 among low-rate ballast
    // groups: the small group must move further toward the prior
    val frame = (
      (1 to 4).map(i => ("small", i <= 2)) ++
      (1 to 400).map(i => ("large", i <= 200)) ++
      (1 to 100).map(i => ("b1", i <= 10)) ++
      (1 to 100).map(i => ("b2", i <= 20)) ++
      (1 to 100).map(i => ("b3", i <= 15))).toDF("g", "y")
    val got = Profiling.ebShrinkRates(frame, "g", "y")
      .as[(String, Long, Long, Double, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    val m = got("small")._5.get
    assert(m === got("large")._5.get) // one shared prior mean
    val dSmall = math.abs(got("small")._6.get - 0.5)
    val dLarge = math.abs(got("large")._6.get - 0.5)
    assert(dSmall > dLarge, s"$dSmall vs $dLarge")
    // both shrink TOWARD the prior mean (m < 0.5 here)
    assert(got("small")._6.get < 0.5 && got("small")._6.get > m)
    // brute MoM parity
    val byG = Seq("small" -> (4, 2), "large" -> (400, 200),
      "b1" -> (100, 10), "b2" -> (100, 20), "b3" -> (100, 15))
    val ps = byG.sortBy(_._1).map { case (_, (n, x)) => x.toDouble / n }
    val k = ps.size.toDouble
    val mb = ps.sum / k
    val v = ps.map(p => (p - mb) * (p - mb)).sum / (k - 1.0)
    val bigM = mb * (1.0 - mb) / v - 1.0
    byG.foreach { case (g, (n, x)) =>
      val exp = (x + bigM * mb) / (n + bigM)
      assert(math.abs(got(g)._6.get - exp) < 1e-5, s"$g")
    }
    // identical group rates: v = 0 -> NULL prior columns, raw intact
    val flat = ((1 to 10).map(i => ("a", i <= 5)) ++
      (1 to 10).map(i => ("b", i <= 5))).toDF("g", "y")
    val gFlat = Profiling.ebShrinkRates(flat, "g", "y")
      .as[(String, Long, Long, Double, Option[Double], Option[Double])]
      .collect()
    assert(gFlat.forall(r => r._6.isEmpty && r._4 === 0.5))
    val e = intercept[IllegalArgumentException] {
      Profiling.ebShrinkRates(frame, "g", "y", maxGroups = 2L)
    }
    assert(e.getMessage.contains("maxGroups"))
  }

  test("srmCheck: hand chi2 on a skewed split; designed-but-empty arm " +
      "contributes its E; undesigned observed arm fails loud") {
    import spark.implicits._
    // 30/70 observed vs 50/50 designed on n=100: chi2 = 2*(20^2/50)=16
    val rows = ((1 to 30).map(_ => "a") ++ (1 to 70).map(_ => "b"))
      .toDF("arm")
    val got = Profiling.srmCheck(rows, "arm",
      Map("a" -> 0.5, "b" -> 0.5))
      .as[(Long, Long, Long, Option[Double])].collect().head
    assert(got === ((100L, 2L, 1L, Some(16.0))))
    // a designed arm with zero rows still contributes (O-E)^2/E
    val onlyA = (1 to 30).map(_ => "a").toDF("arm")
    val gm = Profiling.srmCheck(onlyA, "arm", Map("a" -> 0.5, "b" -> 0.5))
      .as[(Long, Long, Long, Option[Double])].collect().head
    assert(gm === ((30L, 2L, 1L, Some(30.0)))) // 15 + 15
    // an observed arm outside the design is the bug SRM hunts
    val e = intercept[Exception] {
      Profiling.srmCheck(rows, "arm", Map("a" -> 0.5, "c" -> 0.5))
        .collect()
    }
    assert(e.getMessage.contains("not in the designed split"))
    intercept[IllegalArgumentException] {
      Profiling.srmCheck(rows, "arm", Map("a" -> 0.7, "b" -> 0.7))
    }
  }

  test("diffInDiff: hand four-cell estimate + pooled SE; a missing " +
      "cell NULLs the estimate, never silently zero") {
    import spark.implicits._
    // c_pre (10,20) m=15 v=50; c_post (20,30) m=25 v=50;
    // t_pre (10,30) m=20 v=200; t_post (40,40) m=40 v=0
    // did = (40-20)-(25-15) = 10; se = sqrt(25+25+100+0)
    val rows = Seq(
      (false, false, 10.0), (false, false, 20.0),
      (false, true, 20.0), (false, true, 30.0),
      (true, false, 10.0), (true, false, 30.0),
      (true, true, 40.0), (true, true, 40.0))
      .toDF("treated", "post", "v")
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Profiling.diffInDiff(rows, "treated", "post", "v",
      unitScale = 1L)
      .as[(Long, Option[Double], Option[Double], Option[Double],
        Option[Double], Option[Double], Option[Double])].collect().head
    assert(got._1 === 8L)
    assert((got._2, got._3, got._4, got._5) ===
      ((Some(15.0), Some(25.0), Some(20.0), Some(40.0))))
    assert(got._6 === Some(10.0))
    assert(got._7 === Some(r6(math.sqrt(150.0))))
    // a null effect landing on zero from below is POSITIVE zero
    val nul = Profiling.diffInDiff(
      rows.withColumn("v", when(col("post"), 10.0).otherwise(5.0)),
      "treated", "post", "v", 1L)
      .as[(Long, Option[Double], Option[Double], Option[Double],
        Option[Double], Option[Double], Option[Double])].collect().head
    assert(nul._6 === Some(0.0) &&
      java.lang.Double.doubleToRawLongBits(nul._6.get) === 0L)
    // missing treated-pre cell: did/se NULL, present cells report
    val noTp = Profiling.diffInDiff(
      rows.filter(!(col("treated") && !col("post"))),
      "treated", "post", "v", 1L)
      .as[(Long, Option[Double], Option[Double], Option[Double],
        Option[Double], Option[Double], Option[Double])].collect().head
    assert(noTp._4.isEmpty && noTp._6.isEmpty && noTp._7.isEmpty)
    assert(noTp._2 === Some(15.0))
  }

  test("cupedAdjust: a perfectly predictive covariate zeroes the " +
      "adjusted variance; means stay unbiased; zero-var x NULLs") {
    import spark.implicits._
    // y = 2x + arm effect: pooled theta = 2, xbar = 2; adjusted values
    // collapse to the arm means (A -> 4, B -> 5), var_cuped = 0,
    // var_raw = 4, reduction = 1
    val rows = Seq(("A", 1.0, 2.0), ("A", 2.0, 4.0), ("A", 3.0, 6.0),
      ("B", 1.0, 3.0), ("B", 2.0, 5.0), ("B", 3.0, 7.0))
      .toDF("arm", "x", "y")
    val got = Profiling.cupedAdjust(rows, "arm", "x", "y",
      unitScale = 1L)
      .as[(String, Long, Double, Option[Double], Option[Double],
        Option[Double], Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    assert(got("A") === (("A", 3L, 4.0, Some(4.0), Some(4.0), Some(0.0),
      Some(1.0))))
    assert(got("B") === (("B", 3L, 5.0, Some(5.0), Some(4.0), Some(0.0),
      Some(1.0))))
    // adjusted mean must be POSITIVE zero even when it lands on zero
    // from below (roundz contract)
    val vz = got("A")._6.get
    assert(java.lang.Double.doubleToRawLongBits(vz) === 0L)
    // constant covariate: theta undefined -> raw columns only
    val cx = rows.withColumn("x", lit(5.0))
    val gc = Profiling.cupedAdjust(cx, "arm", "x", "y", 1L)
      .as[(String, Long, Double, Option[Double], Option[Double],
        Option[Double], Option[Double])].collect()
    assert(gc.forall(r => r._4.isEmpty && r._6.isEmpty && r._7.isEmpty))
    assert(gc.forall(_._5.isDefined))
  }

  test("brownForsythe: hand W on a heteroscedastic pair; shifted " +
      "identical spreads read exactly 0") {
    import spark.implicits._
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // gA (1,2,3) z2=(2,0,2); gB (10,20,30) z2=(20,0,20):
    // ssb = 1616/3 − 44²/6 = 216, ssw = 808 − 1616/3,
    // W = 4 · 216 / ssw
    val rows = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 10.0), ("b", 20.0), ("b", 30.0)).toDF("g", "v")
    val got = Profiling.brownForsythe(rows, "v", "g", unitScale = 1L)
      .as[(Long, Int, Int, Long, Option[Double])].collect().head
    val brun = 16.0 / 3.0 + 1600.0 / 3.0
    val ssb = brun - 44.0 * 44.0 / 6.0
    val ssw = 808.0 - brun
    assert(got === ((6L, 2, 1, 4L, Some(r4(4.0 / 1.0 * ssb / ssw)))))
    // identical spreads at different locations: ssb = 0 -> W = 0
    val shifted = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 11.0), ("b", 12.0), ("b", 13.0)).toDF("g", "v")
    val gs = Profiling.brownForsythe(shifted, "v", "g", 1L)
      .as[(Long, Int, Int, Long, Option[Double])].collect().head
    assert(gs._5 === Some(0.0))
    // every group constant: zero within-deviation -> NULL w
    val const = Seq(("a", 5.0), ("a", 5.0), ("b", 7.0), ("b", 7.0))
      .toDF("g", "v")
    val gcst = Profiling.brownForsythe(const, "v", "g", 1L)
      .as[(Long, Int, Int, Long, Option[Double])].collect().head
    assert(gcst._5 === None)
  }

  test("jarqueBera: hand moments on a 4-point fixture; constant " +
      "column NULLs; magnitude guard") {
    import spark.implicits._
    // u = (1,2,3,4): m2 = 1.25, m3 = 0 (symmetric), m4 = 2.5625 ->
    // skew 0, excess kurtosis 1.64 - 3 = -1.36,
    // JB = 4/6 · (0 + 1.8496/4)
    val rows = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
    val got = Profiling.jarqueBera(rows, "v", unitScale = 1L)
      .as[(Long, Option[Double], Option[Double], Option[Double],
        Option[Double])].collect().head
    def r(x: Double, s: Int) = BigDecimal(x)
      .setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exk = 2.5625 / (1.25 * 1.25) - 3.0
    val jb = 4.0 / 6.0 * (0.0 + exk * exk / 4.0)
    assert(got._1 === 4L && got._2 === Some(0.0))
    assert(got._3 === Some(r(exk, 6)))
    assert(got._4 === Some(r(jb, 4)))
    assert(got._5 === Some(r(math.exp(-jb / 2.0), 6)))
    // constant column: zero variance -> all statistics NULL
    val const = Seq(5.0, 5.0, 5.0).toDF("v")
    val gc = Profiling.jarqueBera(const, "v")
      .as[(Long, Option[Double], Option[Double], Option[Double],
        Option[Double])].collect().head
    assert(gc === ((3L, None, None, None, None)))
    // a normal-ish symmetric fixture scores a SMALLER JB than a
    // one-sided one (the screen actually discriminates)
    val skewed = Seq(1.0, 1.0, 1.0, 1.0, 10.0).toDF("v")
    val gs = Profiling.jarqueBera(skewed, "v")
      .as[(Long, Option[Double], Option[Double], Option[Double],
        Option[Double])].collect().head
    assert(gs._4.get > got._4.get)
    // magnitude gate: |u| past 1e7 units fails loud
    val big = Seq(1.0e9).toDF("v")
    val e = intercept[Exception] {
      Profiling.jarqueBera(big, "v", unitScale = 100L).collect()
    }
    assert(e.getMessage.contains("unitScale"), e.getMessage)
  }

  test("psiProfile: per-column rollup of the PSI contributions with " +
      "verdict bands; identical sides read stable 0") {
    import spark.implicits._
    // col a identical on both sides (psi 0, stable); col b fully
    // shifted (the hand PSI from the populationStability fixture:
    // contributions 0.643775 + 0.235139 -> psi 0.8789, shifted)
    val ref = (1 to 10).map(i => (i.toDouble, i.toDouble)).toDF("a", "b")
    // cur "a" carries all 10 rows identically; "b" is {6,7,8,9} with
    // NULLs elsewhere (NULLs drop inside populationStability)
    val cur2 = (1 to 10).map(_.toDouble).toDF("a")
      .withColumn("b", when(col("a") <= 4, col("a") + 5.0))
    val got = Profiling.psiProfile(ref, cur2, Seq("a", "b"), nBuckets = 2)
      .as[(String, Double, String)].collect()
    assert(got.length === 2)
    assert(got(0) === (("a", 0.0, "stable"))) // identical distribution
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // b: ref 5/5 around the 5.5 median; cur non-null = {6,7,8,9} ->
    // 0/4; the populationStability fixture's contributions exactly
    val expect = r4(r6((0.1 - 0.5) * math.log(0.1 / 0.5)) +
      r6((0.9 - 0.5) * math.log(0.9 / 0.5)))
    assert(got(1)._1 === "b" && got(1)._2 === expect &&
      got(1)._3 === "shifted")
    intercept[IllegalArgumentException] {
      Profiling.psiProfile(ref, cur2, Seq("nope"))
    }
  }

  test("cramersV: hand-computed 2x2 table; perfect association; one level") {
    import spark.implicits._
    // table: (x,p)=30 (x,q)=10 / (y,p)=10 (y,q)=30; n=80
    // marginals 40/40 each way -> e=20 everywhere; chi2 = 4*(10^2/20)=20
    // V = sqrt(20 / (80*1)) = 0.5
    val rows = Seq.fill(30)(("x", "p")) ++ Seq.fill(10)(("x", "q")) ++
      Seq.fill(10)(("y", "p")) ++ Seq.fill(30)(("y", "q"))
    val got = Profiling.cramersV(rows.toDF("a", "b"),
      "a", "b").as[(Long, Long, Long, Double, Option[Double])].head()
    assert(got === ((80L, 2L, 2L, 20.0, Some(0.5))))
    // perfect association -> V = 1
    val perfect = (Seq.fill(5)(("x", "p")) ++ Seq.fill(5)(("y", "q")))
      .toDF("a", "b")
    assert(Profiling.cramersV(perfect, "a", "b")
      .as[(Long, Long, Long, Double, Option[Double])].head()._5 === Some(1.0))
    // single level on one side: V undefined
    val mono = Seq(("x", "p"), ("x", "q")).toDF("a", "b")
    assert(Profiling.cramersV(mono, "a", "b")
      .as[(Long, Long, Long, Double, Option[Double])].head()._5.isEmpty)
  }

  test("mutualInformation: perfect -> ln 2 / NMI 1; independent -> 0; Theil's U") {
    import spark.implicits._
    val perfect = (Seq.fill(5)(("x", "p")) ++ Seq.fill(5)(("y", "q")))
      .toDF("a", "b")
    val got = Profiling.mutualInformation(perfect, "a", "b")
      .as[(Long, Double, Double, Double, Option[Double], Option[Double], Option[Double])].head()
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got._1 === 10L)
    assert(got._2 === r6(math.log(2)) && got._3 === r6(math.log(2)))
    assert(got._4 === r6(math.log(2)))
    assert(got._5 === Some(1.0))
    assert(got._6 === Some(1.0) && got._7 === Some(1.0)) // U both ways
    val indep = Seq(("x", "p"), ("x", "q"), ("y", "p"), ("y", "q"))
      .toDF("a", "b")
    val g2 = Profiling.mutualInformation(indep, "a", "b")
      .as[(Long, Double, Double, Double, Option[Double], Option[Double], Option[Double])].head()
    assert(g2._4 === 0.0 && g2._5 === Some(0.0))
    assert(g2._6 === Some(0.0) && g2._7 === Some(0.0))
    // constant column a: H(a)=0 -> NMI and U(a|b) undefined; U(b|a)=0
    val const = Seq(("x", "p"), ("x", "q")).toDF("a", "b")
    val g3 = Profiling.mutualInformation(const, "a", "b").as[(Long, Double, Double, Double, Option[Double], Option[Double], Option[Double])].head()
    assert(g3._5.isEmpty && g3._6.isEmpty && g3._7 === Some(0.0))
    // ASYMMETRY: b determines a (each b level maps to one a), but a
    // leaves b uncertain -> U(a|b) = 1, U(b|a) < 1
    val asym = Seq(("x", "p"), ("x", "q"), ("y", "r"), ("y", "s"))
      .toDF("a", "b")
    val g4 = Profiling.mutualInformation(asym, "a", "b").as[(Long, Double, Double, Double, Option[Double], Option[Double], Option[Double])].head()
    assert(g4._6 === Some(1.0))
    assert(g4._7.exists(_ < 1.0))
  }

  test("mutualInformationBinned: V-shape invisible to Spearman, independent zero") {
    import spark.implicits._
    // y = |x - 5.5|: perfectly dependent, monotone NOWHERE near rho=1;
    // with 2 equi-depth bins each: x-bins split at median, y similar —
    // binned MI must come out strictly positive
    val v = (1 to 10).map(i => (i.toDouble, math.abs(i - 5.5))).toDF("x", "y")
    val mi = Profiling.mutualInformationBinned(v, "x", "y", nBins = 2)
      .as[(Long, Double, Double, Double, Option[Double], Option[Double],
        Option[Double])].head()
    assert(mi._1 === 10L && mi._4 === 0.0) // 2 bins: V-shape folds evenly!
    // 4 bins resolve the V: dependence appears
    val mi4 = Profiling.mutualInformationBinned(v, "x", "y", nBins = 4)
      .as[(Long, Double, Double, Double, Option[Double], Option[Double],
        Option[Double])].head()
    assert(mi4._4 > 0.0)
    // independent uniform grid -> exactly zero at matching bins
    val ind = (for (i <- 1 to 4; j <- 1 to 4) yield (i.toDouble, j.toDouble))
      .toDF("x", "y")
    val mz = Profiling.mutualInformationBinned(ind, "x", "y", nBins = 2)
      .as[(Long, Double, Double, Double, Option[Double], Option[Double],
        Option[Double])].head()
    assert(mz._4 === 0.0)
    // empty / all-null input fails loud (was an NPE off percentile's
    // NULL row before the guard)
    val empty = Seq((Option.empty[Double], Option.empty[Double]))
      .toDF("x", "y")
    val e = intercept[IllegalArgumentException] {
      Profiling.mutualInformationBinned(empty, "x", "y")
    }
    assert(e.getMessage.contains("at least one non-null"))
  }

  test("krippendorffAlpha: textbook fixture, perfect 1, single-label NULL, " +
      "unpairable NULL") {
    import spark.implicits._
    // 4 units × 2 coders: (a,a) (a,b) (b,b) (b,b) → D_obs numerator 2
    // at m=2, n=8, n_a=3, n_b=5 → α = 1 − 7·2/30 = 8/15 = 0.533333
    val rows = Seq((1, 1, "a"), (1, 2, "a"), (2, 1, "a"), (2, 2, "b"),
      (3, 1, "b"), (3, 2, "b"), (4, 1, "b"), (4, 2, "b"))
      .toDF("unit", "coder", "lab")
    val got = Profiling.krippendorffAlpha(rows, "unit", "coder", "lab")
      .as[(Long, Long, Option[Double])].collect().head
    assert(got === ((4L, 8L, Some(math.rint((1.0 - 7.0 * 2.0 / 30.0) * 1e6)
      / 1e6))))
    // perfect agreement → 1.0
    val perfect = Seq((1, 1, "a"), (1, 2, "a"), (2, 1, "b"), (2, 2, "b"))
      .toDF("unit", "coder", "lab")
    assert(Profiling.krippendorffAlpha(perfect, "unit", "coder", "lab")
      .as[(Long, Long, Option[Double])].collect().head ===
      ((2L, 4L, Some(1.0))))
    // one label everywhere → D_exp = 0 → NULL (agreement is undefined,
    // not perfect — the classic alpha gotcha)
    val mono = Seq((1, 1, "a"), (1, 2, "a")).toDF("unit", "coder", "lab")
    assert(Profiling.krippendorffAlpha(mono, "unit", "coder", "lab")
      .as[(Long, Long, Option[Double])].collect().head === ((1L, 2L, None)))
    // no unit has 2 ratings → nothing pairable → 0 units, NULL alpha
    val single = Seq((1, 1, "a"), (2, 1, "b")).toDF("unit", "coder", "lab")
    assert(Profiling.krippendorffAlpha(single, "unit", "coder", "lab")
      .as[(Long, Long, Option[Double])].collect().head === ((0L, 0L, None)))
  }

  test("functionalDependency: violations counted, null semantics pinned") {
    import spark.implicits._
    val df = Seq((1L, Some("a")), (1L, Some("a")), // duplicate pair: fine
      (2L, Some("a")), (2L, Some("b")),            // violation
      (3L, None), (3L, Some("x")),                 // null dep IS a value
      (4L, None)).toDF("k", "v")
    val got = Profiling.functionalDependency(df, "k", "v")
      .as[(Long, Long, Boolean)].head()
    assert(got === ((4L, 2L, false)))
    val clean = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    assert(Profiling.functionalDependency(clean, "k", "v")
      .as[(Long, Long, Boolean)].head() === ((2L, 0L, true)))
  }

  test("benfordAudit: digits pinned, shares sum, guards") {
    import spark.implicits._
    // values with known leading digits: 1,1,2,9 (0.0034 -> 3; skip: use
    // explicit) — leading digits: 123->1, 0.19->1, 2e3->2, 9.5->9
    val df = Seq(123.0, 0.19, 2000.0, 9.5, -7.0, 0.0).toDF("v")
    val got = Profiling.benfordAudit(df, "v")
      .as[(Int, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet === (1 to 9).toSet)
    assert(got(1)._2 === 2L && got(2)._2 === 1L && got(9)._2 === 1L)
    assert(got(3)._2 === 0L) // absent digit still reported
    assert(math.abs(got.values.map(_._3).sum - 1.0) < 1e-9)
    assert(math.abs(got.values.map(_._4).sum - 1.0) < 1e-4)
    intercept[IllegalArgumentException] {
      Profiling.benfordAudit(Seq(-1.0, 0.0).toDF("v"), "v")
    }
    // non-finite positives (+Inf sails through v > 0; NaN orders above
    // every real value in Spark so it does too) must fail loudly — they
    // have no leading decimal digit and previously vanished silently
    val inf = intercept[IllegalArgumentException] {
      Profiling.benfordAudit(
        Seq(123.0, Double.PositiveInfinity).toDF("v"), "v")
    }
    assert(inf.getMessage.contains("non-finite"))
    val nan = intercept[IllegalArgumentException] {
      Profiling.benfordAudit(Seq(123.0, Double.NaN).toDF("v"), "v")
    }
    assert(nan.getMessage.contains("non-finite"))
  }

  test("welchTTest: hand-computed t/df; degenerate sides go NULL; lone cohorts drop") {
    import spark.implicits._
    val rows = Seq(
      // segment s: treatment {10, 12} (mean 11, var 2),
      //            control {10, 10, 13} (mean 11, var 3)
      ("s", "T", 10.0), ("s", "T", 12.0),
      ("s", "C", 10.0), ("s", "C", 10.0), ("s", "C", 13.0),
      // segment z: single treated row → t/df NULL but means report
      ("z", "T", 5.0), ("z", "C", 1.0), ("z", "C", 3.0),
      // segment only-control: no treated cohort → no output row
      ("x", "C", 1.0), ("x", "C", 2.0))
      .toDF("seg", "grp", "v")
    val got = Profiling.welchTTest(rows, "seg", "grp", "T", "v")
      .as[(String, Long, Long, Double, Double, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(got.keySet === Set("s", "z"))
    val s = got("s")
    assert(s._2 === 2L && s._3 === 3L)
    assert(s._4 === 11.0 && s._5 === 11.0)
    // se² = 2/2 + 3/3 = 2 → t = 0; df = 4 / (1²/1 + 1²/2) = 2.6667
    assert(s._6 === Some(0.0))
    assert(s._7 === Some(2.6667))
    val z = got("z")
    assert(z._2 === 1L && z._4 === 5.0 && z._5 === 2.0)
    assert(z._6.isEmpty && z._7.isEmpty)
    // zero variance on BOTH sides: se² = 0 → NULL, not a 0/0 artifact
    val const = Seq(("k", "T", 7.0), ("k", "T", 7.0),
      ("k", "C", 7.0), ("k", "C", 7.0)).toDF("seg", "grp", "v")
    val kc = Profiling.welchTTest(const, "seg", "grp", "T", "v")
      .as[(String, Long, Long, Double, Double, Option[Double], Option[Double])]
      .head()
    assert(kc._6.isEmpty && kc._7.isEmpty)
  }

  test("standardize: exact per-group z; degenerate groups go NULL") {
    import spark.implicits._
    val rows = Seq(
      ("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 3.0), // μ=2 σ=1
      ("b", 4L, 9.0),                                  // n=1 → NULL
      ("c", 5L, 5.0), ("c", 6L, 5.0))                  // var=0 → NULL
      .toDF("grp", "id", "v")
    val got = Profiling.standardize(rows, "grp", "id", "v")
      .as[(String, Long, Double, Option[Double])].collect()
      .map(r => r._2 -> r).toMap
    assert(got.size === 6)
    assert(got(1L)._4 === Some(-1.0))
    assert(got(2L)._4 === Some(0.0))
    assert(got(3L)._4 === Some(1.0))
    assert(got(4L)._4.isEmpty)
    assert(got(5L)._4.isEmpty && got(6L)._4.isEmpty)
    // a null group is excluded, not standardized against nothing
    val withNull = rows.union(Seq((null.asInstanceOf[String], 7L, 1.0))
      .toDF("grp", "id", "v"))
    assert(Profiling.standardize(withNull, "grp", "id", "v")
      .count() === 6L)
  }

  test("categoricalDivergence: smoothing, exact-integer ordering, zero on identity") {
    val ref = Seq("a", "a", "b").toDF("k")
    val cur = Seq("a", "b", "b", "b").toDF("k")
    val got = Profiling.categoricalDivergence(ref, cur, "k")
      .as[(String, Long, Long, Double, Double, Double, Double)].collect()
    // V=2, Tr=3, Tc=4: p_a=2.5/4, q_a=1.5/5; p_b=1.5/4, q_b=3.5/5.
    // |p−q| ties at 0.325 — the decimal order key ties too (26 = 26),
    // so key asc breaks it: a first.
    assert(got.map(_._1).toSeq === Seq("a", "b"))
    val (pa, qa) = (2.5 / 4.0, 1.5 / 5.0)
    def r6(x: Double): Double = math.rint(x * 1e6) / 1e6
    assert(got(0)._4 === r6(pa) && got(0)._5 === r6(qa))
    assert(got(0)._6 === r6(pa * math.log(pa / qa)))
    assert(got(0)._7 === r6((pa * math.log(2 * pa / (pa + qa)) +
      qa * math.log(2 * qa / (pa + qa))) / 2))
    // identical sides → every contribution is exactly zero
    val same = Profiling.categoricalDivergence(ref, ref, "k")
      .as[(String, Long, Long, Double, Double, Double, Double)].collect()
    assert(same.forall(r => r._6 === 0.0 && r._7 === 0.0))
    // k caps the report; an empty side fails loud
    assert(Profiling.categoricalDivergence(ref, cur, "k", k = 1).count() === 1L)
    intercept[IllegalArgumentException] {
      Profiling.categoricalDivergence(ref.limit(0), cur, "k")
    }
  }

  test("vectorCovariance: one-pass Gram matches brute force, short rows excluded") {
    val vecs = Seq(Seq(1.0, 2.0), Seq(2.0, 4.0), Seq(3.0, 6.0), Seq(9.0))
      .toDF("embedding")
    val got = Profiling.vectorCovariance(vecs, "embedding", dims = 2)
      .as[(Int, Int, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(got.size === 3) // upper triangle of d=2
    assert(got((0, 0)) === ((3L, math.rint(2.0 / 3 * 1e6) / 1e6)))
    assert(got((0, 1)) === ((3L, math.rint(4.0 / 3 * 1e6) / 1e6)))
    assert(got((1, 1)) === ((3L, math.rint(8.0 / 3 * 1e6) / 1e6)))
    intercept[IllegalArgumentException] {
      Profiling.vectorCovariance(vecs, "embedding", dims = 3) // all rows short
    }
  }

  test("cohensKappa: textbook 2x2 value, null exclusion, constant-rater null") {
    import spark.implicits._
    // classic fixture: po = 0.7, pe = 0.5 → kappa = 0.4 exactly
    val rows = Seq.fill(20)(("y", "y")) ++ Seq.fill(10)(("y", "n")) ++
      Seq.fill(5)(("n", "y")) ++ Seq.fill(15)(("n", "n")) ++
      Seq((null.asInstanceOf[String], "y")) // excluded, not a category
    val got = Profiling.cohensKappa(rows.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Double, Double, Option[Double])].collect().head
    assert(got === ((50L, 35L, 0.7, 0.5, Some(0.4))))
    // both raters constant → pe = 1, kappa undefined → NULL
    val const = Seq.fill(4)(("x", "x")).toDF("a", "b")
    val k = Profiling.cohensKappa(const, "a", "b")
      .as[(Long, Long, Double, Double, Option[Double])].collect().head
    assert(k._1 === 4L && k._3 === 1.0 && k._4 === 1.0 && k._5.isEmpty)
    // disjoint label spaces: S = 0 → kappa = agree/n = 0 over 1 → 0
    val disj = Seq(("a", "b"), ("c", "d")).toDF("a", "b")
    val d = Profiling.cohensKappa(disj, "a", "b")
      .as[(Long, Long, Double, Double, Option[Double])].collect().head
    assert(d._4 === 0.0 && d._5 === Some(0.0))
  }

  test("mannWhitneyU: hand-computed tied U and z, all-tied null, missing group drop") {
    import spark.implicits._
    // treated {1,2,3} vs control {2,3,4}: avg ranks 1, 2.5, 2.5, 4.5,
    // 4.5, 6 → R_t = 8 → U = 8 − 6 = 2; ties T = 2·(2³−2) = 12,
    // σ² = (9/12)(7 − 12/30) = 4.95, z = −2.5/√4.95
    val rows = Seq(("s", "t", 1.0), ("s", "t", 2.0), ("s", "t", 3.0),
      ("s", "c", 2.0), ("s", "c", 3.0), ("s", "c", 4.0),
      ("only_t", "t", 1.0)) // no control → no comparison → dropped
      .toDF("segment", "grp", "v")
    val got = Profiling.mannWhitneyU(rows, "segment", "grp", "t", "v",
        unitScale = 1L)
      .as[(String, Long, Long, Double, Option[Double])].collect()
    assert(got.map(_._1).toSeq === Seq("s"))
    val r = got.head
    assert(r._2 === 3L && r._3 === 3L && r._4 === 2.0)
    assert(r._5 === Some(math.rint(-2.5 / math.sqrt(4.95) * 1e4) / 1e4))
    // every value tied → σ² = 0 → NULL z, U still exact
    val tied = Seq(("s", "t", 5.0), ("s", "t", 5.0), ("s", "c", 5.0))
      .toDF("segment", "grp", "v")
    val tr = Profiling.mannWhitneyU(tied, "segment", "grp", "t", "v",
        unitScale = 1L)
      .as[(String, Long, Long, Double, Option[Double])].collect().head
    assert(tr._4 === 1.0 && tr._5.isEmpty) // R_t = 4 → U = 4 − 3 = 1
  }

  test("spearmanCorrelation: tie-exact rho, monotone ±1, constant null") {
    import spark.implicits._
    def rho(rows: Seq[(Long, Double, Double)]): Option[Double] =
      Profiling.spearmanCorrelation(rows.toDF("id", "x", "y"), "x", "y",
          "id", unitScale = 1L)
        .as[(Long, Option[Double])].collect().head._2
    // aligned ties, monotone → exactly 1; reversed → exactly −1
    val mono = Seq((1L, 1.0, 10.0), (2L, 2.0, 20.0), (3L, 2.0, 20.0),
      (4L, 3.0, 40.0))
    assert(rho(mono) === Some(1.0))
    assert(rho(mono.map(r => (r._1, r._2, -r._3))) === Some(-1.0))
    // hand case: ranks (1,2,3) vs (3,1,2) → ρ = −0.5 exactly
    assert(rho(Seq((1L, 1.0, 3.0), (2L, 2.0, 1.0), (3L, 3.0, 2.0)))
      === Some(-0.5))
    // constant variable → zero rank variance → NULL
    assert(rho(Seq((1L, 5.0, 1.0), (2L, 5.0, 2.0))).isEmpty)
  }

  test("ksTest: exact ECDF gap, identical-sample zero, shape-only difference") {
    import spark.implicits._
    // t = {1,2}, c = {2,3}: gaps 2/4, 2/4, 0 → D = 0.5 exactly
    val rows = Seq(("s", "t", 1.0), ("s", "t", 2.0),
      ("s", "c", 2.0), ("s", "c", 3.0)).toDF("segment", "grp", "v")
    val got = Profiling.ksTest(rows, "segment", "grp", "t", "v",
        unitScale = 1L)
      .as[(String, Long, Long, Double, Double)].collect().head
    assert(got === (("s", 2L, 2L, 0.5, 0.5))) // ks = 0.5·√(4/4)
    // identical samples → D = 0
    val same = Seq(("s", "t", 1.0), ("s", "t", 2.0),
      ("s", "c", 1.0), ("s", "c", 2.0)).toDF("segment", "grp", "v")
    assert(Profiling.ksTest(same, "segment", "grp", "t", "v",
        unitScale = 1L)
      .as[(String, Long, Long, Double, Double)].collect().head._4 === 0.0)
    // same mean and rank sum, different SHAPE: t = {−2,2}×2 vs
    // c = {−1,1}×2 — U sees symmetry, KS sees D = 1/2 at u = −1
    val shape = Seq(("s", "t", -2.0), ("s", "t", 2.0), ("s", "t", -2.0),
      ("s", "t", 2.0), ("s", "c", -1.0), ("s", "c", 1.0),
      ("s", "c", -1.0), ("s", "c", 1.0)).toDF("segment", "grp", "v")
    val sh = Profiling.ksTest(shape, "segment", "grp", "t", "v",
        unitScale = 1L)
      .as[(String, Long, Long, Double, Double)].collect().head
    assert(sh._4 === 0.5)
  }

  test("giniSplitProfile: perfect split zero, hand curve, last level excluded") {
    import spark.implicits._
    // label flips exactly at the value boundary → gini 0 at t = 1
    val perfect = Seq((1.0, true), (1.0, true), (2.0, false), (2.0, false))
      .toDF("f", "y")
    val p = Profiling.giniSplitProfile(perfect, "f", "y", unitScale = 1L)
      .as[(Long, Long, Long, Double)].collect()
    assert(p.toSeq === Seq((1L, 2L, 2L, 0.0))) // t=2 splits nothing off
    // alternating labels: curve 1/3, 1/2, 1/3 by hand
    val alt = Seq((1.0, true), (2.0, false), (3.0, true), (4.0, false))
      .toDF("f", "y")
    val a = Profiling.giniSplitProfile(alt, "f", "y", unitScale = 1L)
      .as[(Long, Long, Long, Double)].collect()
    assert(a.map(_._1).toSeq === Seq(1L, 2L, 3L))
    assert(a.map(_._4).toSeq === Seq(4.0 / 12, 0.5, 4.0 / 12))
  }

  test("aucReport: hand mid-rank AUC with ties, perfect separation, one-class empty") {
    import spark.implicits._
    // pos {3, 2} vs neg {1, 2}: ranks 1 | 2.5 2.5 | 4 → R_pos = 6.5 →
    // U = 3.5 → AUC = 3.5/4 = 0.875, gini = 0.75
    val rows = Seq((3.0, true), (2.0, true), (1.0, false), (2.0, false))
      .toDF("s", "y")
    val r = Profiling.aucReport(rows, "s", "y", unitScale = 1L)
      .as[(Long, Long, Double, Double)].collect().head
    assert(r === ((2L, 2L, 0.875, 0.75)))
    // every positive above every negative → AUC exactly 1
    val perfect = Seq((9.0, true), (10.0, true), (1.0, false), (2.0, false))
      .toDF("s", "y")
    assert(Profiling.aucReport(perfect, "s", "y", unitScale = 1L)
      .as[(Long, Long, Double, Double)].collect().head._3 === 1.0)
    // one class absent → AUC undefined → empty frame
    val onec = Seq((1.0, true), (2.0, true)).toDF("s", "y")
    assert(Profiling.aucReport(onec, "s", "y", unitScale = 1L).count() === 0)
  }

  test("kruskalWallis: tie-free hand H, tie-corrected H, all-tied null, k=1 drop") {
    import spark.implicits._
    // {1,2} {3,4} {5,6}: R = 3,7,11 → H = 12/42·89.5 − 21 = 32/7
    val rows = Seq(("s", "a", 1.0), ("s", "a", 2.0), ("s", "b", 3.0),
      ("s", "b", 4.0), ("s", "c", 5.0), ("s", "c", 6.0),
      ("lone", "a", 1.0)) // single group → no test → dropped
      .toDF("segment", "g", "v")
    val got = Profiling.kruskalWallis(rows, "segment", "g", "v",
        unitScale = 1L)
      .as[(String, Long, Long, Option[Double])].collect()
    assert(got.map(_._1).toSeq === Seq("s"))
    val r = got.head
    assert(r._2 === 3L && r._3 === 6L)
    assert(r._4 === Some(math.rint(32.0 / 7 * 1e4) / 1e4))
    // ties: {1,1} vs {2,2} → H_raw = 2.4, C = 1 − 12/60 = 0.8 → H = 3
    val tied = Seq(("s", "a", 1.0), ("s", "a", 1.0), ("s", "b", 2.0),
      ("s", "b", 2.0)).toDF("segment", "g", "v")
    assert(Profiling.kruskalWallis(tied, "segment", "g", "v",
        unitScale = 1L)
      .as[(String, Long, Long, Option[Double])].collect().head._4
      === Some(3.0))
    // every value tied → C = 0 → NULL h, counts still exact
    val all = Seq(("s", "a", 5.0), ("s", "b", 5.0)).toDF("segment", "g", "v")
    val at = Profiling.kruskalWallis(all, "segment", "g", "v",
        unitScale = 1L)
      .as[(String, Long, Long, Option[Double])].collect().head
    assert(at._2 === 2L && at._4.isEmpty)
  }

  test("anovaF: hand F and eta2, zero-within variance null, k=1 drop") {
    import spark.implicits._
    // {1,2} vs {4,6}: SSB = 12.25, SSW = 2.5, SST = 14.75 →
    // F = 12.25/(2.5/2) = 9.8, η² = 12.25/14.75
    val rows = Seq(("s", "a", 1.0), ("s", "a", 2.0), ("s", "b", 4.0),
      ("s", "b", 6.0), ("lone", "a", 1.0)).toDF("segment", "g", "v")
    val got = Profiling.anovaF(rows, "segment", "g", "v", unitScale = 1L)
      .as[(String, Long, Long, Option[Double], Option[Double])].collect()
    assert(got.map(_._1).toSeq === Seq("s"))
    val r = got.head
    assert(r._2 === 2L && r._3 === 4L && r._4 === Some(9.8))
    assert(r._5 === Some(math.rint(12.25 / 14.75 * 1e6) / 1e6))
    // groups internally constant → SSW = 0 → F NULL, η² = 1 exactly
    val sep = Seq(("s", "a", 1.0), ("s", "a", 1.0), ("s", "b", 2.0),
      ("s", "b", 2.0)).toDF("segment", "g", "v")
    val sp = Profiling.anovaF(sep, "segment", "g", "v", unitScale = 1L)
      .as[(String, Long, Long, Option[Double], Option[Double])]
      .collect().head
    assert(sp._4.isEmpty && sp._5 === Some(1.0))
  }

  test("calibrationReport: hand bins with p=1 clamp, out-of-range raises") {
    import spark.implicits._
    val rows = Seq((0.05, false), (0.95, true), (0.95, false), (1.0, true))
      .toDF("p", "y")
    val got = Profiling.calibrationReport(rows, "p", "y", nBins = 10)
      .orderBy("bin")
      .as[(Long, Long, Long, Double, Double, Double)].collect()
    assert(got.length === 2)
    assert(got(0) === ((0L, 1L, 0L, 0.05, 0.0, -0.05)))
    // bin 9 holds 0.95, 0.95, 1.0 (clamped): mean 2.9/3, rate 2/3
    val b9 = got(1)
    assert(b9._1 === 9L && b9._2 === 3L && b9._3 === 2L)
    assert(b9._4 === 2900000.0 / 3000000.0 && b9._5 === 2.0 / 3.0)
    assert(b9._6 === math.rint((2.0 / 3.0 - 2900000.0 / 3000000.0) * 1e6)
      / 1e6)
    val bad = Seq((1.5, true)).toDF("p", "y")
    val e = intercept[Exception] {
      Profiling.calibrationReport(bad, "p", "y").collect()
    }
    assert(e.getMessage.contains("outside [0, 1]"))
  }

  test("kendallTau: monotone ±1, hand tie case 0.5, constant null") {
    import spark.implicits._
    def tau(rows: Seq[(Double, Double)]): (Long, Option[Double]) = {
      val r = Profiling.kendallTau(rows.toDF("x", "y"), "x", "y",
          unitScale = 1L)
        .as[(Long, Option[Long], Option[Long], Option[Double])]
        .collect().head
      (r._1, r._4)
    }
    assert(tau(Seq((1.0, 1.0), (2.0, 2.0), (3.0, 3.0))) === ((3L, Some(1.0))))
    assert(tau(Seq((1.0, 3.0), (2.0, 2.0), (3.0, 1.0))) === ((3L, Some(-1.0))))
    // x = (1,1,2), y = (1,2,2): C = 1, D = 0, T_x = T_y = 1 →
    // τ-b = 1/√(2·2) = 0.5 exactly
    assert(tau(Seq((1.0, 1.0), (1.0, 2.0), (2.0, 2.0))) === ((3L, Some(0.5))))
    // constant x → denominator 0 → NULL
    assert(tau(Seq((5.0, 1.0), (5.0, 2.0)))._2.isEmpty)
    // the documented O(C²) cell bound is ENFORCED: 4 distinct cells
    // against maxCells = 3 must fail loud with the escape hatch —
    // and coarsening unitScale (the prescribed fix) un-trips it
    val wide = Seq((1.0, 1.0), (2.0, 2.0), (3.0, 3.0), (4.0, 4.0))
      .toDF("x", "y")
    val e = intercept[IllegalArgumentException] {
      Profiling.kendallTau(wide, "x", "y", unitScale = 1L, maxCells = 3L)
    }
    assert(e.getMessage.contains("maxCells") &&
      e.getMessage.contains("spearmanCorrelation"))
    assert(Profiling.kendallTau(wide, "x", "y", unitScale = 1L, maxCells = 4L)
      .as[(Long, Option[Long], Option[Long], Option[Double])]
      .collect().head._4 === Some(1.0))
  }

  test("quantileNormalize/conformalThresholdByGroup: giantGroups form is " +
      "bit-identical to the window default") {
    import spark.implicits._
    val rows = (0 until 300).map { i =>
      val h = ((i * 2654435761L) ^ (i >> 2)) & Long.MaxValue
      (s"g${i % 4}", i.toLong, (h % 13).toDouble)
    }.toDF("grp", "id", "v")
    val a = Profiling.quantileNormalize(rows, "grp", "id", "v", unitScale = 1L)
    val b = Profiling.quantileNormalize(rows, "grp", "id", "v", unitScale = 1L,
      giantGroups = true)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    val c = Profiling.conformalThresholdByGroup(rows, "v", "grp", alpha = 0.2,
      unitScale = 1L)
    val d = Profiling.conformalThresholdByGroup(rows, "v", "grp", alpha = 0.2,
      unitScale = 1L, giantGroups = true)
    assert(c.exceptAll(d).isEmpty && d.exceptAll(c).isEmpty)
  }

  test("quantileNormalize: equal groups swap to rank means, unequal-size variant") {
    import spark.implicits._
    val rows = Seq(("A", 1L, 2.0), ("A", 2L, 4.0), ("B", 3L, 6.0),
      ("B", 4L, 8.0)).toDF("grp", "id", "v")
    val got = Profiling.quantileNormalize(rows, "grp", "id", "v",
        unitScale = 1L)
      .orderBy("grp", "id")
      .as[(String, Long, Double, Double)].collect()
    // rank-1 mean = (2+6)/2 = 4, rank-2 mean = (4+8)/2 = 6 — both
    // groups end up on the SAME two-point distribution
    assert(got.toSeq === Seq(("A", 1L, 2.0, 4.0), ("A", 2L, 4.0, 6.0),
      ("B", 3L, 6.0, 4.0), ("B", 4L, 8.0, 6.0)))
    // a short group only contributes to the ranks it has
    val uneq = rows.union(Seq(("C", 5L, 10.0)).toDF("grp", "id", "v"))
    val u = Profiling.quantileNormalize(uneq, "grp", "id", "v",
        unitScale = 1L)
      .filter(col("grp") === "C")
      .as[(String, Long, Double, Double)].collect().head
    assert(u._4 === (2.0 + 6.0 + 10.0) / 3) // rank-1 mean over 3 groups
  }

  test("mcnemarTest: textbook corrected chi2, uncorrected variant, no-discord null") {
    import spark.implicits._
    // classic fixture: both=59, a-only=6, b-only=16, neither=80
    // corrected chi2 = (|6-16|-1)^2/22 = 81/22
    val rows = (Seq.fill(59)((true, true)) ++ Seq.fill(6)((true, false)) ++
      Seq.fill(16)((false, true)) ++ Seq.fill(80)((false, false)))
      .toDF("a", "b")
    val r = Profiling.mcnemarTest(rows, "a", "b")
      .as[(Long, Long, Long, Long, Long, Option[Double])].collect().head
    assert(r === ((161L, 59L, 80L, 6L, 16L,
      Some(math.rint(81.0 / 22 * 1e4) / 1e4))))
    // uncorrected: 100/22
    val u = Profiling.mcnemarTest(rows, "a", "b", corrected = false)
      .as[(Long, Long, Long, Long, Long, Option[Double])].collect().head
    assert(u._6 === Some(math.rint(100.0 / 22 * 1e4) / 1e4))
    // perfect agreement -> no discordant pairs -> NULL
    val same = Seq((true, true), (false, false)).toDF("a", "b")
    assert(Profiling.mcnemarTest(same, "a", "b")
      .as[(Long, Long, Long, Long, Long, Option[Double])]
      .collect().head._6.isEmpty)
  }

  test("effectiveSampleSize: equal weights full, dominated low, grouped, guard") {
    import spark.implicits._
    // equal weights -> ESS = n exactly
    val eq = Seq(("g", 2.0), ("g", 2.0), ("g", 2.0), ("g", 2.0))
      .toDF("grp", "w")
    val e = Profiling.effectiveSampleSize(eq, "w", "grp")
      .as[(String, Long, Double, Double)].collect().head
    assert(e === (("g", 4L, 4.0, 1.0)))
    // one dominating weight: w = (3, 1): ESS = 16/10 = 1.6, ratio 0.8
    val dom = Seq(("g", 3.0), ("g", 1.0)).toDF("grp", "w")
    val d = Profiling.effectiveSampleSize(dom, "w", "grp")
      .as[(String, Long, Double, Double)].collect().head
    assert(d._3 === 1.6 && d._4 === 0.8)
    // ungrouped variant drops the group column
    val g = Profiling.effectiveSampleSize(eq, "w")
      .as[(Long, Double, Double)].collect().head
    assert(g === ((4L, 4.0, 1.0)))
    // zero weight fails loud
    val bad = Seq(("g", 0.0)).toDF("grp", "w")
    val ex = intercept[Exception] {
      Profiling.effectiveSampleSize(bad, "w", "grp").collect()
    }
    assert(ex.getMessage.contains("quantized to <= 0"))
  }

  test("spearmanMatrix: pairwise rho matches single-pair operator, constant NULL") {
    import spark.implicits._
    val rows = Seq((1L, 1.0, 10.0, 3.0), (2L, 2.0, 20.0, 1.0),
      (3L, 2.0, 20.0, 2.0), (4L, 3.0, 40.0, 7.0))
      .toDF("id", "x", "y", "k")
    val got = Profiling.spearmanMatrix(rows, Seq("x", "y", "k"), "id",
        unitScale = 1L)
      .as[(String, String, Option[Double])].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got.size === 6) // 3 diag + 3 upper
    assert(got(("x", "x")) === Some(1.0) && got(("y", "y")) === Some(1.0))
    // each pair must equal the single-pair operator bit-for-bit
    for ((a, b) <- Seq(("x", "y"), ("x", "k"), ("y", "k"))) {
      val single = Profiling.spearmanCorrelation(rows, a, b, "id",
          unitScale = 1L)
        .as[(Long, Option[Double])].collect().head._2
      assert(got((a, b)) === single, s"pair ($a, $b)")
    }
    // constant column: NULL against everything including itself
    val const = rows.withColumn("c", lit(5.0))
    val g2 = Profiling.spearmanMatrix(const, Seq("x", "c"), "id",
        unitScale = 1L)
      .as[(String, String, Option[Double])].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(g2(("c", "c")).isEmpty && g2(("x", "c")).isEmpty)
    // the one-shuffle melted form and the k-pass form are BIT-IDENTICAL
    // (same per-column (value, id) total order → same exact moments)
    val kPass = Profiling.spearmanMatrix(rows, Seq("x", "y", "k"), "id",
        unitScale = 1L, oneShuffle = false)
      .as[(String, String, Option[Double])].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(kPass === got)
  }

  test("spearmanMatrix: maxLevels gate fails loud on the level-cardinality " +
      "bound with the coarsen escape hatch; at the bound it runs") {
    import spark.implicits._
    // 3 columns × 4 all-distinct values = 12 (column, value) levels;
    // a maxLevels below that must abort BEFORE the level joins, naming
    // the knob and the unitScale escape (kendallTau's maxCells style)
    val rows = Seq((1L, 1.0, 10.0, 3.0), (2L, 2.0, 20.0, 1.0),
      (3L, 5.0, 30.0, 2.0), (4L, 3.0, 40.0, 7.0))
      .toDF("id", "x", "y", "k")
    val e = intercept[IllegalArgumentException] {
      Profiling.spearmanMatrix(rows, Seq("x", "y", "k"), "id",
        unitScale = 1L, maxLevels = 11L).collect()
    }
    assert(e.getMessage.contains("maxLevels") &&
      e.getMessage.contains("unitScale"))
    // exactly at the bound: runs, and output is unchanged
    assert(Profiling.spearmanMatrix(rows, Seq("x", "y", "k"), "id",
      unitScale = 1L, maxLevels = 12L).count() === 6)
  }

  test("cohensD: hand pooled-SD effect size; deterministic group order; " +
      "group-count and n>=2 guards") {
    import spark.implicits._
    // A = {1,2,3} (mean 2, (n−1)s² = 2), B = {2,4,6,8} (mean 5,
    // (n−1)s² = 20) → sp² = 22/5, d = −3/√4.4, g = d·(1 − 3/19)
    val rows = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 2.0), ("b", 4.0), ("b", 6.0), ("b", 8.0)).toDF("g", "v")
    val got = Profiling.cohensD(rows, "v", "g", unitScale = 1L)
      .as[(String, String, Long, Long, Double, Option[Double], Option[Double])]
      .collect().head
    def r6(x: Double): Double = math.rint(x * 1e6) / 1e6
    val d = (1.0 * 2 - 5) / math.sqrt((6.0 / 3 + 80.0 / 4) / 5.0)
    assert(got === (("a", "b", 3L, 4L, -3.0,
      Some(r6(d)), Some(r6(d * (1.0 - 3.0 / 19.0))))))
    // three groups fail loud; a 1-row group fails loud
    intercept[IllegalArgumentException] {
      Profiling.cohensD(rows.withColumn("g",
        when(col("v") > 5.0, "c").otherwise(col("g"))), "v", "g")
    }
    val tiny = Seq(("a", 1.0), ("b", 2.0), ("b", 3.0)).toDF("g", "v")
    val e = intercept[Exception] {
      Profiling.cohensD(tiny, "v", "g", unitScale = 1L).collect()
    }
    assert(e.getMessage.contains("n >= 2"))
  }

  test("theilSenSlope: hand pairwise-slope medians (odd, even, " +
      "weighted); outlier robustness vs OLS; guards") {
    import spark.implicits._
    // (1,1) (2,2) (3,10): slopes {1, 4.5, 8} -> median 4.5
    val odd = Seq((1.0, 1.0), (2.0, 2.0), (3.0, 10.0)).toDF("x", "y")
    val got = Profiling.theilSenSlope(odd, "x", "y", unitScale = 1L)
      .as[(Long, Long, Option[Double])].collect().head
    assert(got === ((3L, 3L, Some(4.5))))
    // even W with cell weights: x=1:{0,2}, x=2:{1,3} -> slopes
    // {-1, 1, 1, 3}, median = (1+1)/2 = 1
    val even = Seq((1.0, 0.0), (1.0, 2.0), (2.0, 1.0), (2.0, 3.0))
      .toDF("x", "y")
    val g2 = Profiling.theilSenSlope(even, "x", "y", unitScale = 1L)
      .as[(Long, Long, Option[Double])].collect().head
    assert(g2 === ((4L, 4L, Some(1.0))))
    // robustness: y = 2x with one wild outlier — the median ignores it
    // where OLS visibly cannot
    val outl = Seq((1.0, 2.0), (2.0, 4.0), (3.0, 6.0), (4.0, 8.0),
      (5.0, 1000.0)).toDF("x", "y")
    val g3 = Profiling.theilSenSlope(outl, "x", "y", unitScale = 1L)
      .as[(Long, Long, Option[Double])].collect().head
    assert(g3._3 === Some(2.0))
    val ols = Profiling.linearFit(outl, "x", "y", unitScale = 1L)
      .as[(Long, Option[Double], Option[Double], Option[Double])]
      .collect().head
    assert(ols._2.get > 100.0)
    // single x level: no pair has distinct x -> NULL slope, 0 pairs
    val vert = Seq((2.0, 1.0), (2.0, 5.0)).toDF("x", "y")
    val g4 = Profiling.theilSenSlope(vert, "x", "y", unitScale = 1L)
      .as[(Long, Long, Option[Double])].collect().head
    assert(g4 === ((2L, 0L, None)))
    val e = intercept[IllegalArgumentException] {
      Profiling.theilSenSlope(odd, "x", "y", unitScale = 1L, maxCells = 2L)
    }
    assert(e.getMessage.contains("maxCells"))
  }

  test("theilSenSlope: randomized parity sweep vs the brute-force " +
      "row-pair median") {
    import spark.implicits._
    // deterministic pseudo-random frames with heavy value ties (small
    // domains force multi-row cells, exercising the WEIGHTED median
    // path); reference = literal median over ALL row pairs with
    // distinct x, computed in plain Scala
    for ((n, xDom, yDom, seed) <- Seq((40, 5, 7, 11L), (60, 3, 4, 23L),
      (25, 8, 3, 37L), (50, 2, 9, 53L))) {
      val rows = (0 until n).map { i =>
        val h = (i * 2654435761L) ^ seed
        val x = (((h % xDom) + xDom) % xDom).toDouble
        val y = ((((h >> 13) % yDom) + yDom) % yDom).toDouble
        (x, y)
      }
      val slopes = (for {
        i <- rows.indices; j <- rows.indices.drop(i + 1)
        if rows(i)._1 != rows(j)._1
      } yield (rows(j)._2 - rows(i)._2) / (rows(j)._1 - rows(i)._1))
        .sorted
      val expect =
        if (slopes.isEmpty) None
        else {
          val w = slopes.length
          Some((slopes((w + 1) / 2 - 1) + slopes(w / 2 + 1 - 1)) / 2.0)
        }
      val got = Profiling.theilSenSlope(rows.toDF("x", "y"),
          "x", "y", unitScale = 1L)
        .as[(Long, Long, Option[Double])].collect().head
      assert(got._2 === slopes.length.toLong,
        s"pair count n=$n seed=$seed")
      assert(got._3 === expect, s"median n=$n seed=$seed")
    }
  }

  test("linearFit: exact hand fit on a perfect line; noisy R2 < 1; " +
      "vertical data NULL; unitScale cancels in the slope") {
    import spark.implicits._
    // y = 2x + 1 exactly: slope 2, intercept 1, R2 = 1
    val line = Seq((1.0, 3.0), (2.0, 5.0), (3.0, 7.0), (4.0, 9.0))
      .toDF("x", "y")
    val got = Profiling.linearFit(line, "x", "y", unitScale = 10L)
      .as[(Long, Option[Double], Option[Double], Option[Double])]
      .collect().head
    assert(got === ((4L, Some(2.0), Some(1.0), Some(1.0))))
    // same fit at a different quantization: slope/intercept/R2 agree
    val g2 = Profiling.linearFit(line, "x", "y", unitScale = 1000L)
      .as[(Long, Option[Double], Option[Double], Option[Double])]
      .collect().head
    assert(g2 === got)
    // off-line point drops R2 strictly below 1, slope stays finite
    val noisy = line.unionAll(Seq((5.0, 20.0)).toDF("x", "y"))
    val g3 = Profiling.linearFit(noisy, "x", "y", unitScale = 10L)
      .as[(Long, Option[Double], Option[Double], Option[Double])]
      .collect().head
    assert(g3._4.get < 1.0 && g3._4.get > 0.5 && g3._2.get > 2.0)
    // constant x: no OLS line exists
    val vert = Seq((2.0, 1.0), (2.0, 5.0)).toDF("x", "y")
    val g4 = Profiling.linearFit(vert, "x", "y", unitScale = 1L)
      .as[(Long, Option[Double], Option[Double], Option[Double])]
      .collect().head
    assert(g4 === ((2L, None, None, None)))
  }

  test("wilsonInterval: hand interval; degenerate p = 0/1 stays in " +
      "[0, 1] where Wald collapses") {
    import spark.implicits._
    val rows = Seq(("a", true), ("a", true), ("a", false), ("a", true),
      ("b", false), ("b", false)).toDF("g", "hit")
    val got = Profiling.wilsonInterval(rows, "hit", "g", z = 2.0)
      .as[(String, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    def r6(x: Double): Double = math.rint(x * 1e6) / 1e6
    // a: p = 3/4, z = 2: center = p + 4/(2·4), half = 2√(p(1−p)/4 +
    // 4/(4·16)), denom = 1 + 4/4 = 2 — mirror the operator's chain
    val p = 3.0 / 4.0
    val center = p + 4.0 / (2.0 * 4.0)
    val half = 2.0 * math.sqrt(p * (1.0 - p) / 4.0 + 4.0 / (4.0 * 4.0 * 4.0))
    assert(got("a") === (("a", 4L, 3L, 0.75,
      r6((center - half) / 2.0), r6((center + half) / 2.0))))
    // p = 0 group: lo must be exactly 0-adjacent-positive-bounded,
    // never negative (the Wald interval would be degenerate at 0)
    val b = got("b")
    assert(b._4 === 0.0 && b._5 >= 0.0 && b._6 > 0.0 && b._6 < 1.0)
  }

  test("friedmanTest: hand chi2 without and with ties; fully-tied NULL") {
    import spark.implicits._
    // two identical rows (1, 2, 3): R2 = (4, 8, 12) -> chi2 = 4, no ties
    val clean = Seq((1.0, 2.0, 3.0), (1.0, 2.0, 3.0)).toDF("a", "b", "c")
    val got = Profiling.friedmanTest(clean, Seq("a", "b", "c"),
        unitScale = 1L)
      .as[(Long, Int, Option[Double])].collect().head
    assert(got === ((2L, 2, Some(4.0))))
    // two rows (1, 1, 2): doubled ranks (3, 3, 6), tie term 6 per row
    // -> chi2 = 3, C = 1 - 12/48 = 0.75, corrected = 4
    val tied = Seq((1.0, 1.0, 2.0), (1.0, 1.0, 2.0)).toDF("a", "b", "c")
    val g2 = Profiling.friedmanTest(tied, Seq("a", "b", "c"),
        unitScale = 1L)
      .as[(Long, Int, Option[Double])].collect().head
    assert(g2 === ((2L, 2, Some(4.0))))
    // fully tied rows: correction factor 0 -> NULL chi2
    val flat = Seq((5.0, 5.0, 5.0), (5.0, 5.0, 5.0)).toDF("a", "b", "c")
    val g3 = Profiling.friedmanTest(flat, Seq("a", "b", "c"),
        unitScale = 1L)
      .as[(Long, Int, Option[Double])].collect().head
    assert(g3 === ((2L, 2, None)))
  }

  test("cliffsDelta: hand dominance counts; symmetric flip; maxCells guard") {
    import spark.implicits._
    // treated {1,2,2} vs control {2,3}: gt 0, lt 4 (ties drop) →
    // δ = −4/6
    val rows = Seq((true, 1.0), (true, 2.0), (true, 2.0),
      (false, 2.0), (false, 3.0)).toDF("tr", "v")
      .withColumn("grp", when(col("tr"), "t").otherwise("c"))
    val got = Profiling.cliffsDelta(rows, "grp", "t", "v", unitScale = 1L)
      .as[(Long, Long, Long, Long, Double)].collect().head
    assert(got === ((3L, 2L, 0L, 4L, -0.666667)))
    // swapping the roles negates delta exactly
    val flip = Profiling.cliffsDelta(rows, "grp", "c", "v", unitScale = 1L)
      .as[(Long, Long, Long, Long, Double)].collect().head
    assert(flip === ((2L, 3L, 4L, 0L, 0.666667)))
    // level-cardinality gate fails loud with the coarsen escape
    val e = intercept[IllegalArgumentException] {
      Profiling.cliffsDelta(rows, "grp", "t", "v", unitScale = 1L,
        maxCells = 3L).collect()
    }
    assert(e.getMessage.contains("maxCells") &&
      e.getMessage.contains("unitScale"))
  }

  test("prCurve: hand confusion sweep on the AUC fixture, one-class empty") {
    import spark.implicits._
    // pos {3, 2} vs neg {1, 2}: thresholds 3/2/1 give (tp, fp) =
    // (1,0) / (2,1) / (2,2)
    val rows = Seq((3.0, true), (2.0, true), (1.0, false), (2.0, false))
      .toDF("s", "y")
    val got = Profiling.prCurve(rows, "s", "y", unitScale = 1L)
      .orderBy("threshold")
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(got.toSeq === Seq(
      (1L, 2L, 2L, 0.5, 1.0),
      (2L, 2L, 1L, 2.0 / 3.0, 1.0),
      (3L, 1L, 0L, 1.0, 0.5)))
    assert(Profiling.prCurve(Seq((1.0, true)).toDF("s", "y"), "s", "y",
      unitScale = 1L).count() === 0)
  }

  test("liftTable: concentrated positives double the top-decile lift") {
    import spark.implicits._
    // scores 4,3,2,1; positives on the top two -> k=2: top bucket
    // lift = (2*4)/(2*2) = 2, bottom = 0; gains 1.0 then 1.0
    val rows = Seq((1L, 4.0, true), (2L, 3.0, true), (3L, 2.0, false),
      (4L, 1.0, false)).toDF("id", "s", "y")
    val got = Profiling.liftTable(rows, "s", "y", "id", k = 2,
        unitScale = 1L)
      .orderBy("decile")
      .as[(Int, Long, Long, Double, Double)].collect()
    assert(got.toSeq === Seq((1, 2L, 2L, 1.0, 2.0), (2, 2L, 0L, 1.0, 0.0)))
    // uniform positives -> lift exactly 1 everywhere
    val uni = Seq((1L, 4.0, true), (2L, 3.0, false), (3L, 2.0, true),
      (4L, 1.0, false)).toDF("id", "s", "y")
    val u = Profiling.liftTable(uni, "s", "y", "id", k = 2,
        unitScale = 1L)
      .orderBy("decile")
      .as[(Int, Long, Long, Double, Double)].collect()
    assert(u.map(_._5).toSeq === Seq(1.0, 1.0))
  }

  test("brierScore: exact quantized MSE, perfect zero, out-of-range raise") {
    import spark.implicits._
    // residuals 0 and -0.5 -> (0 + 0.25)/2 = 0.125 exactly
    val rows = Seq((1.0, true), (0.5, true)).toDF("p", "y")
    val got = Profiling.brierScore(rows, "p", "y")
      .as[(Long, Double)].collect().head
    assert(got === ((2L, 0.125)))
    val perfect = Seq((1.0, true), (0.0, false)).toDF("p", "y")
    assert(Profiling.brierScore(perfect, "p", "y")
      .as[(Long, Double)].collect().head._2 === 0.0)
    val ex = intercept[Exception] {
      Profiling.brierScore(Seq((-0.1, true)).toDF("p", "y"), "p", "y")
        .collect()
    }
    assert(ex.getMessage.contains("outside [0, 1]"))
  }

  test("conformalThreshold: exact order-statistic index, tie-invariant, guards") {
    import spark.implicits._
    // n=9, alpha=0.1: k = 10 - floor(10*0.1) = 9 -> 9th smallest = 9.0
    val nine = (1 to 9).map(i => (i.toLong, i.toDouble)).toDF("id", "s")
    val r = Profiling.conformalThreshold(nine, "s", "id", alpha = 0.1,
        unitScale = 1L)
      .as[(Long, Long, Double)].collect().head
    assert(r === ((9L, 9L, 9.0)))
    // n=19, alpha=0.2: k = 20 - 4 = 16 -> value 16
    val nineteen = (1 to 19).map(i => (i.toLong, i.toDouble)).toDF("id", "s")
    assert(Profiling.conformalThreshold(nineteen, "s", "id", alpha = 0.2,
        unitScale = 1L)
      .as[(Long, Long, Double)].collect().head === ((19L, 16L, 16.0)))
    // ties: the VALUE at position k is tie-invariant
    val tied = Seq((1L, 1.0), (2L, 5.0), (3L, 5.0), (4L, 5.0), (5L, 1.0),
      (6L, 1.0), (7L, 5.0), (8L, 5.0), (9L, 5.0)).toDF("id", "s")
    assert(Profiling.conformalThreshold(tied, "s", "id", alpha = 0.1,
        unitScale = 1L)
      .as[(Long, Long, Double)].collect().head._3 === 5.0)
    // alpha too small for n -> fail loud, never a silent empty
    val ex = intercept[IllegalArgumentException] {
      Profiling.conformalThreshold(nine, "s", "id", alpha = 0.05,
        unitScale = 1L).collect()
    }
    assert(ex.getMessage.contains("unattainable"))
  }

  test("conformalThresholdByGroup: per-group k, undersized group NULL") {
    import spark.implicits._
    // group a: n=9, alpha=0.1 -> k=9 -> qhat = 9; group b: n=3 ->
    // k = 4 - floor(0.4) = 4 > 3 -> guarantee unattainable -> NULL,
    // but the group row is PRESENT
    val rows = ((1 to 9).map(i => ("a", i.toDouble)) ++
      (1 to 3).map(i => ("b", i.toDouble))).toDF("g", "s")
    val got = Profiling.conformalThresholdByGroup(rows, "s", "g",
        alpha = 0.1, unitScale = 1L)
      .as[(String, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("a") === ((9L, 9L, Some(9.0))))
    assert(got("b") === ((3L, 4L, None)))
    // matches the global operator on a single-group frame
    val g = Profiling.conformalThreshold(
      rows.filter(col("g") === "a").withColumn("id",
        monotonically_increasing_id()), "s", "id", alpha = 0.1,
      unitScale = 1L).as[(Long, Long, Double)].collect().head
    assert((got("a")._1, got("a")._2, got("a")._3.get) === g)
  }

  test("benjaminiHochberg: hand step-up, id tiebreak, boundary reject") {
    val hyp = Seq((1L, 0.01), (2L, 0.02), (3L, 0.03), (4L, 0.5),
      (5L, 1.0)).toDF("id", "p")
    val got = Profiling.benjaminiHochberg(hyp, "id", "p", 0.05)
      .as[(Long, Double, Long, Long, Double, Boolean)]
      .collect().sortBy(_._1)
    // stepped = (.05, .05, .05, .625, 1.0); suffix-min leaves them
    assert(got.map(_._5).toSeq === Seq(0.05, 0.05, 0.05, 0.625, 1.0))
    // reject compares the UNROUNDED padj: .05 <= .05 is a reject
    assert(got.map(_._6).toSeq ===
      Seq(true, true, true, false, false))
    assert(got.map(_._3).toSeq === Seq(1L, 2L, 3L, 4L, 5L))
    assert(got.forall(_._4 == 5L))
    // equal p: the rank (and so the adjusted values) tiebreak by id
    val tied = Seq((2L, 0.5), (1L, 0.5)).toDF("id", "p")
    val t2 = Profiling.benjaminiHochberg(tied, "id", "p", 0.05)
      .as[(Long, Double, Long, Long, Double, Boolean)]
      .collect().sortBy(_._1)
    assert(t2.map(r => (r._1, r._3, r._5)).toSeq ===
      Seq((1L, 1L, 0.5), (2L, 2L, 0.5)))
    // a monotone-violating sequence: the suffix-min repairs it
    val mono = Seq((1L, 0.04), (2L, 0.9), (3L, 0.05)).toDF("id", "p")
    val m3 = Profiling.benjaminiHochberg(mono, "id", "p", 0.1)
      .as[(Long, Double, Long, Long, Double, Boolean)]
      .collect().sortBy(_._1)
    // ranks: .04->1, .05->2, .9->3; stepped .12, .075, .9;
    // suffix-min: rank1 = min(.12,.075,.9) = .075
    assert(m3.find(_._1 == 1L).get._5 === 0.075)
  }

  test("storeyQValues: pi0 from the flat tail scales BH; clip at 1") {
    val hyp = Seq((1L, 0.01), (2L, 0.02), (3L, 0.03), (4L, 0.5),
      (5L, 1.0)).toDF("id", "p")
    // tail {p > 0.5} = 1 -> pi0 = 1/(0.5·5) = 0.4; q = 0.4·BH padj
    val got = Profiling.storeyQValues(hyp, "id", "p", 0.5)
      .as[(Long, Double, Long, Long, Double, Double)]
      .collect().sortBy(_._1)
    assert(got.forall(_._5 == 0.4))
    assert(got.map(_._6).toSeq === Seq(0.02, 0.02, 0.02, 0.25, 0.4))
    // every p above lambda: pi0 clips at 1 and Storey degrades to BH
    val flat = Seq((1L, 0.6), (2L, 0.7)).toDF("id", "p")
    val f = Profiling.storeyQValues(flat, "id", "p", 0.5)
      .as[(Long, Double, Long, Long, Double, Double)]
      .collect().sortBy(_._1)
    assert(f.forall(_._5 == 1.0))
    assert(f.map(_._6).toSeq === Seq(0.7, 0.7))
    intercept[IllegalArgumentException] {
      Profiling.storeyQValues(hyp, "id", "p", 1.0)
    }
  }

  test("benjaminiHochberg: randomized parity vs a direct reference " +
      "implementation") {
    val rnd = new scala.util.Random(4242)
    for (trial <- 1 to 3) {
      val n = 50 + rnd.nextInt(150)
      val ps = (1 to n).map(i =>
        (i.toLong, math.rint(rnd.nextDouble() * 1000) / 1000.0))
      // reference: sort by (p, id), stepped m*p/rank, suffix min, clip
      val sorted = ps.sortBy { case (id, p) => (p, id) }
      val stepped = sorted.zipWithIndex.map { case ((_, p), i) =>
        p * n / (i + 1).toDouble
      }
      val suffixMin = stepped.scanRight(Double.MaxValue)(math.min)
        .init.map(math.min(_, 1.0))
      val expect = sorted.map(_._1).zip(suffixMin).toMap
      val got = Profiling.benjaminiHochberg(
        ps.toDF("id", "p"), "id", "p", 0.05)
        .as[(Long, Double, Long, Long, Double, Boolean)].collect()
      assert(got.length === n, s"trial $trial")
      got.foreach { r =>
        val e = BigDecimal(expect(r._1))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(r._5 === e, s"trial $trial id ${r._1}")
        assert(r._6 === (expect(r._1) <= 0.05), s"trial $trial reject")
      }
    }
  }

  test("inclusionCoverage: anti-join miss count, cross-type cast") {
    val child = Seq(Some(1), Some(2), Some(3), Some(3), None).toDF("k")
    val parent = Seq(1L, 2L, 4L).toDF("pk")
    val got = Profiling.inclusionCoverage(child, "k", parent, "pk")
      .as[(Long, Long, Double, Boolean)].collect().head
    assert(got === ((3L, 1L,
      BigDecimal(1.0 - 1.0 / 3.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, false)))
    val full = Profiling.inclusionCoverage(
      Seq(1, 2).toDF("k"), "k", parent, "pk")
      .as[(Long, Long, Double, Boolean)].collect().head
    assert(full === ((2L, 0L, 1.0, true)))
  }

  test("permutationTestMeanDiff: bit-match vs an in-JVM md5 replay") {
    val rows = Seq((1L, 10.0, "a"), (2L, 2.0, "b"), (3L, 7.5, "a"),
      (4L, 1.0, "b"), (5L, 3.25, "b"), (6L, 9.0, "a"))
    val df = rows.toDF("id", "v", "g")
    val reps = 25
    val got = Profiling.permutationTestMeanDiff(df, "id", "v", "g", "a",
      reps = reps, unitScale = 100L)
      .as[(Long, Long, Int, Double, Long, Double)].collect().head
    // replay the exact integer test on the driver
    val u = rows.map { case (id, v, g) =>
      (id, math.round(v * 100), g == "a")
    }
    val nA = u.count(_._3).toLong
    val nB = u.size - nA
    val sTot = u.map(_._2).sum
    val saObs = u.filter(_._3).map(_._2).sum
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def stat(sa: Long): BigInt =
      (BigInt(sa) * nB - BigInt(sTot - sa) * nA).abs
    val nGe = (0 until reps).count { b =>
      val sa = u.map { case (id, uu, _) => (md5hex(s"$id:$b"), id, uu) }
        .sortBy(t => (t._1, t._2)).take(nA.toInt).map(_._3).sum
      stat(sa) >= stat(saObs)
    }
    assert(got._1 === nA && got._2 === nB && got._3 === reps)
    assert(got._5 === nGe.toLong)
    assert(got._6 === BigDecimal((1.0 + nGe) / (reps + 1))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // all-equal values: every permutation ties the observed statistic,
    // so p = 1 exactly
    val flat = Seq((1L, 5.0, "a"), (2L, 5.0, "b"), (3L, 5.0, "a"),
      (4L, 5.0, "b")).toDF("id", "v", "g")
    val p1 = Profiling.permutationTestMeanDiff(flat, "id", "v", "g", "a",
      reps = 7).as[(Long, Long, Int, Double, Long, Double)].collect().head
    assert(p1._4 === 0.0 && p1._5 === 7L && p1._6 === 1.0)
  }

  test("permutationTestMeanDiff: empty arm fails loud (absent and " +
      "universal groupA)") {
    val df = Seq((1L, 1.0, "a"), (2L, 2.0, "a")).toDF("id", "v", "g")
    // groupA matches nothing -> arm A empty
    val e1 = intercept[Exception] {
      Profiling.permutationTestMeanDiff(df, "id", "v", "g", "zz")
        .collect()
    }
    assert(e1.getMessage.contains("non-empty"), e1.getMessage)
    // groupA matches everything -> arm B empty
    val e2 = intercept[Exception] {
      Profiling.permutationTestMeanDiff(df, "id", "v", "g", "a")
        .collect()
    }
    assert(e2.getMessage.contains("non-empty"), e2.getMessage)
  }

  test("benjaminiHochberg / storeyQValues: NULL p fails loud (a " +
      "submitted hypothesis without a result must not shrink m)") {
    val withNull = Seq((1L, Some(0.01)), (2L, None), (3L, Some(0.5)))
      .toDF("id", "p")
    val e1 = intercept[Exception] {
      Profiling.benjaminiHochberg(withNull, "id", "p").collect()
    }
    assert(e1.getMessage.contains("NULL p-value"), e1.getMessage)
    val e2 = intercept[Exception] {
      Profiling.storeyQValues(withNull, "id", "p").collect()
    }
    assert(e2.getMessage.contains("NULL p-value"), e2.getMessage)
  }

  test("storeyQValues: pi0 floors at 1/m when no p exceeds lambda " +
      "(a zero pi0 would drive every q-value to 0)") {
    val allSmall = Seq((1L, 0.1), (2L, 0.2)).toDF("id", "p")
    val got = Profiling.storeyQValues(allSmall, "id", "p", 0.5)
      .as[(Long, Double, Long, Long, Double, Double)]
      .collect().sortBy(_._1)
    assert(got.forall(_._5 == 0.5)) // 1/m, not 0
    // q = suffix-min of pi0·m·p/rank = (0.5·2·0.1/1, 0.5·2·0.2/2)
    assert(got.map(_._6).toSeq === Seq(0.1, 0.1))
  }
}
