package graft.operators

import org.apache.spark.sql.functions.{col, lit}

import graft.SparkSpec

/** Time-series prep: hand-built grids with forward fill, bucket
  * latest-wins selection, the runaway-span guard, and rolling z-scores
  * against hand-computed closed-form stats. */
class TimeSeriesSpec extends SparkSpec {

  import spark.implicits._

  test("resampleFill: grid spans per key, gaps forward-fill, latest wins") {
    val obs = Seq(
      // key 1, step 10: buckets 0 (two obs — latest by (ts,id) wins),
      // gap at 1-2, obs at 3
      (1L, 1L, 2L, 10.0), (2L, 1L, 8L, 20.0),
      (3L, 1L, 31L, 30.0),
      // key 2: single bucket
      (4L, 2L, 5L, 99.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val got = TimeSeries.resampleFill(obs, "user_id", "ts", "event_id",
        "value", stepNs = 10L)
      .as[(Long, Long, Double, Boolean)].collect().toSet
    assert(got === Set(
      (1L, 0L, 20.0, false), // latest of the two bucket-0 obs
      (1L, 1L, 20.0, true),  // carried forward
      (1L, 2L, 20.0, true),
      (1L, 3L, 30.0, false),
      (2L, 0L, 99.0, false)))
  }

  test("resampleFill: equal-ts observations tie-break on larger id") {
    val obs = Seq((1L, 1L, 5L, 1.0), (2L, 1L, 5L, 2.0))
      .toDF("event_id", "user_id", "ts", "value")
    val got = TimeSeries.resampleFill(obs, "user_id", "ts", "event_id",
        "value", stepNs = 10L)
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    assert(got === Seq((1L, 0L, 2.0, false)))
  }

  test("resampleFill: runaway span fails loud, not a quadrillion-row grid") {
    val obs = Seq((1L, 1L, 0L, 1.0), (2L, 1L, 1000L, 2.0))
      .toDF("event_id", "user_id", "ts", "value")
    val e = intercept[Exception] {
      TimeSeries.resampleFill(obs, "user_id", "ts", "event_id", "value",
        stepNs = 1L, maxBucketsPerKey = 100L).collect()
    }
    assert(e.getMessage != null)
    // the healthy key still resamples when under the cap
    val ok = TimeSeries.resampleFill(obs, "user_id", "ts", "event_id",
      "value", stepNs = 1L, maxBucketsPerKey = 2000L)
    assert(ok.count() === 1001L)
  }

  test("rollingZScore: hand-computed out-of-sample score") {
    // key 1 ordered: 10, 20, 30, 40, then x=100 scored against the
    // first four: mean 25, var = (1000+...)... closed form:
    // s1=100, s2=3000, n=4 → var = (3000 - 2500)/3 = 166.666...,
    // sd = 12.9099...; z = (100-25)/12.9099 = 5.8095
    val obs = Seq(
      (1L, 1L, 1L, 10.0), (2L, 1L, 2L, 20.0), (3L, 1L, 3L, 30.0),
      (4L, 1L, 4L, 40.0), (5L, 1L, 5L, 100.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val got = TimeSeries.rollingZScore(obs, "user_id", "ts", "event_id",
        "value", lookback = 10, threshold = 3.0, minObs = 4)
      .as[(Long, Long, Long, Double, Option[Double], Boolean)]
      .collect().sortBy(_._3)
    // first four rows: fewer than minObs preceding → null z, no flag
    assert(got.take(4).forall(r => r._5.isEmpty && !r._6))
    val last = got.last
    assert(last._5 === Some(5.8095))
    assert(last._6)
  }

  test("timeWeightedAverage: step-held integral, hand-computed") {
    // key 1: v=10 held 10ns, v=20 held 30ns, v=50 bounds the span →
    // twa = (10·10 + 20·30) / 40 = 700/40 = 17.5; key 2: single obs →
    // null twa; key 3: two simultaneous obs → zero span → null
    val obs = Seq(
      (1L, 1L, 0L, 10.0), (2L, 1L, 10L, 20.0), (3L, 1L, 40L, 50.0),
      (4L, 2L, 5L, 99.0),
      (5L, 3L, 7L, 1.0), (6L, 3L, 7L, 2.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val got = TimeSeries.timeWeightedAverage(obs, "user_id", "ts",
        "event_id", "value")
      .as[(Long, Option[Double], Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, Some(17.5), 40L, 3L)))
    assert(got(2L) === ((2L, None, 0L, 1L)))
    assert(got(3L) === ((3L, None, 0L, 2L)))
  }

  test("rollingZScore: zero-variance window yields null score") {
    val obs = Seq(
      (1L, 1L, 1L, 7.0), (2L, 1L, 2L, 7.0), (3L, 1L, 3L, 7.0),
      (4L, 1L, 4L, 9.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val got = TimeSeries.rollingZScore(obs, "user_id", "ts", "event_id",
        "value", lookback = 5, threshold = 1.0, minObs = 2)
      .as[(Long, Long, Long, Double, Option[Double], Boolean)]
      .collect().sortBy(_._3)
    // row 4 sees three constant 7s: variance exactly 0 → null, no flag
    assert(got.last._5.isEmpty && !got.last._6)
    // row 3 sees (7, 7): also constant → null
    assert(got(2)._5.isEmpty)
    intercept[IllegalArgumentException] {
      TimeSeries.rollingZScore(obs, "user_id", "ts", "event_id", "value",
        lookback = 1)
    }
  }

  test("ewmaSmooth: exact weighted means, adapting to short prefixes") {
    val obs = Seq(
      (1L, 1L, 1L, 1.0), (2L, 1L, 2L, 2.0), (3L, 1L, 3L, 4.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val got = TimeSeries.ewmaSmooth(obs, "user_id", "ts", "event_id",
        "value", lookback = 8, decayNum = 1L, decayDen = 2L,
        unitScale = 100L)
      .as[(Long, Long, Long, Double, Double)].collect().sortBy(_._2)
    // weights 2^(7−lag): row 1 sees only itself → its own value
    assert(got(0)._5 === 1.0)
    // row 2: (200·128 + 100·64) / ((128+64)·100) = 32000/19200 = 5/3
    assert(got(1)._5 === 32000.0 / 19200.0)
    // row 3: (400·128 + 200·64 + 100·32) / ((128+64+32)·100) = 3.0
    assert(got(2)._5 === 3.0)
    intercept[IllegalArgumentException] {
      TimeSeries.ewmaSmooth(obs, "user_id", "ts", "event_id", "value",
        lookback = 1)
    }
    intercept[IllegalArgumentException] { // decay must shrink
      TimeSeries.ewmaSmooth(obs, "user_id", "ts", "event_id", "value",
        decayNum = 2L, decayDen = 2L)
    }
    intercept[IllegalArgumentException] { // 3^31 blows the long bound
      TimeSeries.ewmaSmooth(obs, "user_id", "ts", "event_id", "value",
        lookback = 32, decayNum = 1L, decayDen = 3L)
    }
  }

  test("meanShiftChangepoints: exact trigger at the level shift, full windows only") {
    val obs = (1 to 8).map { i =>
      (i.toLong, 1L, i.toLong, if (i <= 4) 10.0 else 50.0)
    }.toDF("event_id", "user_id", "ts", "value")
    val got = TimeSeries.meanShiftChangepoints(obs, "user_id", "ts",
        "event_id", "value", window = 4, minShiftUnits = 1000L,
        unitScale = 100L)
      .as[(Long, Long, Long, Double, Double, Double)].collect()
    // only ts=5 has FULL windows on both sides of the shift
    assert(got.map(_._2).toSeq === Seq(5L))
    assert(got.head._4 === 10.0 && got.head._5 === 50.0 &&
      got.head._6 === 40.0)
    // threshold is inclusive and exact: |Σpost − Σpre| = 16000 = 4000·4
    val edge = TimeSeries.meanShiftChangepoints(obs, "user_id", "ts",
      "event_id", "value", window = 4, minShiftUnits = 4000L)
    assert(edge.count() === 1L)
    val over = TimeSeries.meanShiftChangepoints(obs, "user_id", "ts",
      "event_id", "value", window = 4, minShiftUnits = 4001L)
    assert(over.count() === 0L)
    // a flat series never triggers
    val flat = (1 to 10).map(i => (i.toLong, 2L, i.toLong, 7.0))
      .toDF("event_id", "user_id", "ts", "value")
    assert(TimeSeries.meanShiftChangepoints(flat, "user_id", "ts",
      "event_id", "value", window = 3, minShiftUnits = 1L).count() === 0L)
  }

  test("seasonalDecompose: exact odd/even trend, periodic residual zero, guard") {
    import spark.implicits._
    // pure period-3 signal → interior trend is the flat mean, the
    // seasonal indexes recover the pattern EXACTLY, residual == 0.0
    val per = (0 to 8).map(i => ("a", i.toLong, Seq(2.0, 5.0, 8.0)(i % 3)))
      .toDF("k", "t", "v")
    val got3 = TimeSeries.seasonalDecompose(per, "k", "t", "v",
        period = 3, unitScale = 1L)
      .orderBy("ts")
      .as[(String, Long, Long, Double, Option[Double], Option[Double],
        Option[Double])].collect()
    assert(got3.length === 9)
    // edges: no full centered window → trend & residual null
    assert(got3.head._5.isEmpty && got3.last._5.isEmpty)
    assert(got3(4)._5 === Some(5.0)) // (2+5+8)/3
    assert(got3(3)._6 === Some(-3.0) && got3(4)._6 === Some(0.0) &&
      got3(5)._6 === Some(3.0))
    assert(got3.filter(_._5.isDefined).forall(_._7 === Some(0.0)))
    // even period: 2×MA half-weight endpoints, hand value at ts=2:
    // t2 = 2*(1+2+3+4+5) − 1 − 5 = 24 → trend 24/8 = 3.0
    val lin = (0 to 4).map(i => ("a", i.toLong, (i + 1).toDouble))
      .toDF("k", "t", "v")
    val got4 = TimeSeries.seasonalDecompose(lin, "k", "t", "v",
        period = 4, unitScale = 1L)
      .filter(org.apache.spark.sql.functions.col("trend").isNotNull)
      .as[(String, Long, Long, Double, Option[Double], Option[Double],
        Option[Double])].collect()
    assert(got4.map(r => (r._2, r._5.get)).toSeq === Seq((2L, 3.0)))
    // a gapped series fails loud instead of silently mixing phases
    val gap = Seq(("a", 0L, 1.0), ("a", 1L, 2.0), ("a", 3L, 3.0))
      .toDF("k", "t", "v")
    val e = intercept[Exception] {
      TimeSeries.seasonalDecompose(gap, "k", "t", "v", period = 2)
        .collect()
    }
    assert(e.getMessage.contains("not a regular unit-step series"))
    intercept[IllegalArgumentException] {
      TimeSeries.seasonalDecompose(per, "k", "t", "v", period = 1)
    }
  }

  test("autocorrelation: hand r_k on a linear series; gaps shrink " +
      "n_pairs; constant series NULL; guards") {
    import spark.implicits._
    // u = t over t = 1..5: r1 = 4/10, r2 = -1/10 (full-series mean 3)
    val s = (1 to 5).map(t => (t.toLong, t.toDouble)).toDF("t", "v")
    val got = TimeSeries.autocorrelation(s, "t", "v", maxLag = 2,
        unitScale = 1L)
      .as[(Int, Long, Option[Double])].collect().toSeq
    assert(got === Seq((1, 4L, Some(0.4)), (2, 3L, Some(-0.1))))
    // a missing bucket only shrinks the lag's pair count
    val gap = s.filter(org.apache.spark.sql.functions.col("t") =!= 3L)
    val g2 = TimeSeries.autocorrelation(gap, "t", "v", maxLag = 1,
        unitScale = 1L)
      .as[(Int, Long, Option[Double])].collect().head
    assert(g2._2 === 2L) // pairs (1,2) and (4,5) only
    // constant series: zero variance -> NULL r
    val const = (1 to 4).map(t => (t.toLong, 7.0)).toDF("t", "v")
    val g3 = TimeSeries.autocorrelation(const, "t", "v", maxLag = 1,
        unitScale = 1L)
      .as[(Int, Long, Option[Double])].collect().head
    assert(g3 === ((1, 3L, None)))
    intercept[IllegalArgumentException] {
      TimeSeries.autocorrelation(s, "t", "v", maxLag = 0)
    }
  }

  test("ljungBox: hand Q from the published rounded r_k; NULL lags " +
      "drop from df_used") {
    import spark.implicits._
    // same linear series: r1 = 0.4, r2 = -0.1 (rounded = exact here);
    // Q = n(n+2) * (r1^2/(n-1) + r2^2/(n-2)) = 5*7*(0.16/4 + 0.01/3)
    val s = (1 to 5).map(t => (t.toLong, t.toDouble)).toDF("t", "v")
    val got = TimeSeries.ljungBox(s, "t", "v", maxLag = 2, unitScale = 1L)
      .as[(Long, Int, Long, Option[Double])].collect().head
    def r4(x: Double): Double = math.rint(x * 1e4) / 1e4
    val expected = r4(35.0 * (0.4 * 0.4 / 4.0 + (-0.1) * (-0.1) / 3.0))
    assert(got === ((5L, 2, 2L, Some(expected))))
    // a constant series: every r NULL -> df_used 0, NULL q
    val const = (1 to 4).map(t => (t.toLong, 7.0)).toDF("t", "v")
    val g2 = TimeSeries.ljungBox(const, "t", "v", maxLag = 2,
        unitScale = 1L)
      .as[(Long, Int, Long, Option[Double])].collect().head
    assert(g2 === ((4L, 2, 0L, None)))
  }

  test("crossCorrelation: exact r = 1 at the true lead; bounds; " +
      "constant series NULL") {
    import spark.implicits._
    // y_t = 2·x_{t-1}: x leads y by ONE bucket, so the peak is at
    // lag +1 — and because the pair sets there are the FULL series,
    // centering is exact and r = 1 exactly
    val rows = Seq(
      (1L, Some(1.0), Option.empty[Double]),
      (2L, Some(2.0), Some(2.0)),
      (3L, Some(3.0), Some(4.0)),
      (4L, Some(4.0), Some(6.0)),
      (5L, Option.empty[Double], Some(8.0)))
      .toDF("t", "x", "y")
    val got = TimeSeries.crossCorrelation(rows, "t", "x", "y",
      maxLag = 2, unitScale = 1L)
      .as[(Int, Long, Option[Double])].collect().sortBy(_._1)
    val byLag = got.map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.map(_._1).toSeq === Seq(-2, -1, 0, 1, 2))
    assert(byLag(1) === ((4L, Some(1.0))))
    // every other lag correlates strictly less
    assert(byLag.filter(_._1 != 1).values.forall(v =>
      v._2.forall(_ < 1.0)))
    // pair counts shrink at the edges
    assert(byLag(2)._1 === 3L && byLag(-2)._1 === 1L)
    // a constant series has zero variance -> NULL r everywhere
    val const = rows.withColumn("y",
      org.apache.spark.sql.functions.lit(5.0))
    val c = TimeSeries.crossCorrelation(const, "t", "x", "y", 1, 1L)
      .as[(Int, Long, Option[Double])].collect()
    assert(c.forall(_._3.isEmpty))
    // ccf(x, x) at lag 0 is plain Pearson of the series with itself
    val self = TimeSeries.crossCorrelation(rows, "t", "x", "x", 1, 1L)
      .as[(Int, Long, Option[Double])].collect()
      .find(_._1 == 0).get
    assert(self === ((0, 4L, Some(1.0))))
  }

  test("pettittTest: randomized parity vs a brute average-rank U " +
      "reference with ties") {
    import spark.implicits._
    val rnd = new scala.util.Random(2468)
    for (trial <- 1 to 4) {
      val n = 10 + rnd.nextInt(60)
      val vals = (1 to n).map(_ => rnd.nextInt(6).toDouble)
      val df = vals.zipWithIndex
        .map { case (v, i) => (i.toLong + 1L, v) }.toDF("ts", "v")
        .withColumn("id", col("ts"))
      // brute reference: average ranks with ties, U_t loop, earliest K
      val sorted = vals.sorted
      def avgRank(v: Double): Double = {
        val lo = sorted.indexWhere(_ == v) + 1
        val hi = sorted.lastIndexWhere(_ == v) + 1
        (lo + hi) / 2.0
      }
      var cum = 0.0; var bestK = -1.0; var bestT = -1
      vals.zipWithIndex.foreach { case (v, i) =>
        cum += avgRank(v)
        val u = math.abs(2.0 * cum - (i + 1).toDouble * (n + 1))
        if (u > bestK) { bestK = u; bestT = i + 1 }
      }
      val nD = n.toDouble
      val pRef = math.min(1.0, 2.0 * math.exp(-6.0 * bestK * bestK /
        (nD * nD * nD + nD * nD)))
      val got = TimeSeries.pettittTest(df, "ts", "id", "v", 1L)
        .as[(Long, Long, Long, Double)].collect().head
      assert(got._1 === n.toLong, s"trial $trial")
      assert(got._2.toDouble === bestK, s"trial $trial k")
      assert(got._3 === bestT.toLong, s"trial $trial t")
      assert(math.abs(got._4 - pRef) < 2e-6, s"trial $trial p")
    }
  }

  test("grangerLag1: randomized parity vs an independent normal-" +
      "equations reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(9753)
    for (trial <- 1 to 4) {
      val n = 15 + rnd.nextInt(50)
      // integral values: unitScale = 1 quantization is then exact on
      // both sides (the reference works on the same integers)
      val xs = (0 to n).map(_ => rnd.nextInt(40).toDouble)
      val ys = (0 to n).map(i =>
        (if (i == 0) 0.0
         else math.round(0.7 * xs(i - 1)).toDouble) + rnd.nextInt(10))
      val df = (1 to n).map(i => (i.toLong, xs(i), ys(i)))
        .toDF("ts", "x", "y").withColumn("id", col("ts"))
      // reference: explicit residual-sum computation from directly
      // fitted coefficients (different algebra than the operator's
      // centered-moment Cramer chains)
      val comp = (2 to n).map(i => (ys(i), ys(i - 1), xs(i - 1)))
      val m = comp.size.toDouble
      def mean(f: ((Double, Double, Double)) => Double) =
        comp.map(f).sum / m
      val (my, m1, m2) = (mean(_._1), mean(_._2), mean(_._3))
      val c11 = comp.map(t => (t._2 - m1) * (t._2 - m1)).sum
      val c22 = comp.map(t => (t._3 - m2) * (t._3 - m2)).sum
      val c12 = comp.map(t => (t._2 - m1) * (t._3 - m2)).sum
      val c1y = comp.map(t => (t._2 - m1) * (t._1 - my)).sum
      val c2y = comp.map(t => (t._3 - m2) * (t._1 - my)).sum
      val det = c11 * c22 - c12 * c12
      // restricted: beta = c1y/c11; residual sum directly
      val bR = c1y / c11
      val rssR = comp.map(t =>
        math.pow((t._1 - my) - bR * (t._2 - m1), 2)).sum
      // full: solve the 2x2 by substitution and sum residuals directly
      val b2 = (c2y - c12 * c1y / c11) / (c22 - c12 * c12 / c11)
      val b1 = (c1y - c12 * b2) / c11
      val rssF = comp.map(t =>
        math.pow((t._1 - my) - b1 * (t._2 - m1) - b2 * (t._3 - m2), 2))
        .sum
      val fRef = (rssR - rssF) / (rssF / (m - 3.0))
      val got = TimeSeries.grangerLag1(df, "ts", "id", "x", "y", 1L)
        .as[(Long, Int, Long, Option[Double], Option[Double],
          Option[Double])].collect().head
      assert(got._1 === comp.size.toLong, s"trial $trial")
      if (det > 1e-9) {
        assert(math.abs(got._4.get - rssR) < 1e-4 * (1.0 + rssR),
          s"trial $trial rssR ${got._4} vs $rssR")
        assert(math.abs(got._5.get - rssF) < 1e-4 * (1.0 + rssF),
          s"trial $trial rssF ${got._5} vs $rssF")
        assert(math.abs(got._6.get - fRef) < 1e-3 * (1.0 + fRef),
          s"trial $trial f ${got._6} vs $fRef")
      }
    }
  }

  test("grangerLag1: chain-replica exact value; lead-lag series scores " +
      "the true direction; degenerate designs NULL; maxRows guard") {
    import spark.implicits._
    // pseudo-random driver series; y follows x with one step of lag
    // plus a parity wobble (breaks the perfect fit)
    val xs = (0 until 40).map(i => ((i * 2654435761L) % 97).toDouble)
    val rows = (1 until 40).map { i =>
      (i.toLong, xs(i), xs(i - 1) + (i % 2).toDouble)
    }.toDF("ts", "x", "y").withColumn("id", col("ts"))
    val fwd = TimeSeries.grangerLag1(rows, "ts", "id", "x", "y",
      unitScale = 1L)
      .as[(Long, Int, Long, Option[Double], Option[Double],
        Option[Double])].collect().head
    val rev = TimeSeries.grangerLag1(rows, "ts", "id", "y", "x",
      unitScale = 1L)
      .as[(Long, Int, Long, Option[Double], Option[Double],
        Option[Double])].collect().head
    assert(fwd._6.isDefined && rev._6.isDefined)
    assert(fwd._6.get > 10.0 * rev._6.get, s"fwd $fwd rev $rev")
    // exact replica of the closed-form chains on the complete rows
    val comp = (2 until 40).map { i =>
      (xs(i - 1) + (i % 2).toDouble, // uy
        xs(i - 1 - 1) + ((i - 1) % 2).toDouble, // y1
        xs(i - 1)) // x1
    }
    val n = comp.size.toDouble
    def s(f: ((Double, Double, Double)) => Double) = comp.map(f).sum
    val (sy, syy) = (s(_._1), s(t => t._1 * t._1))
    val (s1, s11) = (s(_._2), s(t => t._2 * t._2))
    val (s2, s22) = (s(_._3), s(t => t._3 * t._3))
    val (sy1, sy2, s12) =
      (s(t => t._1 * t._2), s(t => t._1 * t._3), s(t => t._2 * t._3))
    val (cyy, c11, c22) =
      (syy - sy * sy / n, s11 - s1 * s1 / n, s22 - s2 * s2 / n)
    val (c1y, c2y, c12) =
      (sy1 - s1 * sy / n, sy2 - s2 * sy / n, s12 - s1 * s2 / n)
    val det = c11 * c22 - c12 * c12
    val rssR = cyy - c1y * c1y / c11
    val rssF = cyy -
      (c22 * c1y * c1y - 2.0 * c12 * c1y * c2y + c11 * c2y * c2y) / det
    val f = (rssR - rssF) / (rssF / (n - 3.0))
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(fwd._1 === 38L && fwd._2 === 1 && fwd._3 === 35L)
    assert(fwd._6 === Some(r4(f)))
    // moment sums here are exact small integers, so the replica's
    // double chains ARE the operator's chains — rss values too
    assert(fwd._4 === Some(r4(rssR)) && fwd._5 === Some(r4(rssF)))
    // constant x lag: det = 0 -> NULL rss_f and f
    val cx = (1 to 10).map(i => (i.toLong, 5.0, xs(i))).toDF("ts", "x", "y")
      .withColumn("id", col("ts"))
    val gc = TimeSeries.grangerLag1(cx, "ts", "id", "x", "y", 1L)
      .as[(Long, Int, Long, Option[Double], Option[Double],
        Option[Double])].collect().head
    assert(gc._5 === None && gc._6 === None)
    intercept[IllegalArgumentException] {
      TimeSeries.grangerLag1(rows, "ts", "id", "x", "y", 1L, maxRows = 3L)
    }
  }

  test("grangerTest: p = 1 agrees with the closed-form grangerLag1; " +
      "p = 2 scores the true lead-lag direction; guards") {
    import spark.implicits._
    // y follows x with one step of lag plus a period-3 wobble. NOT
    // period-2: a parity wobble is LINEAR in the lag-2 design
    // (t%2 = 1 − y_{t−1} + x_{t−2}), making the full model a perfect
    // fit — rss_f = 0 and F rightly NULL; %3 cycles aren't affine in
    // the lags, so the fit is near-perfect but finite
    val xs = (0 until 40).map(i => ((i * 2654435761L) % 97).toDouble)
    val rows = (1 until 40).map { i =>
      (i.toLong, xs(i), xs(i - 1) + (i % 3).toDouble)
    }.toDF("ts", "x", "y").withColumn("id", col("ts"))
    val closed = TimeSeries.grangerLag1(rows, "ts", "id", "x", "y", 1L)
      .as[(Long, Int, Long, Option[Double], Option[Double],
        Option[Double])].collect().head
    val general = TimeSeries.grangerTest(rows, "ts", "id", "x", "y",
      p = 1, unitScale = 1L).as[(Long, Int, Long, Option[Double], Option[Double],
        Option[Double])].collect().head
    // same n/dfs; the raw-moment elimination and the centered Cramer
    // closed form are algebraically identical — at 4dp they agree
    assert(general._1 === closed._1 && general._2 === closed._2 &&
      general._3 === closed._3)
    assert(math.abs(general._4.get - closed._4.get) <= 2e-4, s"$general")
    assert(math.abs(general._5.get - closed._5.get) <= 2e-4)
    assert(math.abs(general._6.get - closed._6.get) <= 1e-3 *
      (1.0 + closed._6.get))
    // p = 2: past x still predicts y far better than past y predicts x
    val fwd2 = TimeSeries.grangerTest(rows, "ts", "id", "x", "y",
      p = 2, unitScale = 1L).as[(Long, Int, Long, Option[Double], Option[Double],
        Option[Double])].collect().head
    val rev2 = TimeSeries.grangerTest(rows, "ts", "id", "y", "x",
      p = 2, unitScale = 1L).as[(Long, Int, Long, Option[Double], Option[Double],
        Option[Double])].collect().head
    assert(fwd2._1 === 37L && fwd2._2 === 2 && fwd2._3 === 32L)
    assert(fwd2._6.isDefined && rev2._6.isDefined)
    assert(fwd2._6.get > 10.0 * rev2._6.get, s"fwd $fwd2 rev $rev2")
    // the full model can only lower RSS vs the restricted one
    assert(fwd2._5.get <= fwd2._4.get)
    // constant x lags: a vanishing pivot -> non-finite -> NULL full fit
    val cx = (1 to 12).map(i => (i.toLong, 5.0, xs(i))).toDF("ts", "x", "y")
      .withColumn("id", col("ts"))
    val gc = TimeSeries.grangerTest(cx, "ts", "id", "x", "y", p = 2,
      unitScale = 1L).as[(Long, Int, Long, Option[Double], Option[Double],
        Option[Double])].collect().head
    assert(gc._5 === None && gc._6 === None)
    intercept[IllegalArgumentException] {
      TimeSeries.grangerTest(rows, "ts", "id", "x", "y", p = 0)
    }
    intercept[IllegalArgumentException] {
      TimeSeries.grangerTest(rows, "ts", "id", "x", "y", p = 9)
    }
    intercept[IllegalArgumentException] {
      TimeSeries.grangerTest(rows, "ts", "id", "x", "y", p = 2,
        maxRows = 3L)
    }
  }

  test("cusumDetect: closed form equals the max(0,...) recursion " +
      "hand-stepped; alarm at the threshold crossing; guards") {
    import spark.implicits._
    // u = 10,0,10,10,0 with target 4, slack 1: d+ = u-5 -> S+ =
    // 5,0,5,10,5 (hand recursion); d- = 3-u -> S- = 0,3,0,0,3
    val rows = Seq((1L, 10.0), (2L, 0.0), (3L, 10.0), (4L, 10.0),
      (5L, 0.0)).toDF("ts", "v").withColumn("id", col("ts"))
    val got = TimeSeries.cusumDetect(rows, "ts", "id", "v",
      target = 4.0, slack = 1.0, threshold = 9.0, unitScale = 1L)
      .as[(Long, Long, Double, Double, Double, Boolean)]
      .collect().sortBy(_._1)
    assert(got.map(_._4).toSeq === Seq(5.0, 0.0, 5.0, 10.0, 5.0))
    assert(got.map(_._5).toSeq === Seq(0.0, 3.0, 0.0, 0.0, 3.0))
    // only t=4 crosses: S+ = 10 > 9
    assert(got.map(_._6).toSeq === Seq(false, false, false, true, false))
    // downward drift alarms on the negative side
    val down = Seq((1L, 0.0), (2L, 0.0), (3L, 0.0)).toDF("ts", "v")
      .withColumn("id", col("ts"))
    val gd = TimeSeries.cusumDetect(down, "ts", "id", "v", 4.0, 1.0,
      5.0, 1L).as[(Long, Long, Double, Double, Double, Boolean)]
      .collect().sortBy(_._1)
    assert(gd.map(_._5).toSeq === Seq(3.0, 6.0, 9.0))
    assert(gd.map(_._6).toSeq === Seq(false, true, true))
    intercept[IllegalArgumentException] {
      TimeSeries.cusumDetect(rows, "ts", "id", "v", 4.0, -1.0, 9.0, 1L)
    }
    intercept[IllegalArgumentException] {
      TimeSeries.cusumDetect(rows, "ts", "id", "v", 4.0, 1.0, 9.0, 1L,
        maxRows = 2L)
    }
    intercept[IllegalArgumentException] { // threshold under the grid
      TimeSeries.cusumDetect(rows, "ts", "id", "v", 4.0, 1.0, 0.4, 1L)
    }
  }

  test("grangerTest: randomized p = 2 parity vs an independent " +
      "partial-pivot solve with explicit residual loops") {
    import spark.implicits._
    val rnd = new scala.util.Random(13337)
    // independent reference: Gaussian elimination WITH partial
    // pivoting (different pivot order than the operator's fixed
    // pivots) + residuals summed row-by-row (different factorization
    // than RSS = y'y - b'X'y)
    def lstsqRss(xs: Array[Array[Double]], ys: Array[Double]): Double = {
      val d = xs.head.length
      val a = Array.ofDim[Double](d, d + 1)
      for (r <- xs.indices; i <- 0 until d) {
        for (j <- 0 until d) a(i)(j) += xs(r)(i) * xs(r)(j)
        a(i)(d) += xs(r)(i) * ys(r)
      }
      for (k <- 0 until d - 1) {
        val p = (k until d).maxBy(i => math.abs(a(i)(k)))
        val t = a(k); a(k) = a(p); a(p) = t
        for (i <- k + 1 until d) {
          val f = a(i)(k) / a(k)(k)
          for (j <- k until d + 1) a(i)(j) -= f * a(k)(j)
        }
      }
      val b = new Array[Double](d)
      for (i <- d - 1 to 0 by -1) {
        var acc = a(i)(d)
        for (j <- i + 1 until d) acc -= a(i)(j) * b(j)
        b(i) = acc / a(i)(i)
      }
      xs.indices.map { r =>
        val e = ys(r) - (0 until d).map(j => b(j) * xs(r)(j)).sum
        e * e
      }.sum
    }
    for (trial <- 1 to 3) {
      val n = 40 + rnd.nextInt(40)
      val x = (0 until n).map(_ => rnd.nextInt(30).toDouble)
      val y = (0 until n).map(i =>
        (if (i >= 1) 0.6 * x(i - 1) else 0.0).floor +
          rnd.nextInt(8).toDouble)
      val df = (0 until n).map(i => (i.toLong, x(i), y(i)))
        .toDF("ts", "x", "y").withColumn("id", col("ts"))
      val comp = (2 until n).toArray
      val xr = comp.map(i => Array(1.0, y(i - 1), y(i - 2)))
      val xf = comp.map(i =>
        Array(1.0, y(i - 1), y(i - 2), x(i - 1), x(i - 2)))
      val yv = comp.map(i => y(i))
      val rssR = lstsqRss(xr, yv)
      val rssF = lstsqRss(xf, yv)
      val m = comp.length
      val fRef = ((rssR - rssF) / 2.0) / (rssF / (m - 5.0))
      val got = TimeSeries.grangerTest(df, "ts", "id", "x", "y", p = 2,
        unitScale = 1L)
        .as[(Long, Int, Long, Option[Double], Option[Double],
          Option[Double])].collect().head
      assert(got._1 === m.toLong, s"trial $trial n")
      assert(math.abs(got._4.get - rssR) < 1e-4 * (1.0 + rssR),
        s"trial $trial rssR ${got._4} vs $rssR")
      assert(math.abs(got._5.get - rssF) < 1e-4 * (1.0 + rssF),
        s"trial $trial rssF ${got._5} vs $rssF")
      assert(math.abs(got._6.get - fRef) < 1e-3 * (1.0 + math.abs(fRef)),
        s"trial $trial f ${got._6} vs $fRef")
    }
  }

  test("pettittTest: hand U fold with ties, earliest argmax, one-chain " +
      "p; maxRows guard") {
    import spark.implicits._
    // 1,1,1,5,5,5 at ts 1..6 — tied levels take doubled average ranks
    // (r2 = 4 for the 1s, 10 for the 5s); U_t = ΣR2 − t(n+1):
    // (−3, −6, −9, −6, −3, 0) → K = 9 at t = 3 (the true changepoint)
    val rows = Seq((1L, 1.0), (2L, 1.0), (3L, 1.0),
      (4L, 5.0), (5L, 5.0), (6L, 5.0)).toDF("ts", "v")
      .withColumn("id", col("ts"))
    val got = TimeSeries.pettittTest(rows, "ts", "id", "v",
      unitScale = 1L)
      .as[(Long, Long, Long, Double)].collect().head
    val n = 6.0
    val pExpect = math.min(1.0, 2.0 * math.exp(-6.0 * 9.0 * 9.0 /
      (n * n * n + n * n)))
    assert(got._1 === 6L && got._2 === 9L && got._3 === 3L)
    assert(got._4 === math.rint(pExpect * 1e6) / 1e6)
    // a constant series: every rank level ties, U_t = 0 everywhere ->
    // K = 0, p clips at 1, earliest t reported
    val flat = Seq((1L, 2.0), (2L, 2.0), (3L, 2.0)).toDF("ts", "v")
      .withColumn("id", col("ts"))
    val gf = TimeSeries.pettittTest(flat, "ts", "id", "v", 1L)
      .as[(Long, Long, Long, Double)].collect().head
    assert(gf === ((3L, 0L, 1L, 1.0)))
    // symmetric to reversal: K invariant when the series flips
    val rev = rows.select((lit(7L) - col("ts")).as("ts"),
      col("id"), col("v"))
    val gr = TimeSeries.pettittTest(rev, "ts", "id", "v", 1L)
      .as[(Long, Long, Long, Double)].collect().head
    assert(gr._2 === 9L && gr._4 === got._4)
    val e = intercept[IllegalArgumentException] {
      TimeSeries.pettittTest(rows, "ts", "id", "v", 1L, maxRows = 3L)
    }
    assert(e.getMessage.contains("maxRows"))
  }
}
