package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Event analytics: hand-traced retention cells, attribution credits
  * (including the tie-break and direct-channel conventions), Markov
  * transitions, and SCD-2 interval construction. */
class EventsSpec extends SparkSpec {

  import spark.implicits._

  test("cohortRetention: hand-counted cells, offset 0 = cohort size") {
    // bucket width 10: u1 first at bucket 0, active 0,1,3;
    // u2 first at bucket 1, active 1,3; u3 first at bucket 0, active 0
    val ev = Seq(
      (1L, 1L), (1L, 5L), (1L, 12L), (1L, 30L),
      (2L, 11L), (2L, 39L),
      (3L, 9L)
    ).toDF("user_id", "ts")
    val got = Events.cohortRetention(ev, "user_id", "ts", bucketNs = 10L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set(
      (0L, 0L, 2L), // u1, u3 at their own cohort bucket
      (0L, 1L, 1L), // u1 back one bucket later
      (0L, 3L, 1L), // u1 at offset 3
      (1L, 0L, 1L), // u2's cohort
      (1L, 2L, 1L)  // u2 at offset 2 (bucket 3)
    ))
  }

  test("cohortRetention: duplicate activity in a bucket counts once") {
    val ev = Seq((1L, 1L), (1L, 2L), (1L, 3L)).toDF("user_id", "ts")
    val got = Events.cohortRetention(ev, "user_id", "ts", bucketNs = 10L)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((0L, 0L, 1L)))
    intercept[IllegalArgumentException] {
      Events.cohortRetention(ev, "user_id", "ts", bucketNs = 0L)
    }
  }

  test("lastTouchAttribution: latest in-window touch wins, ties by id") {
    val ev = Seq(
      // u1: click@8 then view@9 → purchase@10 credits view (later ts)
      (1L, 1L, "click", 8L, 0.0), (2L, 1L, "view", 9L, 0.0),
      (3L, 1L, "purchase", 10L, 5.0),
      // u2: two touches at the SAME ts → larger event id wins (view)
      (4L, 2L, "click", 9L, 0.0), (5L, 2L, "view", 9L, 0.0),
      (6L, 2L, "purchase", 10L, 7.0),
      // u3: only touch is OUTSIDE the window (10 - 8 = 2 > windowNs
      // would be inside; use ts 1 → outside) → direct
      (7L, 3L, "view", 1L, 0.0), (8L, 3L, "purchase", 10L, 11.0),
      // u4: touch AFTER the conversion never counts → direct
      (9L, 4L, "purchase", 10L, 13.0), (10L, 4L, "view", 11L, 0.0)
    ).toDF("event_id", "user_id", "event_type", "ts", "value")
    val got = Events.lastTouchAttribution(ev, "user_id", "event_type",
        "ts", "event_id", "value", "purchase", Seq("view", "click"),
        windowNs = 5L)
      .as[(String, Long, Double)].collect().toSet
    assert(got === Set(("view", 2L, 12.0), ("(direct)", 2L, 24.0)))
    intercept[IllegalArgumentException] {
      Events.lastTouchAttribution(ev, "user_id", "event_type", "ts",
        "event_id", "value", "purchase", Seq("purchase"), 5L)
    }
  }

  test("lastTouchAttribution: touch at the conversion instant counts") {
    val ev = Seq(
      (1L, 1L, "view", 10L, 0.0), (2L, 1L, "purchase", 10L, 3.0)
    ).toDF("event_id", "user_id", "event_type", "ts", "value")
    val got = Events.lastTouchAttribution(ev, "user_id", "event_type",
        "ts", "event_id", "value", "purchase", Seq("view"), 5L)
      .as[(String, Long, Double)].collect().toSet
    assert(got === Set(("view", 1L, 3.0)))
  }

  test("transitionMatrix: hand-counted pairs, (ts, id) order, exact probs") {
    val ev = Seq(
      // u1 ordered by (ts, id): a(1) b(2) a(3,id1) b(3,id2) → ab, ba, ab
      (1L, 1L, "a", 1L), (2L, 1L, "b", 2L),
      (3L, 1L, "a", 3L), (4L, 1L, "b", 3L),
      // u2: single event → no transition
      (5L, 2L, "a", 1L)
    ).toDF("event_id", "user_id", "event_type", "ts")
    // id 3 and 4 share ts=3: id order decides a-then-b
    val got = Events.transitionMatrix(ev, "user_id", "event_type",
        "ts", "event_id")
      .as[(String, String, Long, Double)].collect().toSet
    assert(got === Set(("a", "b", 2L, 1.0), ("b", "a", 1L, 1.0)))
  }

  test("scd2Intervals: no-op updates skipped, intervals chain, current flagged") {
    val ch = Seq(
      (1L, 1L, 10L, "bronze"), (2L, 1L, 20L, "bronze"), // no-op at 20
      (3L, 1L, 30L, "silver"), (4L, 1L, 40L, "gold"),
      (5L, 2L, 10L, "bronze")
    ).toDF("event_id", "user_id", "ts", "tier")
    val got = Events.scd2Intervals(ch, "user_id", "ts", "event_id", "tier")
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSet
    assert(got === Set(
      (1L, "bronze", 10L, Some(30L), false),
      (1L, "silver", 30L, Some(40L), false),
      (1L, "gold", 40L, None, true),
      (2L, "bronze", 10L, None, true)))
  }

  test("scd2Intervals: null attrs — leading null opens nothing, null→value → version") {
    val ch = Seq(
      (1L, 1L, 10L, None), (2L, 1L, 20L, Some("a")),
      (3L, 1L, 30L, None), (4L, 1L, 40L, None)
    ).toDF("event_id", "user_id", "ts", "tier")
    val got = Events.scd2Intervals(ch, "user_id", "ts", "event_id", "tier")
      .as[(Long, Option[String], Long, Option[Long], Boolean)]
      .collect().toSet
    // leading null dropped; a opens at 20; value→null at 30 is a change
    // (null-safe); the second null at 40 is a no-op
    assert(got === Set(
      (1L, Some("a"), 20L, Some(30L), false),
      (1L, None, 30L, None, true)))
  }

  test("sessionPaths: gap splits sessions, ordered paths, top-k ties") {
    val ev = Seq(
      // u1: a@0, b@10 same session; c@1000 opens a new one (gap 100)
      (1L, 1L, "a", 0L), (2L, 1L, "b", 10L), (3L, 1L, "c", 1000L),
      // u2: one session "a>b"
      (4L, 2L, "a", 0L), (5L, 2L, "b", 5L)
    ).toDF("event_id", "user_id", "event_type", "ts")
    val got = Events.sessionPaths(ev, "user_id", "event_type", "ts",
        "event_id", gapNs = 100L, k = 5)
      .as[(String, Long)].collect().toSeq
    assert(got === Seq(("a>b", 2L), ("c", 1L)))
    // simultaneous events order by id inside the path
    val tie = Seq((2L, 1L, "x", 0L), (1L, 1L, "y", 0L))
      .toDF("event_id", "user_id", "event_type", "ts")
    val p = Events.sessionPaths(tie, "user_id", "event_type", "ts",
        "event_id", 100L, 5).as[(String, Long)].collect()
    assert(p.toSeq === Seq(("y>x", 1L)))
  }

  test("rfmSegments: hand metrics; ntile scores deterministic under ties") {
    val ev = Seq(
      // corpus max ts = 100 (u3's signup)
      (1L, 1L, "purchase", 10L, 5.0), (2L, 1L, "purchase", 90L, 5.0),
      (3L, 2L, "purchase", 50L, 20.0),
      (4L, 3L, "signup", 100L, 0.0)
    ).toDF("event_id", "user_id", "event_type", "ts", "value")
    val got = Events.rfmSegments(ev, "user_id", "event_type", "ts",
        "value", "purchase", nTiles = 2)
      .as[(Long, Long, Long, Double, Int, Int, Int)].collect()
      .map(r => r._1 -> r).toMap
    // u1: r=100-90=10, f=2, m=10; u2: r=50, f=1, m=20; u3 absent
    assert(got(1L) === ((1L, 10L, 2L, 10.0, 2, 2, 1)))
    assert(got(2L) === ((2L, 50L, 1L, 20.0, 1, 1, 2)))
    assert(!got.contains(3L))
  }

  test("intervalCoverage: islands merge, gaps measured, degenerates drop") {
    val iv = Seq(
      (1L, 0L, 10L), (1L, 5L, 20L), (1L, 30L, 40L), // two islands, gap 10
      (2L, 0L, 5L),                                  // single island
      (3L, 7L, 7L), (3L, 1L, 2L)                     // zero-length dropped
    ).toDF("user_id", "s", "e")
    val got = Events.intervalCoverage(iv, "user_id", "s", "e")
      .as[(Long, Long, Long, Double, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, 30L, 40L, 0.75, 2L, 10L)))
    assert(got(2L) === ((2L, 5L, 5L, 1.0, 1L, 0L)))
    assert(got(3L) === ((3L, 1L, 1L, 1.0, 1L, 0L)))
    // contained interval never opens an island
    val contained = Seq((1L, 0L, 100L), (1L, 10L, 20L), (1L, 50L, 120L))
      .toDF("user_id", "s", "e")
    val c = Events.intervalCoverage(contained, "user_id", "s", "e")
      .as[(Long, Long, Long, Double, Long, Long)].head()
    assert(c === ((1L, 120L, 120L, 1.0, 1L, 0L)))
  }

  test("paretoReport: hand-computed head share and concentration") {
    // 10 users: one whale (100) + nine 1s; top 20% (2 keys) hold 101/109
    val rows = (1L to 10L).map(u =>
      (u, u, "p", 1L, if (u == 1L) 100.0 else 1.0))
    val df = rows.toDF("event_id", "user_id", "event_type", "ts", "value")
    val got = Events.paretoReport(df, "user_id", "value", fraction = 0.2)
      .as[(Long, Long, Double, Double)].head()
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got === ((10L, 2L, r4(101.0 / 109), r4(101.0 / 109 / 0.2))))
    intercept[IllegalArgumentException] {
      Events.paretoReport(df, "user_id", "value", fraction = 1.5)
    }
  }

  test("paretoReport: FP knife-edge n·fraction stays at exact ceil") {
    // 70 · 0.1 = 7.000000000000001 in binary FP — double-based ceil
    // gave 8; the exact rational cutoff must report ⌈0.1·70⌉ = 7
    val rows = (1L to 70L).map(u => (u, u, "p", 1L, u.toDouble))
    val df = rows.toDF("event_id", "user_id", "event_type", "ts", "value")
    val got = Events.paretoReport(df, "user_id", "value", fraction = 0.1)
      .as[(Long, Long, Double, Double)].head()
    assert(got._1 === 70L)
    assert(got._2 === 7L)
    // head = top 7 values 64..70 = 469 of total 2485
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got._3 === r4(469.0 / 2485))
    // a fraction not expressible in 6 decimal places is rejected, not
    // silently quantized to a different report
    intercept[IllegalArgumentException] {
      Events.paretoReport(df, "user_id", "value", fraction = 1.0 / 3)
    }
  }

  test("rfmSegments: distributed tiles match the ntile window form") {
    // 300 users with heavily tied frequencies/values (the shape that
    // makes a value-bucketed chunking collapse) — the scale-safe
    // Ranking tiles must reproduce ntile-over-(metric, user) exactly
    val rows = (1 to 900).map { i =>
      val u = (i % 300) + 1L
      (i.toLong, u, "purchase", (i * 37 % 500).toLong, (u % 7).toDouble)
    }
    val ev = rows.toDF("event_id", "user_id", "event_type", "ts", "value")
    val got = Events.rfmSegments(ev, "user_id", "event_type", "ts",
        "value", "purchase", nTiles = 5)
      .as[(Long, Long, Long, Double, Int, Int, Int)].collect().toSet
    val maxTs = rows.map(_._4).max
    val m = ev.groupBy("user_id")
      .agg((lit(maxTs) - max("ts")).as("r_ns"),
        count(lit(1)).as("f"), round(sum("value"), 2).as("m"))
    val expected = m
      .withColumn("r_score", ntile(5).over(
        Window.orderBy(col("r_ns").desc, col("user_id"))))
      .withColumn("f_score", ntile(5).over(
        Window.orderBy(col("f").asc, col("user_id"))))
      .withColumn("m_score", ntile(5).over(
        Window.orderBy(col("m").asc, col("user_id"))))
      .as[(Long, Long, Long, Double, Int, Int, Int)].collect().toSet
    assert(got === expected)
  }

  test("rfmSegments: empty / all-null-ts frame fails with a clear message") {
    val empty = Seq.empty[(Long, Long, String, Long, Double)]
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    val ex = intercept[IllegalArgumentException] {
      Events.rfmSegments(empty, "user_id", "event_type", "ts",
        "value", "purchase")
    }
    assert(ex.getMessage.contains("non-null timestamp"))
  }

  test("sequentialPatterns: hand trigram counts, user support, tie order") {
    import spark.implicits._
    // u1: a b c b c (trigrams abc, bcb, cbc); u2: a b c (abc).
    // abc: 2 occurrences across 2 users; others: 1 occurrence, 1 user.
    val ev = Seq(
      ("u1", "a", 1L, 1L), ("u1", "b", 2L, 2L), ("u1", "c", 3L, 3L),
      ("u1", "b", 4L, 4L), ("u1", "c", 5L, 5L),
      ("u2", "a", 10L, 6L), ("u2", "b", 11L, 7L), ("u2", "c", 12L, 8L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val got = Events.sequentialPatterns(ev, "user_id", "event_type",
        "ts", "event_id", k = 3, minSupport = 1L)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map("a>b>c" -> ((2L, 2L)), "b>c>b" -> ((1L, 1L)),
      "c>b>c" -> ((1L, 1L))))
    // minSupport on USERS (not occurrences) keeps only the shared flow
    val sup = Events.sequentialPatterns(ev, "user_id", "event_type",
        "ts", "event_id", k = 3, minSupport = 2L)
      .as[(String, Long, Long)].collect()
    assert(sup.toSeq === Seq(("a>b>c", 2L, 2L)))
    // timestamp tie broken by event id: (b id=2) before (c id=3)
    val tie = Seq(("u", "a", 1L, 1L), ("u", "b", 2L, 2L),
      ("u", "c", 2L, 3L)).toDF("user_id", "event_type", "ts", "event_id")
    val t = Events.sequentialPatterns(tie, "user_id", "event_type",
        "ts", "event_id", k = 3, minSupport = 1L)
      .as[(String, Long, Long)].collect()
    assert(t.toSeq === Seq(("a>b>c", 1L, 1L)))
  }

  test("kaplanMeier: hand product-limit curve with censoring; d = n step " +
      "hits exactly 0 without ln(0); censor-only times absent") {
    // durations/events: (1,e) (2,c) (3,e) (3,e) (4,c) (5,e) — the
    // textbook fixture: S(1) = 5/6, S(3) = 5/6 · 1/2 = 5/12, S(5) = 0
    // (the last at-risk subject dies: d = n routes the zero flag)
    val rows = Seq((1L, true), (2L, false), (3L, true), (3L, true),
      (4L, false), (5L, true)).toDF("dur", "ev")
    val got = Events.kaplanMeier(rows, "dur", "ev")
      .as[(Long, Long, Long, Double)].collect()
      .sortBy(_._1).toSeq
    def r6(x: Double): Double = math.rint(x * 1e6) / 1e6
    assert(got === Seq(
      (1L, 6L, 1L, r6(math.exp(math.log(1.0 - 1.0 / 6.0)))),
      (3L, 4L, 2L, r6(math.exp(math.log(1.0 - 1.0 / 6.0) +
        math.log(1.0 - 2.0 / 4.0)))),
      (5L, 1L, 1L, 0.0)))
    // censor time 2 and 4 emit no step row
    assert(!got.exists(r => r._1 == 2L || r._1 == 4L))
  }

  test("kaplanMeierCI: hand Greenwood variance on the KM fixture; " +
      "NULL se/CI at the d = n zero level; clipping") {
    // same fixture as kaplanMeier: S(1) = 5/6, S(3) = 5/12, S(5) = 0
    val rows = Seq((1L, true), (2L, false), (3L, true), (3L, true),
      (4L, false), (5L, true)).toDF("dur", "ev")
    def r6(x: Double): Double = math.rint(x * 1e6) / 1e6
    val got = Events.kaplanMeierCI(rows, "dur", "ev")
      .as[(Long, Long, Long, Double, Option[Double], Option[Double],
        Option[Double])].collect().sortBy(_._1)
    // t=1: gw = 1/(6·5); t=3: gw += 2/(4·2)
    val s1 = math.exp(math.log(1.0 - 1.0 / 6.0))
    val se1 = s1 * math.sqrt(1.0 / 30.0)
    val s3 = math.exp(math.log(1.0 - 1.0 / 6.0) + math.log(1.0 - 2.0 / 4.0))
    val se3 = s3 * math.sqrt(1.0 / 30.0 + 2.0 / (4.0 * 2.0))
    assert(got(0) === ((1L, 6L, 1L, r6(s1), Some(r6(se1)),
      Some(r6(math.max(0.0, s1 - 1.96 * se1))),
      Some(r6(math.min(1.0, s1 + 1.96 * se1))))))
    assert(got(1) === ((3L, 4L, 2L, r6(s3), Some(r6(se3)),
      Some(r6(math.max(0.0, s3 - 1.96 * se3))),
      Some(r6(math.min(1.0, s3 + 1.96 * se3))))))
    // the d = n level: survival pins to 0, Greenwood undefined -> NULLs
    assert(got(2) === ((5L, 1L, 1L, 0.0, None, None, None)))
    // survival values bit-match the plain kaplanMeier on every row
    val km = Events.kaplanMeier(rows, "dur", "ev")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(got.map(r => (r._1, r._2, r._3, r._4)).toSeq === km.toSeq)
  }

  test("restrictedMeanSurvival: exact step-curve area; tau inside and " +
      "past the last event; all-censored = tau exactly") {
    val rows = Seq((1L, true), (2L, false), (3L, true), (3L, true),
      (4L, false), (5L, true)).toDF("dur", "ev")
    def r6(x: Double): Double = math.rint(x * 1e6) / 1e6
    // tau=4: 1·(1−0) + (5/6)·(3−1) + (5/12)·(4−3) = 37/12
    val g4 = Events.restrictedMeanSurvival(rows, "dur", "ev", tau = 4L)
      .as[(Long, Long, Option[Double])].collect().head
    assert(g4._1 === 4L && g4._2 === 6L)
    assert(g4._3 === Some(r6(37.0 / 12.0)))
    // tau=10 passes the last event (S hits 0 at t=5; tail adds 0)
    val g10 = Events.restrictedMeanSurvival(rows, "dur", "ev", tau = 10L)
      .as[(Long, Long, Option[Double])].collect().head
    assert(g10._3 === Some(3.5))
    // all censored: S = 1 through the horizon -> RMST = tau exactly
    val cens = Seq((2L, false), (9L, false)).toDF("dur", "ev")
    val gc = Events.restrictedMeanSurvival(cens, "dur", "ev", tau = 7L)
      .as[(Long, Long, Option[Double])].collect().head
    assert(gc === ((7L, 2L, Some(7.0))))
    intercept[IllegalArgumentException] {
      Events.restrictedMeanSurvival(rows, "dur", "ev", tau = 0L)
    }
  }

  test("kaplanMeierCI + restrictedMeanSurvival: randomized parity vs " +
      "a direct product-limit reference") {
    val rnd = new scala.util.Random(8642)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    for (trial <- 1 to 4) {
      val n = 20 + rnd.nextInt(60)
      val subj = (1 to n).map(_ =>
        (1L + rnd.nextInt(15).toLong, rnd.nextBoolean()))
      val df = subj.toDF("dur", "ev")
      // direct reference walk over ascending distinct durations
      val byT = subj.groupBy(_._1).map { case (t, xs) =>
        (t, xs.count(_._2).toLong, xs.size.toLong)
      }.toSeq.sortBy(_._1)
      var atRisk = n.toLong; var lnS = 0.0; var gw = 0.0; var zero = false
      val refKm = scala.collection.mutable.Map
        .empty[Long, (Long, Long, Double, Option[Double])]
      val steps = scala.collection.mutable.ListBuffer.empty[(Long, Double)]
      for ((t, d, all) <- byT) {
        if (d == atRisk) zero = true
        else {
          lnS += math.log(1.0 - d.toDouble / atRisk.toDouble)
          gw += d.toDouble /
            (atRisk.toDouble * (atRisk - d).toDouble)
        }
        if (d > 0) {
          val s = if (zero) 0.0 else math.exp(lnS)
          refKm(t) = (atRisk, d, s,
            if (zero) None else Some(math.exp(lnS) * math.sqrt(gw)))
          steps += ((t, s))
        }
        atRisk -= all
      }
      val got = Events.kaplanMeierCI(df, "dur", "ev")
        .as[(Long, Long, Long, Double, Option[Double], Option[Double],
          Option[Double])].collect()
      assert(got.length === refKm.size, s"trial $trial")
      got.foreach { r =>
        val (nr, d, s, se) = refKm(r._1)
        assert(r._2 === nr && r._3 === d, s"trial $trial t=${r._1}")
        assert(math.abs(r._4 - r6(s)) < 2e-6, s"trial $trial survival")
        (r._5, se) match {
          case (Some(g), Some(e)) =>
            assert(math.abs(g - e) < 2e-6, s"trial $trial se")
            assert(math.abs(r._6.get -
              math.max(0.0, s - 1.96 * e)) < 4e-6, s"trial $trial lo")
            assert(math.abs(r._7.get -
              math.min(1.0, s + 1.96 * e)) < 4e-6, s"trial $trial hi")
          case (None, None) => // zero level
          case other => fail(s"trial $trial se mismatch: $other")
        }
      }
      // RMST at a random horizon: step-curve integral from the walk
      val tau = 1L + rnd.nextInt(20).toLong
      val inH = steps.filter(_._1 <= tau).toList
      val refRmst = {
        var acc = 0.0; var prevT = 0L; var prevS = 1.0
        inH.foreach { case (t, s) =>
          acc += prevS * (t - prevT); prevT = t; prevS = s
        }
        acc + prevS * (tau - prevT)
      }
      val gr = Events.restrictedMeanSurvival(df, "dur", "ev", tau)
        .as[(Long, Long, Option[Double])].collect().head
      assert(gr._1 === tau && gr._2 === n.toLong)
      assert(math.abs(gr._3.get - refRmst) < 2e-6,
        s"trial $trial rmst ${gr._3} vs $refRmst")
    }
  }

  test("survival trio: the shared maxLevels gate trips on a high-" +
      "cardinality duration column and passes at the bound") {
    // 50 distinct durations — a stand-in for the continuous /
    // ns-resolution column that would make the level frame row-sized
    // and push the whole dataset through ONE window task
    val hi = (1L to 50L).map(t => (t, t % 2 == 0)).toDF("dur", "ev")
    val e1 = intercept[IllegalArgumentException] {
      Events.kaplanMeier(hi, "dur", "ev", maxLevels = 10L).collect()
    }
    assert(e1.getMessage.contains("maxLevels") &&
      e1.getMessage.contains("quantize"))
    val hiG = hi.withColumn("grp",
      when(col("dur") % 2 === 0, "a").otherwise("b"))
    val e2 = intercept[IllegalArgumentException] {
      Events.logRankTest(hiG, "dur", "ev", "grp", "a", maxLevels = 10L)
        .collect()
    }
    assert(e2.getMessage.contains("logRankTest"))
    val e3 = intercept[IllegalArgumentException] {
      Events.nelsonAalen(hi, "dur", "ev", maxLevels = 10L).collect()
    }
    assert(e3.getMessage.contains("nelsonAalen"))
    // exactly at the bound passes (the gate is <=, not <)
    assert(Events.kaplanMeier(hi, "dur", "ev", maxLevels = 50L)
      .count() > 0L)
    // quantizing upstream — the escape the message prescribes —
    // collapses the levels under the gate
    val q = hi.withColumn("dur", floor(col("dur") / 10L) * 10L)
    assert(Events.nelsonAalen(q, "dur", "ev", maxLevels = 10L)
      .count() > 0L)
  }

  test("fisherExactTest: randomized parity vs an exact BigDecimal " +
      "hypergeometric reference") {
    val rnd = new scala.util.Random(1357)
    def choose(n: Int, k: Int): BigInt =
      if (k < 0 || k > n) BigInt(0)
      else (BigInt(n - k + 1) to BigInt(n)).product /
        (BigInt(1) to BigInt(k)).product
    for (trial <- 1 to 6) {
      val (a, b, c, d) = (rnd.nextInt(12), rnd.nextInt(12),
        rnd.nextInt(12), rnd.nextInt(12))
      val rows = (Seq.fill(a)((true, true)) ++ Seq.fill(b)((true, false))
        ++ Seq.fill(c)((false, true)) ++ Seq.fill(d)((false, false)))
      if (rows.nonEmpty) {
        val got = Events.fisherExactTest(rows.toDF("e", "o"), "e", "o")
          .as[(Long, Long, Long, Long, Double)].collect().head
        // exact rational point masses over the support
        val (r1, r2, c1) = (a + b, c + d, a + c)
        val n = r1 + r2
        val kmin = math.max(0, c1 - r2)
        val kmax = math.min(r1, c1)
        val masses = (kmin to kmax).map(k =>
          k -> BigDecimal(choose(r1, k) * choose(r2, c1 - k)))
        val tot = masses.map(_._2).sum
        val obs = masses.find(_._1 == a).get._2
        // the operator's (1 + 1e-7) relative tie tolerance
        val kept = masses.filter(_._2 <= obs * BigDecimal(1.0 + 1e-7))
          .map(_._2).sum
        val expect = (kept / tot).toDouble
        assert(math.abs(got._5 - expect) < 1e-5,
          s"trial $trial ($a,$b,$c,$d): ${got._5} vs $expect")
      }
    }
  }

  test("shapleyAttribution: randomized axioms — efficiency and " +
      "removal-consistency on random chains") {
    val rnd = new scala.util.Random(2468)
    val chans = Seq("a", "b", "c")
    for (trial <- 1 to 2) {
      val evs = (1L to 30L).flatMap { u =>
        val len = 1 + rnd.nextInt(6)
        (0 until len).map { i =>
          val ty = if (rnd.nextDouble() < 0.25) "conv"
                   else chans(rnd.nextInt(3))
          (u * 100 + i, u, (i + 1).toLong * 10, ty)
        }
      }
      val df = evs.toDF("event_id", "user_id", "ts", "event_type")
      val sh = Events.shapleyAttribution(df, "user_id", "event_type",
        "ts", "event_id", "conv", chans)
        .as[(String, Option[Double], Option[Double], Option[Double])]
        .collect()
      if (sh.head._4.isDefined) {
        val pf = sh.head._4.get
        // every channel's value is shared; phis are finite and the
        // shares (when present) sum to 1
        assert(sh.forall(_._4.get == pf))
        val shares = sh.flatMap(_._3)
        if (shares.nonEmpty)
          assert(math.abs(shares.sum - 1.0) < 1e-4,
            s"trial $trial shares ${shares.toSeq}")
        // efficiency: sum(phi) = v(C) − v(∅); with every channel
        // removed only the direct START→CONV edge survives, whose
        // probability is the fraction of users whose FIRST relevant
        // event is the conversion (every user emits exactly one
        // START out-edge)
        val firstTy = evs.groupBy(_._2).map { case (_, rows) =>
          rows.minBy(r => (r._3, r._1))._4
        }
        val vEmpty = firstTy.count(_ == "conv").toDouble / firstTy.size
        assert(math.abs(sh.flatMap(_._2).sum - (pf - vEmpty)) < 1e-4,
          s"trial $trial efficiency")
      }
    }
  }

  test("nelsonAalen: hand cumulative hazard on the KM fixture; defined " +
      "through the d = n level") {
    // same fixture as kaplanMeier: H(1) = 1/6, H(3) = 1/6 + 2/4,
    // H(5) = ... + 1/1 (KM pins survival to 0 here; NA keeps adding)
    val rows = Seq((1L, true), (2L, false), (3L, true), (3L, true),
      (4L, false), (5L, true)).toDF("dur", "ev")
    val got = Events.nelsonAalen(rows, "dur", "ev")
      .as[(Long, Long, Long, Double, Double)].collect()
      .sortBy(_._1).toSeq
    def r6(x: Double): Double = math.rint(x * 1e6) / 1e6
    assert(got === Seq(
      (1L, 6L, 1L, r6(1.0 / 6.0), r6(1.0 / 36.0)),
      (3L, 4L, 2L, r6(1.0 / 6.0 + 2.0 / 4.0),
        r6(1.0 / 36.0 + 2.0 / 16.0)),
      (5L, 1L, 1L, r6(1.0 / 6.0 + 2.0 / 4.0 + 1.0),
        r6(1.0 / 36.0 + 2.0 / 16.0 + 1.0))))
    assert(!got.exists(r => r._1 == 2L || r._1 == 4L))
  }

  test("cochranQ: hand Q on a 6x3 binary block; degenerate NULL") {
    // G = (5, 5, 2), T = 12, sum L^2 = 28:
    // Q = 2 * (3*(25+25+4) - 144) / (36 - 28) = 4.5
    val rows = Seq((1, 1, 0), (1, 1, 0), (1, 0, 0), (1, 1, 1),
      (0, 1, 0), (1, 1, 1))
      .map { case (a, b, c) => (a == 1, b == 1, c == 1) }
      .toDF("a", "b", "c")
    val got = Events.cochranQ(rows, Seq("a", "b", "c"))
      .as[(Long, Int, Option[Double])].collect().head
    assert(got === ((6L, 2, Some(4.5))))
    // all-success blocks: denominator 0 -> NULL q
    val degen = Seq((true, true, true), (true, true, true)).toDF("a", "b", "c")
    val g2 = Events.cochranQ(degen, Seq("a", "b", "c"))
      .as[(Long, Int, Option[Double])].collect().head
    assert(g2 === ((2L, 2, None)))
    // NULL outcome counts as failure
    val withNull = rows.withColumn("c",
      when(col("c"), col("c"))) // true stays, false -> null
    val g3 = Events.cochranQ(withNull, Seq("a", "b", "c"))
      .as[(Long, Int, Option[Double])].collect().head
    assert(g3 === ((6L, 2, Some(4.5))))
  }

  test("logRankTest: hand-traced two-arm table; arm-swap symmetry") {
    // arm a: events at t=1,2; arm b: event at t=1, censored at t=3.
    // t=1: na=2 nb=2 d=2 -> e = 2*2/4 = 1, v = 2*(.5)*(.5)*(2/3)
    // t=2: na=1 nb=1 d=1 -> e = .5,      v = 1*(.5)*(.5)*(1/1)
    // O_A = 2, E_A = 1.5, V = 1/3 + 1/4 = 0.5833,
    // chi2 = 0.25 / 0.5833 (from the ROUNDED variance) = 0.4286
    val subj = Seq((1L, true, "a"), (2L, true, "a"),
      (1L, true, "b"), (3L, false, "b"))
      .toDF("t", "ev", "grp")
    val got = Events.logRankTest(subj, "t", "ev", "grp", "a")
      .as[(Long, Long, Long, Double, Double, Option[Double], Int)]
      .collect().head
    assert(got._1 === 2L && got._2 === 2L && got._3 === 2L)
    assert(got._4 === 1.5 && got._5 === 0.5833)
    assert(got._6 === Some(BigDecimal(0.25 / 0.5833)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
    // swapping which arm is "A" flips O−E's sign only: chi2 invariant
    val swapped = Events.logRankTest(subj, "t", "ev", "grp", "b")
      .as[(Long, Long, Long, Double, Double, Option[Double], Int)]
      .collect().head
    assert(swapped._6 === got._6)
    assert(swapped._1 === 2L && swapped._3 === 1L) // O_B = 1
    // a level where everyone at risk dies (n=1 guard): zero v term
    val solo = Seq((1L, true, "a")).toDF("t", "ev", "grp")
    val g1 = Events.logRankTest(solo, "t", "ev", "grp", "a")
      .as[(Long, Long, Long, Double, Double, Option[Double], Int)]
      .collect().head
    assert(g1._5 === 0.0 && g1._6.isEmpty) // no variance -> NULL chi2
  }

  test("oddsRiskRatio: hand 2x2 with Woolf/Katz intervals; zero cell") {
    // a=2 b=1 c=1 d=2: OR = 4, RR = (2/3)/(1/3) = 2
    val per = Seq((true, true), (true, true), (true, false),
      (false, true), (false, false), (false, false))
      .toDF("e", "o")
    val r = Events.oddsRiskRatio(per, "e", "o")
      .as[(Long, Long, Long, Long, Option[Double], Option[Double],
        Option[Double], Option[Double], Option[Double], Option[Double])]
      .collect().head
    assert((r._1, r._2, r._3, r._4) === ((2L, 1L, 1L, 2L)))
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val seOr = math.sqrt(1.0 / 2 + 1.0 / 1 + 1.0 / 1 + 1.0 / 2)
    assert(r._5 === Some(4.0))
    assert(r._6 === Some(r6(math.exp(math.log(4.0) - 1.96 * seOr))))
    assert(r._7 === Some(r6(math.exp(math.log(4.0) + 1.96 * seOr))))
    val seRr = math.sqrt(1.0 / 2 - 1.0 / 3 + 1.0 / 1 - 1.0 / 3)
    assert(r._8 === Some(2.0))
    assert(r._9 === Some(r6(math.exp(math.log(2.0) - 1.96 * seRr))))
    assert(r._10 === Some(r6(math.exp(math.log(2.0) + 1.96 * seRr))))
    // a zero cell nulls every ratio (no silent continuity correction)
    val zc = Seq((true, true), (false, false)).toDF("e", "o")
    val z = Events.oddsRiskRatio(zc, "e", "o")
      .as[(Long, Long, Long, Long, Option[Double], Option[Double],
        Option[Double], Option[Double], Option[Double], Option[Double])]
      .collect().head
    assert(z._5.isEmpty && z._8.isEmpty && z._6.isEmpty && z._10.isEmpty)
  }

  test("markovAttribution: hand chain — exact removal effects; " +
      "truncation at first conversion; degenerate no-conv chain") {
    // u1: a->CONV, u2: b->CONV, u3: a->b->NULL
    // P: S->a 2/3, S->b 1/3; a->CONV 1/2, a->b 1/2; b->CONV/NULL 1/2
    // v(b)=1/2, v(a)=3/4, p_full=2/3; remove a -> 1/6 (re=3/4),
    // remove b -> 1/3 (re=1/2); shares 0.6 / 0.4
    def ev(id: Long, u: Long, ts: Long, ty: String) = (id, u, ts, ty)
    val rows = Seq(
      ev(1, 1, 10, "a"), ev(2, 1, 20, "conv"),
      ev(3, 2, 10, "b"), ev(4, 2, 20, "conv"),
      ev(5, 3, 10, "a"), ev(6, 3, 20, "b"))
      .toDF("event_id", "user_id", "ts", "event_type")
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Events.markovAttribution(rows, "user_id", "event_type",
      "ts", "event_id", "conv", Seq("a", "b"))
      .as[(String, Option[Double], Option[Double], Option[Double])]
      .collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      ("a", Some(0.75), Some(0.6), Some(r6(2.0 / 3.0))),
      ("b", Some(0.5), Some(0.4), Some(r6(2.0 / 3.0)))))
    // events AFTER the first conversion are ignored: u1 gets a
    // post-conversion 'b' touch that must not add a b->... transition
    val noisy = rows.union(Seq(ev(7, 1, 30, "b"))
      .toDF("event_id", "user_id", "ts", "event_type"))
    val g2 = Events.markovAttribution(noisy, "user_id", "event_type",
      "ts", "event_id", "conv", Seq("a", "b"))
      .as[(String, Option[Double], Option[Double], Option[Double])]
      .collect().sortBy(_._1)
    assert(g2.toSeq === got.toSeq)
    // a chain that never converts: every output NULL
    val dead = Seq(ev(1, 1, 10, "a"), ev(2, 2, 10, "b"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val g3 = Events.markovAttribution(dead, "user_id", "event_type",
      "ts", "event_id", "conv", Seq("a", "b"))
      .as[(String, Option[Double], Option[Double], Option[Double])]
      .collect()
    assert(g3.forall(r => r._2.isEmpty && r._3.isEmpty && r._4.isEmpty))
    // conversion with no prior touch: START->CONV raises p_conv but
    // credits no channel
    val direct = rows.union(Seq(ev(8, 4, 10, "conv"))
      .toDF("event_id", "user_id", "ts", "event_type"))
    val g4 = Events.markovAttribution(direct, "user_id", "event_type",
      "ts", "event_id", "conv", Seq("a", "b"))
      .as[(String, Option[Double], Option[Double], Option[Double])]
      .collect().sortBy(_._1)
    // p_full = 1/4 + 3/4·(2/3) = 0.75; removal floors at 1/4
    assert(g4.head._4 === Some(0.75))
    assert(g4.forall(_._2.get < 0.75))
    intercept[IllegalArgumentException] {
      Events.markovAttribution(rows, "user_id", "event_type", "ts",
        "event_id", "conv", Seq("a", "a"))
    }
  }

  test("markovAttribution: randomized parity vs an independent journey " +
      "builder + long fixed-point reference") {
    val rnd = new scala.util.Random(9090)
    val chans = Seq("a", "b", "c")
    for (trial <- 1 to 2) {
      // random event logs: 40 users, 1..8 touches, conv anywhere
      val evs = (1L to 40L).flatMap { u =>
        val len = 1 + rnd.nextInt(8)
        (0 until len).map { i =>
          val ty = if (rnd.nextDouble() < 0.2) "conv"
                   else chans(rnd.nextInt(3))
          (u * 100 + i, u, (i + 1).toLong * 10, ty)
        }
      }
      val df = evs.toDF("event_id", "user_id", "ts", "event_type")
      val got = Events.markovAttribution(df, "user_id", "event_type",
        "ts", "event_id", "conv", chans)
        .as[(String, Option[Double], Option[Double], Option[Double])]
        .collect().map(r => r._1 -> r).toMap
      // independent journey construction
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long].withDefaultValue(0L)
      evs.groupBy(_._2).foreach { case (_, rows) =>
        val ordered = rows.sortBy(r => (r._3, r._1)).map(_._4)
        val cut = ordered.indexOf("conv") match {
          case -1 => (ordered, false)
          case i => (ordered.take(i), true)
        }
        val (touches, conv) = cut
        var prev = "START"
        touches.foreach { t =>
          counts((prev, t)) += 1L; prev = t
        }
        counts((prev, if (conv) "CONV" else "NULL")) += 1L
      }
      def p(s: String, d: String): Double = {
        val tot = (chans ++ Seq("CONV", "NULL"))
          .map(x => counts((s, x))).sum
        if (tot == 0) 0.0 else counts((s, d)).toDouble / tot
      }
      def solve(removed: Option[String]): Double = {
        def pp(s: String, d: String) =
          if (removed.contains(d)) 0.0 else p(s, d)
        val states = "START" +: chans
        var v = states.map(_ => 0.0)
        for (_ <- 1 to 5000)
          v = states.map(s => chans.zipWithIndex.foldLeft(pp(s, "CONV")) {
            case (acc, (ch, i)) => acc + pp(s, ch) * v(i + 1)
          })
        v.head
      }
      val pf = solve(None)
      assert(pf > 0.0, s"trial $trial degenerate fixture")
      chans.foreach { c =>
        val re = 1.0 - solve(Some(c)) / pf
        assert(math.abs(got(c)._2.get - re) < 1e-6,
          s"trial $trial channel $c: ${got(c)._2.get} vs $re")
        assert(math.abs(got(c)._4.get - pf) < 1e-6, s"trial $trial pf")
      }
    }
  }

  test("shapleyAttribution: hand coalition values; efficiency = total " +
      "lift; K guard") {
    // same chain as the markov test: v(∅)=0, v({a})=1/3, v({b})=1/6,
    // v({a,b})=2/3 -> φ_a = ½·1/3 + ½·(2/3−1/6) = 5/12,
    // φ_b = ½·1/6 + ½·(2/3−1/3) = 1/4; Σφ = 2/3 = v(C) − v(∅);
    // shares 5/8 and 3/8
    def ev(id: Long, u: Long, ts: Long, ty: String) = (id, u, ts, ty)
    val rows = Seq(
      ev(1, 1, 10, "a"), ev(2, 1, 20, "conv"),
      ev(3, 2, 10, "b"), ev(4, 2, 20, "conv"),
      ev(5, 3, 10, "a"), ev(6, 3, 20, "b"))
      .toDF("event_id", "user_id", "ts", "event_type")
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Events.shapleyAttribution(rows, "user_id", "event_type",
      "ts", "event_id", "conv", Seq("a", "b"))
      .as[(String, Option[Double], Option[Double], Option[Double])]
      .collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      ("a", Some(r6(5.0 / 12.0)), Some(0.625), Some(r6(2.0 / 3.0))),
      ("b", Some(0.25), Some(0.375), Some(r6(2.0 / 3.0)))))
    // efficiency: Σφ = v(C) − v(∅) (v(∅) = 0 here — no direct convs)
    assert(r6(got.map(_._2.get).sum) === r6(2.0 / 3.0))
    intercept[IllegalArgumentException] {
      Events.shapleyAttribution(rows, "user_id", "event_type", "ts",
        "event_id", "conv", (1 to 17).map(i => s"c$i"))
    }
  }

  test("shapleySampledAttribution: converges to the exact fold on the " +
      "hand fixture; efficiency holds EXACTLY at any sample count; " +
      "runs past the exact K cap") {
    def ev(id: Long, u: Long, ts: Long, ty: String) = (id, u, ts, ty)
    val rows = Seq(
      ev(1, 1, 10, "a"), ev(2, 1, 20, "conv"),
      ev(3, 2, 10, "b"), ev(4, 2, 20, "conv"),
      ev(5, 3, 10, "a"), ev(6, 3, 20, "b"))
      .toDF("event_id", "user_id", "ts", "event_type")
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // K = 2: only two permutations exist, so the md5 sampler visits
    // both and the estimate converges fast; exact φ = (5/12, 1/4)
    val got = Events.shapleySampledAttribution(rows, "user_id",
      "event_type", "ts", "event_id", "conv", Seq("a", "b"),
      samples = 2000)
      .as[(String, Option[Double], Option[Double], Option[Double])]
      .collect().sortBy(_._1)
    assert(math.abs(got(0)._2.get - 5.0 / 12.0) < 0.02)
    assert(math.abs(got(1)._2.get - 0.25) < 0.02)
    assert(got.forall(_._4 === Some(r6(2.0 / 3.0))))
    // efficiency telescopes per permutation: Σφ̂ = v(C) − v(∅)
    // EXACTLY, at ANY sample count — including a single sample
    val one = Events.shapleySampledAttribution(rows, "user_id",
      "event_type", "ts", "event_id", "conv", Seq("a", "b"), samples = 1)
      .as[(String, Option[Double], Option[Double], Option[Double])]
      .collect()
    // (the reported values are 6dp-rounded, so the telescoped sum can
    // sit a grid step off the exact total — compare within the grid)
    assert(math.abs(one.map(_._2.get).sum - 2.0 / 3.0) < 2e-6)
    // determinism: same inputs, same estimate (md5 walks, no RNG)
    val again = Events.shapleySampledAttribution(rows, "user_id",
      "event_type", "ts", "event_id", "conv", Seq("a", "b"),
      samples = 2000)
      .as[(String, Option[Double], Option[Double], Option[Double])]
      .collect().sortBy(_._1)
    assert(again.toSeq === got.toSeq)
    // K = 24 — past the exact fold's 2^K cap — runs fine here
    // (distinct channels c01..c24 on a tiny journey set)
    val big = (1 to 24).map(i => f"c$i%02d")
    val rows24 = Seq(
      ev(1, 1, 10, "c01"), ev(2, 1, 20, "c07"), ev(3, 1, 30, "conv"),
      ev(4, 2, 10, "c13"), ev(5, 2, 20, "c24"))
      .toDF("event_id", "user_id", "ts", "event_type")
    intercept[IllegalArgumentException] {
      Events.shapleyAttribution(rows24, "user_id", "event_type", "ts",
        "event_id", "conv", big)
    }
    val sampled24 = Events.shapleySampledAttribution(rows24, "user_id",
      "event_type", "ts", "event_id", "conv", big, samples = 50)
      .as[(String, Option[Double], Option[Double], Option[Double])]
      .collect()
    assert(sampled24.length === 24)
    // touched channels earn credit; untouched channels are null
    // players (φ̂ = 0 — their marginals vanish in every permutation)
    val byCh = sampled24.map(r => r._1 -> r._2.get).toMap
    assert(byCh("c01") > 0.0 && byCh("c07") > 0.0)
    assert(big.filterNot(Set("c01", "c07", "c13", "c24"))
      .forall(c => byCh(c) === 0.0))
  }

  test("fisherExactTest: tea-tasting fixture, extreme table, guard") {
    // Fisher's tea-tasting 2x2 (3,1,1,3): P(k) = C(4,k)C(4,4-k)/C(8,4)
    // = (1,16,36,16,1)/70; observed a=3 keeps k in {0,1,3,4} ->
    // p = 34/70 (the symmetric tie at k=1 MUST be included)
    def table(a: Int, b: Int, c: Int, d: Int) =
      (Seq.fill(a)((true, true)) ++ Seq.fill(b)((true, false)) ++
        Seq.fill(c)((false, true)) ++ Seq.fill(d)((false, false)))
        .toDF("e", "o")
    val got = Events.fisherExactTest(table(3, 1, 1, 3), "e", "o")
      .as[(Long, Long, Long, Long, Double)].collect().head
    assert(got === ((3L, 1L, 1L, 3L,
      BigDecimal(34.0 / 70.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    // perfectly separated 5/0/0/5: only k=0 and k=5 qualify -> 2/252
    val sep = Events.fisherExactTest(table(5, 0, 0, 5), "e", "o")
      .as[(Long, Long, Long, Long, Double)].collect().head
    assert(sep._5 === BigDecimal(2.0 / 252.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // uniform-margin degenerate: a single support level -> p = 1
    val one = Events.fisherExactTest(table(2, 0, 3, 0), "e", "o")
      .as[(Long, Long, Long, Long, Double)].collect().head
    assert(one._5 === 1.0)
    // support guard fails loud
    val e = intercept[Exception] {
      Events.fisherExactTest(table(3, 1, 1, 3), "e", "o",
        maxSupport = 2L).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("maxSupport")))
  }
}
