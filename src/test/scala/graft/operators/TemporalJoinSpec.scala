package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TemporalJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asOf attaches the latest right row at or before each left ts, per key") {
    val trades = Seq(
      (1L, 100L, "t1"), (1L, 205L, "t2"), (1L, 50L, "t0"),
      (2L, 100L, "t3"), (3L, 10L, "t4"))
      .toDF("acct", "ts", "trade")
    val quotes = Seq(
      (1L, 90L, 9.0), (1L, 100L, 10.0), (1L, 200L, 20.0),
      (2L, 300L, 30.0))
      .toDF("acct", "ts", "px")

    val got = TemporalJoin.asOf(trades, quotes, Seq("acct"), "ts")
      .select("acct", "ts", "trade", "asof_ts", "px")
      .as[(Long, Long, String, Option[Long], Option[Double])]
      .collect().sortBy(r => (r._1, r._2))

    assert(got === Seq(
      (1L, 50L, "t0", None, None),              // before any quote
      (1L, 100L, "t1", Some(100L), Some(10.0)), // equal ts matches (<=)
      (1L, 205L, "t2", Some(200L), Some(20.0)), // latest prior wins
      (2L, 100L, "t3", None, None),             // key's quotes all later
      (3L, 10L, "t4", None, None)))             // key absent on right
  }

  test("asOf tolerance nulls out stale matches") {
    val l = Seq((1L, 100L, "a"), (1L, 500L, "b")).toDF("k", "ts", "ev")
    val r = Seq((1L, 90L, 7.0)).toDF("k", "ts", "v")
    val got = TemporalJoin.asOf(l, r, Seq("k"), "ts", tolerance = Some(50L))
      .select("ev", "v").as[(String, Option[Double])].collect().toMap
    assert(got === Map("a" -> Some(7.0), "b" -> None))
  }

  test("asOf equal-ts right rows tie-break by tieBreak column, last wins") {
    val l = Seq((1L, 100L, "e")).toDF("k", "ts", "ev")
    val r = Seq((1L, 100L, 1L, 10.0), (1L, 100L, 2L, 20.0))
      .toDF("k", "ts", "seq", "v")
    val got = TemporalJoin.asOf(l, r, Seq("k"), "ts", tieBreak = Seq("seq"))
      .select("v").as[Double].collect()
    assert(got === Array(20.0))
  }

  test("rangeJoin matches the plain inequality join, half-open intervals") {
    val points = (0L until 200L).map(i => (i, i * 7L)).toDF("pid", "x")
    val intervals = Seq(
      (10L, 0L, 100L), (11L, 95L, 105L), (12L, 700L, 701L),
      (13L, 1390L, 1500L), (14L, 2000L, 2001L))
      .toDF("iid", "lo", "hi")

    val got = TemporalJoin
      .rangeJoin(points, intervals, "x", "lo", "hi", bucketWidth = 16L)
      .select("pid", "iid").as[(Long, Long)].collect().sorted

    val expected = (for {
      (pid, x) <- (0L until 200L).map(i => (i, i * 7L))
      (iid, lo, hi) <- Seq((10L, 0L, 100L), (11L, 95L, 105L), (12L, 700L, 701L),
        (13L, 1390L, 1500L), (14L, 2000L, 2001L))
      if x >= lo && x < hi
    } yield (pid, iid)).sorted
    assert(got.toSeq === expected)
    assert(expected.nonEmpty)
  }

  test("rangeJoin is exact on epoch-nano magnitudes (no double rounding)") {
    // values near 2^60 — a double-divide bucket computation mis-buckets here
    val base = 1700000000000000000L
    val points = Seq((1L, base + 1L), (2L, base + 999999999L), (3L, base - 1L))
      .toDF("pid", "x")
    val intervals = Seq((7L, base, base + 1000000000L)).toDF("iid", "lo", "hi")
    val got = TemporalJoin
      .rangeJoin(points, intervals, "x", "lo", "hi", bucketWidth = 900000000000L)
      .select("pid").as[Long].collect().sorted
    assert(got.toSeq === Seq(1L, 2L))
  }

  test("rangeJoin tolerates degenerate intervals (end <= start matches nothing)") {
    // empty / inverted intervals are valid data under half-open semantics —
    // they must match nothing, not crash the job in sequence()
    val points = Seq((1L, 5L), (2L, 16L)).toDF("pid", "x")
    val intervals = Seq(
      (10L, 0L, 10L),   // normal: contains x=5
      (11L, 16L, 16L),  // empty, start ON a bucket boundary (width 16)
      (12L, 20L, 4L),   // inverted
      (13L, 5L, 5L))    // empty mid-bucket
      .toDF("iid", "lo", "hi")
    val got = TemporalJoin
      .rangeJoin(points, intervals, "x", "lo", "hi", bucketWidth = 16L)
      .select("pid", "iid").as[(Long, Long)].collect()
    assert(got.toSeq === Seq((1L, 10L)))
  }

  test("asOf rejects reserved and colliding column names up front") {
    val l = Seq((1L, 100L, "a")).toDF("k", "ts", "ev")
    val r = Seq((1L, 90L, 7.0)).toDF("k", "ts", "v")
    intercept[IllegalArgumentException] {
      TemporalJoin.asOf(l.withColumnRenamed("ev", "asof_ts"), r, Seq("k"), "ts")
    }
    intercept[IllegalArgumentException] {
      TemporalJoin.asOf(l, r.withColumnRenamed("v", "__p"), Seq("k"), "ts")
    }
    intercept[IllegalArgumentException] {
      TemporalJoin.asOf(l.withColumnRenamed("ev", "__side"), r, Seq("k"), "ts")
    }
    intercept[IllegalArgumentException] {
      TemporalJoin.asOf(l, r, Seq("k"), "ts", tieBreak = Seq("k"))
    }
  }

  test("asOfSliced: exact parity with asOf across slice widths (randomized)") {
    // pseudo-random but deterministic corpus; quote gaps straddle slice
    // boundaries so the carry/seed path is genuinely exercised
    val rnd = new scala.util.Random(7)
    val trades = (1 to 400).map(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(10000).toLong, i.toLong))
      .toDF("k", "ts", "tid")
    val quotes = (1 to 150).map(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(10000).toLong, i.toDouble))
      .toDF("k", "ts", "px")

    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select("k", "ts", "tid", "asof_ts", "px")
      .as[(Long, Long, Long, Option[Long], Option[Double])]
      .collect().sortBy(r => (r._1, r._2, r._3)).toSeq

    val plain = canon(TemporalJoin.asOf(trades, quotes, Seq("k"), "ts"))
    for (w <- Seq(1L, 7L, 100L, 1000L, 100000L)) {
      val sliced = canon(
        TemporalJoin.asOfSliced(trades, quotes, Seq("k"), "ts", sliceWidth = w))
      assert(sliced === plain, s"sliceWidth=$w diverged from asOf")
    }
    // tolerance + tieBreak variants hold too
    val qTb = (1 to 150).map(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(10000).toLong / 10 * 10, i.toLong, i.toDouble))
      .toDF("k", "ts", "seq", "px")
    def canonTb(df: org.apache.spark.sql.DataFrame) = df
      .select("k", "ts", "tid", "asof_ts", "px")
      .as[(Long, Long, Long, Option[Long], Option[Double])]
      .collect().sortBy(r => (r._1, r._2, r._3)).toSeq
    val plainTb = canonTb(TemporalJoin.asOf(trades, qTb, Seq("k"), "ts",
      tolerance = Some(500L), tieBreak = Seq("seq")))
    val slicedTb = canonTb(TemporalJoin.asOfSliced(trades, qTb, Seq("k"), "ts",
      sliceWidth = 64L, tolerance = Some(500L), tieBreak = Seq("seq")))
    assert(slicedTb === plainTb)
  }

  test("asOfSliced: epoch-nano magnitudes slice exactly") {
    val base = 1700000000000000000L
    val l = Seq((1L, base + 10L, "a"), (1L, base + 2000000001L, "b"))
      .toDF("k", "ts", "ev")
    val r = Seq((1L, base + 5L, 1.5), (1L, base + 1999999999L, 2.5))
      .toDF("k", "ts", "px")
    val got = TemporalJoin.asOfSliced(l, r, Seq("k"), "ts",
        sliceWidth = 1000000000L)
      .select("ev", "px").as[(String, Double)].collect().toMap
    assert(got === Map("a" -> 1.5, "b" -> 2.5))
  }

  test("rangeJoin with equi-keys only pairs within the key") {
    val points = Seq(("a", 5L, 1L), ("b", 5L, 2L)).toDF("k", "x", "pid")
    val intervals = Seq(("a", 0L, 10L, 7L)).toDF("k", "lo", "hi", "iid")
    val got = TemporalJoin
      .rangeJoin(points, intervals, "x", "lo", "hi", 4L, keys = Seq("k"))
      .select("pid").as[Long].collect()
    assert(got.toSeq === Seq(1L))
  }

  test("overlapJoin matches a naive inequality join, each pair exactly once") {
    // deterministic pseudo-random intervals with many multi-bucket spans
    val l = (0 until 120).map { i =>
      val s = (i * 37L) % 500; (i.toLong, s, s + 1 + (i * 13L) % 90)
    }
    val r = (0 until 150).map { i =>
      val s = (i * 23L) % 500; (1000L + i, s, s + 1 + (i * 7L) % 60)
    }
    val lDf = l.toDF("lid", "ls", "le")
    val rDf = r.toDF("rid", "rs", "re")
    val expected = (for {
      (lid, ls, le) <- l; (rid, rs, re) <- r
      if ls < re && rs < le
    } yield (lid, rid)).toSet
    for (bw <- Seq(16L, 64L, 1024L)) {
      val got = TemporalJoin.overlapJoin(lDf, rDf, "ls", "le", "rs", "re", bw)
        .select("lid", "rid").as[(Long, Long)].collect()
      assert(got.length === got.toSet.size, s"duplicate pairs at bw=$bw")
      assert(got.toSet === expected, s"wrong pair set at bw=$bw")
    }
  }

  test("overlapJoin: empty/inverted intervals match nothing, no crash") {
    val l = Seq((1L, 10L, 10L), (2L, 20L, 5L), (3L, 0L, 4L)).toDF("lid", "ls", "le")
    val r = Seq((9L, 0L, 100L)).toDF("rid", "rs", "re")
    val got = TemporalJoin.overlapJoin(l, r, "ls", "le", "rs", "re", 8L)
      .select("lid").as[Long].collect()
    assert(got.toSeq === Seq(3L))
  }

  test("overlapJoin: per-interval bucket fan-out over the cap errors, not OOMs") {
    val l = Seq((1L, 0L, 1000000L)).toDF("lid", "ls", "le") // 1M buckets at bw=1
    val r = Seq((9L, 5L, 6L)).toDF("rid", "rs", "re")
    val ex = intercept[Exception] {
      TemporalJoin.overlapJoin(l, r, "ls", "le", "rs", "re", 1L,
        maxBucketsPerInterval = 1000L).count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("spans more than 1000 buckets")), ex)
    // same data under a cap that fits works normally
    val ok = TemporalJoin.overlapJoin(l, r, "ls", "le", "rs", "re", 1L,
      maxBucketsPerInterval = 2000000L).count()
    assert(ok === 1L)
  }

  test("overlapJoin with equi-keys and disjoint-name enforcement") {
    val l = Seq(("a", 0L, 10L, 1L), ("b", 0L, 10L, 2L)).toDF("k", "ls", "le", "lid")
    val r = Seq(("a", 5L, 15L, 9L)).toDF("k", "rs", "re", "rid")
    val got = TemporalJoin
      .overlapJoin(l, r, "ls", "le", "rs", "re", 4L, keys = Seq("k"))
      .select("lid", "rid").as[(Long, Long)].collect()
    assert(got.toSeq === Seq((1L, 9L)))
    intercept[IllegalArgumentException] {
      TemporalJoin.overlapJoin(l, l, "ls", "le", "ls", "le", 4L)
    }
  }
}
