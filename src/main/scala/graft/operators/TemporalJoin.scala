package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Temporal join operators (mission extension, SURVEY.md §7.4): as-of join
 * and interval/range join — the two joins event pipelines need that plain
 * equi-joins can't express and naive formulations can't scale.
 *
 * Scale design:
 *  - [[asOf]] is ONE shuffle (union both sides, repartition by key) plus a
 *    partition-local sort — the classic merge-scan shape. The obvious
 *    alternatives either cross-join per key (quadratic) or window-rank a
 *    left×right inequality join (Spark plans inequality joins as
 *    broadcast-nested-loop: quadratic work even when broadcastable).
 *  - [[rangeJoin]] maps every point to exactly one bucket and replicates
 *    each interval over only the buckets it covers, so the join is a pure
 *    equi-join on (keys, bucket) — shuffle keys stay small, no
 *    nested-loop fallback, and fan-out is interval_span/bucketWidth
 *    (choose bucketWidth ≈ the typical interval span: O(1) replicas).
 */
object TemporalJoin {

  /**
   * As-of join: for every left row, attach the single most recent right
   * row with `right.tsCol <= left.tsCol` within the same `keys` group
   * (LEFT OUTER semantics: unmatched left rows keep null right columns).
   *
   * Right columns other than keys/ts are carried as payload; the matched
   * right timestamp is exposed as `asof_ts`. `tolerance` (same unit as
   * the ts columns) nulls out matches older than `left.ts - tolerance`,
   * the standard trades-style staleness bound.
   *
   * Ties: right rows sort before left rows at equal ts (a quote AT the
   * trade's timestamp matches); equal-ts right rows tie-break by
   * `tieBreak` columns, last one wins (pass e.g. a sequence column).
   */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           tsCol: String, tolerance: Option[Long] = None,
           tieBreak: Seq[String] = Nil): DataFrame = {
    val payloadCols = right.columns.filterNot(c =>
      keys.contains(c) || c == tsCol || tieBreak.contains(c)).toSeq
    require(payloadCols.nonEmpty, "right side needs at least one payload column")
    val collisions = payloadCols.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"right payload columns collide with left columns: $collisions — rename first")
    // `asof_ts` is this operator's output column; `__`-prefixed names are
    // its internal tagging scheme — either on an input silently corrupts
    // the output (duplicate columns / mis-tagged rows), so reject up front
    require(!left.columns.contains("asof_ts"),
      "left side may not have a column named asof_ts (reserved output name) — rename first")
    val reserved = (left.columns ++ right.columns).filter(_.startsWith("__"))
    require(reserved.isEmpty,
      s"column names starting with __ are reserved by asOf: ${reserved.toSet} — rename first")
    require(!tieBreak.contains(tsCol) && tieBreak.toSet.intersect(keys.toSet).isEmpty,
      "tieBreak columns must be distinct from keys and the ts column")

    // one unioned frame: side 0 = right (carrying its payload in a struct),
    // side 1 = left (null payload) — the window's ignoreNulls last() then
    // pulls the latest right payload at or before each left row
    val rTagged = right.select(
      keys.map(col) ++ tieBreak.map(col) ++ Seq(
        col(tsCol).as("__ts"), lit(0).as("__side"),
        struct(col(tsCol).as("asof_ts") +: payloadCols.map(col): _*).as("__p")
      ) ++ left.columns.map(c => lit(null).cast(left.schema(c).dataType).as(s"__l_$c")): _*)
    val lTagged = left.select(
      keys.map(col) ++ tieBreak.map(_ => lit(null).as("__tb")) ++ Seq(
        col(tsCol).as("__ts"), lit(1).as("__side"),
        lit(null).cast(rTagged.schema("__p").dataType).as("__p")
      ) ++ left.columns.map(c => col(c).as(s"__l_$c")): _*)
    // align tieBreak column names across the union
    val rCols = rTagged.columns
    val union = rTagged.toDF(rCols: _*).unionByName(lTagged.toDF(rCols: _*))

    val ordering: Seq[Column] =
      col("__ts").asc +: col("__side").asc +: tieBreak.map(col(_).asc_nulls_first)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = union.withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val bounded = tolerance.fold(matched)(tol =>
      matched.withColumn("__m",
        when(col("__m.asof_ts") >= col("__ts") - lit(tol), col("__m"))))
    bounded.select(
      left.columns.map(c => col(s"__l_$c").as(c)).toSeq ++
        Seq(col("__m.asof_ts").as("asof_ts")) ++
        payloadCols.map(c => col(s"__m.$c").as(c)): _*)
  }

  /**
   * Hot-key-safe as-of join: identical semantics to [[asOf]], but the
   * window partitions by (keys, time-slice) instead of keys alone, so NO
   * single task ever sorts more than one slice of one key — the mitigation
   * for a key that owns a material fraction of both streams (where plain
   * asOf's per-key sort becomes the straggler).
   *
   * Construction (all heavy frames stay O(rows); the carry frames are
   * O(#distinct (key, slice)) — summaries, not data):
   *   1. per (key, slice): the slice's WINNING right row (latest ts,
   *      tieBreak-last), as a one-row summary;
   *   2. running carry of those summaries across slices per key — the
   *      latest right payload up to each summary's slice;
   *   3. an as-of match AT SLICE GRANULARITY seeds every left slice with
   *      the carry from strictly-earlier slices;
   *   4. final window per (key, slice): seed first, then the in-slice
   *      merge-scan exactly like [[asOf]].
   *
   * Pick `sliceWidth` ≈ hot-key event span / desired parallelism. Light
   * keys pay two extra small shuffles; use [[asOf]] when no key is hot.
   */
  def asOfSliced(left: DataFrame, right: DataFrame, keys: Seq[String],
                 tsCol: String, sliceWidth: Long,
                 tolerance: Option[Long] = None,
                 tieBreak: Seq[String] = Nil): DataFrame = {
    require(sliceWidth > 0, "sliceWidth must be positive")
    val payloadCols = right.columns.filterNot(c =>
      keys.contains(c) || c == tsCol || tieBreak.contains(c)).toSeq
    require(payloadCols.nonEmpty, "right side needs at least one payload column")
    val collisions = payloadCols.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"right payload columns collide with left columns: $collisions — rename first")
    require(!left.columns.contains("asof_ts"),
      "left side may not have a column named asof_ts (reserved output name) — rename first")
    val reserved = (left.columns ++ right.columns).filter(_.startsWith("__"))
    require(reserved.isEmpty,
      s"column names starting with __ are reserved by asOfSliced: ${reserved.toSet} — rename first")
    require(!tieBreak.contains(tsCol) && tieBreak.toSet.intersect(keys.toSet).isEmpty,
      "tieBreak columns must be distinct from keys and the ts column")

    // slice id = the slice's START value (exact int64 floor-to-multiple,
    // like rangeJoin's bucketOf — a double divide would mis-slice
    // epoch-nano timestamps above 2^53)
    def sliceOf(c: Column): Column =
      (c.cast("long") - pmod(c.cast("long"), lit(sliceWidth))).cast("long")
    val kCols = keys.map(col)

    // (1) slice winners: one summary row per (key, slice) of the right side
    val pStruct = struct(col(tsCol).as("asof_ts") +: payloadCols.map(col): _*)
    val winnerOrd: Seq[Column] =
      col(tsCol).desc +: tieBreak.map(col(_).desc_nulls_last)
    val summaries = right
      .withColumn("__slice", sliceOf(col(tsCol)))
      .withColumn("__rn", row_number().over(
        Window.partitionBy((kCols :+ col("__slice")): _*).orderBy(winnerOrd: _*)))
      .filter(col("__rn") === 1)
      .select(kCols ++ Seq(col("__slice"), pStruct.as("__p")): _*)

    // (2) running carry per key across summary slices (summaries are tiny)
    val carryWin = Window.partitionBy(kCols: _*).orderBy(col("__slice"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carries = summaries
      .withColumn("__carry", last(col("__p")).over(carryWin))
      .select(kCols ++ Seq(col("__slice"), col("__carry")): _*)

    // (3) slice-granular as-of: each LEFT slice gets the carry from
    // strictly earlier slices (carry of slice s becomes visible at s+1)
    val leftSlices = left.select(kCols :+ sliceOf(col(tsCol)).as("__slice"): _*)
      .distinct()
    val seedUnion = carries.select(
        kCols ++ Seq((col("__slice") + sliceWidth).as("__at"),
          lit(0).as("__sside"), col("__carry")): _*)
      .unionByName(leftSlices.select(
        kCols ++ Seq(col("__slice").as("__at"), lit(1).as("__sside"),
          lit(null).cast(summaries.schema("__p").dataType).as("__carry")): _*))
    val seedWin = Window.partitionBy(kCols: _*)
      .orderBy(col("__at").asc, col("__sside").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val seeds = seedUnion
      .withColumn("__seedp", last(col("__carry"), ignoreNulls = true).over(seedWin))
      .filter(col("__sside") === 1 && col("__seedp").isNotNull)
      .select(kCols ++ Seq(col("__at").as("__slice"), col("__seedp")): _*)

    // (4) final merge-scan per (key, slice): seed rows order FIRST
    // (__first=0), then rights-before-lefts by ts like asOf
    val nullTb = tieBreak.map(c => lit(null).cast(right.schema(c).dataType).as(c))
    def lNulls = left.columns.map(c =>
      lit(null).cast(left.schema(c).dataType).as(s"__l_$c"))
    val rTagged = right.select(
      kCols ++ Seq(sliceOf(col(tsCol)).as("__slice"), lit(1).as("__first"),
        col(tsCol).as("__ts"), lit(0).as("__side"), pStruct.as("__p")) ++
        tieBreak.map(col) ++ lNulls: _*)
    val seedTagged = seeds.select(
      kCols ++ Seq(col("__slice"), lit(0).as("__first"),
        lit(null).cast(right.schema(tsCol).dataType).as("__ts"),
        lit(0).as("__side"), col("__seedp").as("__p")) ++ nullTb ++ lNulls: _*)
    val lTagged = left.select(
      kCols ++ Seq(sliceOf(col(tsCol)).as("__slice"), lit(1).as("__first"),
        col(tsCol).as("__ts"), lit(1).as("__side"),
        lit(null).cast(rTagged.schema("__p").dataType).as("__p")) ++ nullTb ++
        left.columns.map(c => col(c).as(s"__l_$c")): _*)
    val cols = rTagged.columns
    val union = rTagged.toDF(cols: _*)
      .unionByName(seedTagged.toDF(cols: _*))
      .unionByName(lTagged.toDF(cols: _*))

    val ordering: Seq[Column] = col("__first").asc +: col("__ts").asc +:
      col("__side").asc +: tieBreak.map(col(_).asc_nulls_first)
    val w = Window.partitionBy(kCols :+ col("__slice"): _*).orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = union.withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val bounded = tolerance.fold(matched)(tol =>
      matched.withColumn("__m",
        when(col("__m.asof_ts") >= col("__ts") - lit(tol), col("__m"))))
    bounded.select(
      left.columns.map(c => col(s"__l_$c").as(c)).toSeq ++
        Seq(col("__m.asof_ts").as("asof_ts")) ++
        payloadCols.map(c => col(s"__m.$c").as(c)): _*)
  }

  /**
   * Interval (range) join: pairs every point row with every interval row
   * whose half-open range `[startCol, endCol)` contains `pointCol`,
   * optionally also matching on equi-`keys`. All three range columns must
   * be integral (cast timestamps to epoch nanos/micros first).
   *
   * `bucketWidth` trades replication for candidate-set size: each interval
   * is replicated over ceil(span / bucketWidth) bucket rows; each point
   * joins exactly one bucket, so no deduplication is ever needed.
   */
  def rangeJoin(points: DataFrame, intervals: DataFrame, pointCol: String,
                startCol: String, endCol: String, bucketWidth: Long,
                keys: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(!points.columns.contains("__bucket") &&
        !intervals.columns.contains("__bucket"),
      "column __bucket is reserved here — rename first")
    // bucket id = the bucket's start value (floor to a bucketWidth
    // multiple): pure int64 arithmetic — a divide would round-trip
    // through double and mis-bucket epoch-nanos (> 2^53) timestamps
    def bucketOf(c: Column): Column =
      (c.cast("long") - pmod(c.cast("long"), lit(bucketWidth))).cast("long")

    val p = points.withColumn("__bucket", bucketOf(col(pointCol)))
    val iv = intervals
      // half-open [start, end): end <= start is empty and matches nothing —
      // drop those rows BEFORE the explode, where sequence(hi, lo) would
      // throw "Illegal sequence boundaries" (a data-dependent job crash)
      .filter(col(endCol) > col(startCol))
      .withColumn("__bucket", explode(sequence(
        bucketOf(col(startCol)),
        // end is exclusive: the bucket of (end - 1) is the last one touched
        bucketOf(col(endCol) - lit(1)),
        lit(bucketWidth))))
    p.join(iv, Seq("__bucket") ++ keys)
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bucket")
  }

  /**
   * Interval OVERLAP join: pairs every left interval `[lStart, lEnd)` with
   * every right interval `[rStart, rEnd)` that overlaps it (optionally
   * also matching equi-`keys`) — the two-sided generalization of
   * [[rangeJoin]]. All four range columns must be integral.
   *
   * Same bucketed equi-join shape: each side replicates over the buckets
   * its span touches, overlapping pairs meet in every shared bucket — and
   * are kept ONLY in the first one, `max(bucketOf(lStart),
   * bucketOf(rStart))` (both intervals contain `max(lStart, rStart)`, so
   * both are present in its bucket). An exact arithmetic predicate, not a
   * `distinct()` — no dedup shuffle, and the join stays a pure equi-join
   * Catalyst can plan (shuffle or broadcast by bucket+keys), never a
   * nested-loop inequality join.
   *
   * Column names of the two frames must be disjoint (aside from `keys`).
   *
   * Fan-out bound: each interval is replicated over ceil(span /
   * bucketWidth) bucket rows — size `bucketWidth` near the MEDIAN span,
   * not the max. A mis-sized width (one huge outlier interval, or
   * nanos-vs-millis confusion) would otherwise materialize millions of
   * rows per interval or hit Spark's array-length cap inside
   * `sequence()`; `maxBucketsPerInterval` turns that into an immediate,
   * attributable error (a `raise_error` naming the offending span)
   * instead of a silent blow-up or an opaque sequence failure.
   */
  def overlapJoin(left: DataFrame, right: DataFrame,
                  lStart: String, lEnd: String,
                  rStart: String, rEnd: String,
                  bucketWidth: Long, keys: Seq[String] = Nil,
                  maxBucketsPerInterval: Long = 1L << 16): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(maxBucketsPerInterval > 0, "maxBucketsPerInterval must be positive")
    val dup = (left.columns.toSet -- keys).intersect(right.columns.toSet -- keys)
    require(dup.isEmpty, s"column names must be disjoint (rename first): $dup")
    require(!left.columns.contains("__bucket") &&
        !right.columns.contains("__bucket"),
      "column __bucket is reserved here — rename first")
    def bucketOf(c: Column): Column =
      (c.cast("long") - pmod(c.cast("long"), lit(bucketWidth))).cast("long")
    // exact int64 bucket count; the raise_error branch types as NULL and
    // unifies with the long first-bucket, so the guard costs one compare
    // per interval row and never fires on well-sized data
    def firstBucketGuarded(s: String, e: String): Column = {
      val nBuckets =
        (bucketOf(col(e) - lit(1)) - bucketOf(col(s))) / lit(bucketWidth) + lit(1)
      when(nBuckets > lit(maxBucketsPerInterval),
        raise_error(concat(
          lit(s"overlapJoin: interval [$s, $e) = ["),
          col(s).cast("string"), lit(", "), col(e).cast("string"),
          lit(s") spans more than $maxBucketsPerInterval buckets of width " +
            s"$bucketWidth — resize bucketWidth or raise maxBucketsPerInterval"))))
        .otherwise(bucketOf(col(s)))
    }
    def spanned(df: DataFrame, s: String, e: String): DataFrame = df
      .filter(col(e) > col(s)) // empty interval overlaps nothing
      .withColumn("__bucket", explode(sequence(
        firstBucketGuarded(s, e),
        bucketOf(col(e) - lit(1)), lit(bucketWidth))))
    spanned(left, lStart, lEnd)
      .join(spanned(right, rStart, rEnd), Seq("__bucket") ++ keys)
      .filter(col(lStart) < col(rEnd) && col(rStart) < col(lEnd))
      // count each overlapping pair exactly once: in the bucket where the
      // later-starting interval begins (its first bucket — shared, since
      // the other interval covers that point too)
      .filter(col("__bucket") ===
        greatest(bucketOf(col(lStart)), bucketOf(col(rStart))))
      .drop("__bucket")
  }
}
