package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.LineageCut.CutOps

/**
 * Event-stream analytics over (user, type, time, value) logs — the
 * product-analytics family next to [[Funnel]] and
 * [[graft.streaming.Streams.sessionize]]: cohort retention, conversion
 * attribution, behavioral transition matrices, and slowly-changing-
 * dimension interval construction. All four are single-purpose
 * DataFrame plans whose shuffles carry keys and timestamps, never
 * event payloads.
 *
 * Timestamps are long event-time everywhere (epoch-nanos like the rest
 * of the temporal operators — `tsCol` is cast to long, lossless for
 * the nanos-as-long parquet reads this repo standardizes on).
 */
object Events {

  /**
   * Cohort retention triangle: users are cohorted by the time bucket of
   * their FIRST event, and each (cohort, offset) cell counts the
   * distinct users of that cohort active `offset` buckets later — the
   * week-over-week retention report every growth dashboard draws.
   *
   * Scale shape: (1) one user-keyed min-aggregate for first-touch
   * (map-side combined, (user, long) pairs), (2) one distinct over
   * (user, bucket) — also map-side combined keys-only, (3) an equi-join
   * of the two on `user` (AQE broadcasts the cohort side when small;
   * both are user-keyed so at scale this is a co-partitioned shuffle
   * join), (4) a final (cohort, offset)-keyed count-distinct whose
   * domain is users — the only aggregation that moves user ids, and it
   * moves each (cohort, offset, user) triple exactly once. No windows,
   * no sorts, no event payloads anywhere.
   *
   * Returns (`cohort`, `offset`, `users`): cohort = first-event bucket
   * index (floorDiv of event time by `bucketNs`), offset ≥ 0 in
   * buckets. Offset-0 cells equal cohort sizes by construction.
   */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String,
                      bucketNs: Long): DataFrame = {
    require(bucketNs > 0, "bucketNs must be positive")
    // integral `div`, NOT floor(a/b): double division loses integer
    // precision past 2^53 — epoch-nanos are ~2^60 and adjacent buckets
    // would alias. (div truncates toward zero == floor for the
    // non-negative event times this operator is specified over.)
    val ev = events.select(col(userCol).as("u"),
      col(tsCol).cast("long").as("__ts"))
      .select(col("u"), expr(s"__ts div ${bucketNs}L").as("bucket"))
    val cohorts = ev.groupBy("u").agg(min("bucket").as("cohort"))
    val active = ev.distinct()
    active.join(cohorts, "u")
      .groupBy(col("cohort"), (col("bucket") - col("cohort")).as("offset"))
      .agg(countDistinct("u").as("users"))
  }

  /**
   * Last-touch conversion attribution: each conversion event (type ==
   * `conversionType`) is credited to the LATEST touch event among
   * `touchTypes` by the same user at or before the conversion and
   * within `windowNs` of it; conversions with no in-window touch fall
   * into the `"(direct)"` channel. Per channel: conversion count and
   * summed conversion value — the report that decides marketing spend.
   *
   * Determinism: simultaneous touches (equal timestamps) tie-break on
   * the larger `idCol` — a total order, so the credited touch is unique
   * and the SQL oracle re-derives the identical assignment with the
   * same ROW_NUMBER ordering.
   *
   * Scale shape: touches and conversions are two type-pushed
   * projections of the same scan (the type filters reach the parquet
   * scan). One user-keyed equi-join pairs each conversion with its
   * in-window touches — both sides are (user, ts, id[, value]) rows,
   * never payloads — then ONE window (`row_number` partitioned by
   * conversion id) keeps the latest. The window partitions by
   * conversion id, so its sort is per-conversion-candidate-set (the
   * handful of in-window touches), not per-user history. A left join
   * back to all conversions restores the no-touch rows for the direct
   * channel. At 100 TB the join is the honest cost and it is keyed,
   * AQE-skew-splittable, and carries ~32 bytes/row.
   */
  def lastTouchAttribution(events: DataFrame, userCol: String,
                           typeCol: String, tsCol: String, idCol: String,
                           valueCol: String, conversionType: String,
                           touchTypes: Seq[String],
                           windowNs: Long): DataFrame = {
    require(touchTypes.nonEmpty, "need at least one touch type")
    require(!touchTypes.contains(conversionType),
      s"conversion type $conversionType cannot also be a touch type")
    require(windowNs > 0, "windowNs must be positive")
    val ev = events.select(col(userCol).as("u"), col(typeCol).as("ty"),
      col(tsCol).cast("long").as("ts"), col(idCol).cast("long").as("eid"),
      col(valueCol).cast("double").as("v"))
    val conv = ev.filter(col("ty") === conversionType)
      .select(col("u"), col("ts").as("cts"), col("eid").as("cid"), col("v"))
    val touch = ev.filter(col("ty").isin(touchTypes: _*))
      .select(col("u"), col("ty"), col("ts"), col("eid"))
    val paired = conv.join(touch, "u")
      .filter(col("ts") <= col("cts") && col("ts") > col("cts") - windowNs)
    val latest = paired.withColumn("rn", row_number().over(
        Window.partitionBy("cid")
          .orderBy(col("ts").desc, col("eid").desc)))
      .filter(col("rn") === 1)
      .select(col("cid").as("mcid"), col("ty").as("channel"))
    conv.join(latest, conv("cid") === latest("mcid"), "left")
      .select(coalesce(col("channel"), lit("(direct)")).as("channel"), col("v"))
      .groupBy("channel")
      .agg(count(lit(1)).as("conversions"),
        round(sum("v"), 4).as("credited_value"))
  }

  /**
   * First-order Markov transition matrix over per-user event
   * sequences: for every ordered adjacent pair of events by the same
   * user, count (from_type → to_type) and its row-normalized
   * probability — the behavioral model behind next-action prediction
   * and anomaly-flagging on event streams.
   *
   * Determinism: the per-user order is (ts, id) — a total order, so
   * `lead` is well-defined under equal timestamps and the oracle
   * replays the identical sequence.
   *
   * Scale shape: ONE window (`lead` over user partitions ordered by
   * (ts, id)) — the per-user sort is the honest cost of sequencing and
   * it shuffles (user, ts, id, type) rows only; then one
   * (from, to)-keyed count aggregate (map-side combined, ~#types²
   * groups) and a broadcast-sized row-sum join for the probabilities.
   * Probabilities are exact long/long divisions cast to double —
   * IEEE-identical cross-engine, no rounding needed.
   *
   * Returns (`from_type`, `to_type`, `transitions`, `prob`).
   */
  def transitionMatrix(events: DataFrame, userCol: String,
                       typeCol: String, tsCol: String,
                       idCol: String): DataFrame = {
    val ev = events.select(col(userCol).as("u"), col(typeCol).as("ty"),
      col(tsCol).cast("long").as("ts"), col(idCol).cast("long").as("eid"))
    val w = Window.partitionBy("u").orderBy(col("ts"), col("eid"))
    val pairs = ev.withColumn("nxt", lead("ty", 1).over(w))
      .filter(col("nxt").isNotNull)
    val counts = pairs.groupBy(col("ty").as("from_type"),
        col("nxt").as("to_type"))
      .agg(count(lit(1)).as("transitions"))
    val totals = counts.groupBy("from_type")
      .agg(sum("transitions").as("row_total"))
    counts.join(broadcast(totals), "from_type")
      .select(col("from_type"), col("to_type"), col("transitions"),
        (col("transitions").cast("double") / col("row_total")).as("prob"))
  }

  /**
   * Pareto concentration report ("what share of value comes from the
   * top X% of keys?") — the whale-dependence metric behind both
   * revenue risk and corpus-source concentration audits. Keys are
   * ranked by their summed value (ties to the smaller key — total
   * order), the top ⌈fraction·n⌉ keys form the head, and the report
   * is one row: key count, head size, head share, plus the Gini-free
   * quick ratio head_share/fraction (1 = perfectly uniform).
   *
   * Scale shape: one key-keyed sum (map-side combined) → EXACT
   * distributed ranking over keys via [[Ranking.withGlobalRank]] (one
   * range shuffle of (key, double) rows + a ≤ 256-row offset stitch —
   * no single-task global sort, safe at 10⁸-10⁹ keys) → one scalar
   * aggregate. Share is 4dp (fold-order ulps on the double sums).
   *
   * Returns (`n_keys`, `head_keys`, `head_share`, `concentration`).
   */
  def paretoReport(df: DataFrame, keyCol: String, valueCol: String,
                   fraction: Double = 0.1): DataFrame = {
    require(fraction > 0 && fraction < 1, "fraction must be in (0, 1)")
    // exact rational cutoff: fraction as num/10⁶. ceil of the DOUBLE
    // product hits binary-FP knife edges — 70 · 0.1 = 7.000000000000001,
    // so ceil = 8 and the "top 10%" head quietly includes one extra key
    // over the documented ⌈fraction·n⌉. Integer arithmetic is exact;
    // fractions must be expressible to 6 decimal places (checked — a
    // silently quantized 1/3 would be a different report than asked for).
    val den = 1000000L
    val num = math.round(fraction * den)
    require(math.abs(num.toDouble / den - fraction) < 1e-12,
      s"fraction must be expressible in 6 decimal places; got $fraction")
    // (n·num + den−1) div den: t − t%den is a den-multiple, and both it
    // and the integer quotient are exactly double-representable while
    // n·num < 2⁵³ (n ≤ ~9·10⁹ keys — beyond any key cardinality here)
    def ceilFrac(n: Column): Column = {
      val t = n * lit(num) + lit(den - 1)
      ((t - pmod(t, lit(den))) / lit(den)).cast("long")
    }
    val sums = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol).as("k"))
      .agg(sum(col(valueCol).cast("double")).as("v"))
    val ranked = Ranking.withGlobalRank(sums,
      Seq(col("v").desc, col("k").asc), "rn", "n")
    ranked.agg(max("n").as("n_keys"),
        ceilFrac(max("n")).as("head_keys"),
        sum("v").as("__total"),
        sum(when(col("rn") <= ceilFrac(col("n")), col("v")))
          .as("__head"))
      .select(col("n_keys"), col("head_keys"),
        round(col("__head") / col("__total"), 4).as("head_share"),
        round((col("__head") / col("__total")) / fraction, 4)
          .as("concentration"))
  }

  /**
   * Interval coverage report (uptime / activity accounting): per key,
   * merge possibly-overlapping [start, end) intervals into disjoint
   * islands (the gaps-and-islands pattern) and report covered time,
   * observed span, coverage ratio, island count, and the longest gap —
   * the monitoring summary behind SLA accounting and user-activity
   * coverage. Degenerate intervals (end ≤ start) are dropped up front
   * (a zero-length interval covers nothing; a negative one is noise).
   *
   * Determinism: islands form under (start, end)-ordered running-max
   * ends — a total order given the input intervals are distinct per
   * key (duplicates merge into the same island regardless).
   *
   * Scale shape: ONE key-partitioned (start, end)-ordered window
   * (running max of end over preceding rows marks island starts +
   * running sum numbers them), then a (key, island)-keyed aggregate
   * and a key-keyed rollup — rows carry (key, long, long). The
   * per-key sort is the inherent cost of interval merging. All
   * arithmetic is exact long math; the coverage ratio is one
   * long/long→double division, IEEE-identical cross-engine.
   *
   * Returns (`key`, `covered_ns`, `span_ns`, `coverage`, `n_islands`,
   * `longest_gap_ns` — 0 for a single island).
   */
  def intervalCoverage(intervals: DataFrame, keyCol: String,
                       startCol: String, endCol: String): DataFrame = {
    val iv = intervals.select(col(keyCol).as("key"),
        col(startCol).cast("long").as("s"), col(endCol).cast("long").as("e"))
      .filter(col("e") > col("s"))
    val w = Window.partitionBy("key").orderBy(col("s"), col("e"))
    val flagged = iv
      .withColumn("prev_max_e",
        max("e").over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_island",
        when(col("prev_max_e").isNull || col("s") > col("prev_max_e"), 1)
          .otherwise(0))
      .withColumn("gap",
        when(col("new_island") === 1 && col("prev_max_e").isNotNull,
          col("s") - col("prev_max_e")).otherwise(lit(0L)))
      .withColumn("island",
        sum("new_island").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    val islands = flagged.groupBy("key", "island")
      .agg(min("s").as("is"), max("e").as("ie"), max("gap").as("gap"))
    islands.groupBy("key")
      .agg(sum(col("ie") - col("is")).as("covered_ns"),
        (max("ie") - min("is")).as("span_ns"),
        count(lit(1)).as("n_islands"),
        max("gap").as("longest_gap_ns"))
      .select(col("key"), col("covered_ns"), col("span_ns"),
        (col("covered_ns").cast("double") / col("span_ns")).as("coverage"),
        col("n_islands"), col("longest_gap_ns"))
  }

  /**
   * RFM customer segmentation (recency / frequency / monetary quintile
   * scores — the classic value-segmentation every CRM pipeline runs):
   * per user over their `conversionType` events, R = time since last
   * conversion (against the corpus max event time, so the score is a
   * pure function of the data), F = conversion count, M = summed value;
   * each dimension scored 1..`nTiles` by `ntile` with 5 = best
   * (most recent / most frequent / highest value).
   *
   * Determinism: every tile orders on (metric, user) — a total
   * order, so equal metrics split identically cross-engine (the
   * larger-buckets-first fill implemented by [[Ranking.ntileFromRank]]
   * is the SQL-standard ntile rule both engines implement).
   *
   * Scale shape: one user-keyed aggregate builds the metric frame
   * (keys + 3 numbers); all three tiles come from ONE exact
   * distributed ranking pass ([[Ranking.withGlobalRank]] over the
   * 3×-melted frame — a range shuffle plus a ≤ 256-row offset stitch,
   * never an unpartitioned window) and one user-keyed regroup, so the
   * report survives 10⁸-10⁹ converting users (the old three global
   * `ntile` windows each funneled every user through one task's
   * sort). Returns (`user`, `r_ns`, `f`, `m` 2dp, `r_score`,
   * `f_score`, `m_score`).
   */
  def rfmSegments(events: DataFrame, userCol: String, typeCol: String,
                  tsCol: String, valueCol: String, conversionType: String,
                  nTiles: Int = 5): DataFrame = {
    require(nTiles >= 2, "nTiles must be >= 2")
    val ev = events.select(col(userCol).as("user"), col(typeCol).as("ty"),
      col(tsCol).cast("long").as("ts"), col(valueCol).cast("double").as("v"))
    val maxRow = ev.agg(max("ts")).head()
    require(!maxRow.isNullAt(0),
      "rfmSegments needs at least one event with a non-null timestamp " +
        "(recency is measured against the frame's max timestamp)")
    val maxTs = maxRow.getLong(0)
    // cut the metric frame: the range partitioner's boundary sampling
    // and the shuffle write would otherwise each re-run the events
    // aggregation (2× the dominant scan)
    val m = graft.core.LineageCut.cut(ev.filter(col("ty") === conversionType)
      .groupBy("user")
      .agg((lit(maxTs) - max("ts")).as("r_ns"),
        count(lit(1)).as("f"), round(sum("v"), 2).as("m")))
    // ONE ranking pass for all three tiles: melt each user to three
    // (dim, key) rows whose composite order (dim, rk, fk, mk, user)
    // restricts to exactly (metric, user) within each dim — r_ns desc
    // becomes -r_ns asc (long negation, exact), inactive dims pin
    // their key columns to constants. Each dim then owns a contiguous
    // rank block of `users` rows, so rank-within-dim = rank − dim·users
    // and one ntileFromRank per dim finishes the scores. Three
    // separate withNtile passes cost 3× the (sample + cut) fixed jobs
    // — measured 3.2 s at sf0.1 vs ~1.2 s for this shape.
    val melted = m.select(col("user"), col("r_ns"), col("f"), col("m"),
        explode(array(lit(0L), lit(1L), lit(2L))).as("dim"))
      .withColumn("rk",
        when(col("dim") === 0, -col("r_ns")).otherwise(lit(0L)))
      .withColumn("fk",
        when(col("dim") === 1, col("f")).otherwise(lit(0L)))
      .withColumn("mk",
        when(col("dim") === 2, col("m")).otherwise(lit(0.0)))
    val ranked = Ranking.withGlobalRank(melted,
      Seq(col("dim").asc, col("rk").asc, col("fk").asc, col("mk").asc,
        col("user").asc),
      "rank", "n3")
    val users = ((col("n3") - pmod(col("n3"), lit(3L))) / 3).cast("long")
    val score = Ranking.ntileFromRank(
      col("rank") - col("dim") * users, users, nTiles)
    ranked.withColumn("score", score)
      .groupBy("user")
      .agg(max("r_ns").as("r_ns"), max("f").as("f"), max("m").as("m"),
        max(when(col("dim") === 0, col("score"))).as("r_score"),
        max(when(col("dim") === 1, col("score"))).as("f_score"),
        max(when(col("dim") === 2, col("score"))).as("m_score"))
  }

  /**
   * Top-k session paths: gap-sessionize each user's event stream
   * (a new session opens when the inter-event gap exceeds `gapNs`),
   * render each session as its ordered `>`-joined event-type path,
   * and count path frequencies — "what do users actually do"
   * navigation mining, the report behind funnel DESIGN (funnels test
   * a hypothesized path; this surfaces the real ones).
   *
   * Determinism: event order inside a session is (ts, id) — a total
   * order — and the top-k ranks on (count desc, path asc).
   *
   * Scale shape: ONE user-partitioned (ts, id)-ordered window
   * evaluated for lag (gap flag) and running-sum (session id) —
   * shared exchange+sort; then a (user, session)-keyed aggregate
   * builds each path from its own session's events only (never a
   * per-user collect), and a path-keyed count reduces map-side.
   * Top-k is `TakeOrderedAndProject`. Paths are bounded by session
   * length — the same bound any sessionizer carries.
   *
   * Returns k rows: (`path`, `sessions`).
   */
  def sessionPaths(events: DataFrame, userCol: String, typeCol: String,
                   tsCol: String, idCol: String, gapNs: Long,
                   k: Int): DataFrame = {
    require(gapNs > 0, "gapNs must be positive")
    require(k >= 1, "k must be >= 1")
    val ev = events.select(col(userCol).as("u"), col(typeCol).as("ty"),
      col(tsCol).cast("long").as("ts"), col(idCol).cast("long").as("eid"))
    val w = Window.partitionBy("u").orderBy(col("ts"), col("eid"))
    val flagged = ev.withColumn("ns",
      when(lag("ts", 1).over(w).isNull ||
        col("ts") - lag("ts", 1).over(w) > gapNs, 1).otherwise(0))
    val sess = flagged.withColumn("sid",
      sum("ns").over(w.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)))
    val paths = sess.groupBy("u", "sid")
      .agg(concat_ws(">",
        transform(
          array_sort(collect_list(struct(col("ts"), col("eid"), col("ty")))),
          x => x.getField("ty"))).as("path"))
    paths.groupBy("path").agg(count(lit(1)).as("sessions"))
      .orderBy(col("sessions").desc, col("path").asc)
      .limit(k)
  }

  /**
   * Slowly-changing-dimension (type 2) interval build from a change
   * log: per entity, order observations by time, DROP rows whose
   * tracked attribute equals the previous row's (no-op updates create
   * no version), and emit validity intervals — `valid_from` = the
   * change's time, `valid_to` = the next change's time (null = still
   * current), plus an `is_current` flag. The standard
   * dimension-history build every warehouse load runs.
   *
   * Determinism: per-entity order is (ts, id), a total order; under
   * equal timestamps the larger id wins as "later", same as the oracle.
   *
   * Scale shape: ONE entity-partitioned window evaluated twice (`lag`
   * to detect changes, then `lead` on the filtered rows for interval
   * ends) — both windows share the same partitioning and ordering, so
   * Catalyst plans one exchange + sort and reuses it; rows carry
   * (entity, ts, id, attr) only. Entities are the natural partition
   * key at any scale; per-entity history length bounds the sort run.
   *
   * Returns (`entity`, `attr`, `valid_from`, `valid_to`, `is_current`).
   */
  def scd2Intervals(changes: DataFrame, entityCol: String, tsCol: String,
                    idCol: String, attrCol: String): DataFrame = {
    val ev = changes.select(col(entityCol).as("entity"),
      col(tsCol).cast("long").as("ts"), col(idCol).cast("long").as("eid"),
      col(attrCol).as("attr"))
    val w = Window.partitionBy("entity").orderBy(col("ts"), col("eid"))
    val changed = ev.withColumn("prev", lag("attr", 1).over(w))
      // null-safe change detection (IS DISTINCT FROM): the first row per
      // entity opens a version iff its attr is non-null (prev is null
      // there, so a null attr compares null-safe-equal and is dropped —
      // "no version for an unknown value"); null→value and value→null
      // are real changes
      .filter(!(col("prev") <=> col("attr")))
    changed.withColumn("valid_to", lead("ts", 1).over(w))
      .select(col("entity"), col("attr"), col("ts").as("valid_from"),
        col("valid_to"),
        col("valid_to").isNull.as("is_current"))
  }

  /**
   * Frequent contiguous event sequences (sequential k-gram mining —
   * the contiguous special case of AprioriAll, Agrawal & Srikant
   * 1995): every run of `k` consecutive events per user (ordered by
   * time, event-id tiebreak) becomes a `>`-joined pattern string, and
   * patterns ship with their total occurrence count and distinct-user
   * support. The behavioral-motif companion to [[transitionMatrix]]
   * (bigram probabilities) and [[sessionPaths]] (whole-path strings):
   * "which 3-step flows recur, and across how many users".
   *
   * Determinism: the per-user order is (ts, event id) — a total order
   * — so k-gram extraction is reproducible under timestamp ties.
   * Event types must not contain the `>` separator (unchecked — the
   * pattern is a display string, not a parse format).
   *
   * Scale shape: ONE user-partitioned (ts, id)-ordered window carries
   * all k−1 `lead`s (one sort, the inherent per-user-sequence cost —
   * never global), then a map-side-combined pattern aggregate;
   * distinct-user support is a two-level (pattern, user) aggregate.
   * Rows carry (user, k strings). Per-user sequence length bounds the
   * window task, same class as [[sessionPaths]].
   *
   * Returns one row per pattern with user support ≥ `minSupport`:
   * (`pattern`, `n_occurrences`, `n_users`).
   */
  def sequentialPatterns(events: DataFrame, userCol: String,
                         typeCol: String, tsCol: String, idCol: String,
                         k: Int = 3, minSupport: Long = 2L): DataFrame = {
    require(k >= 2, "k must be >= 2 (a 1-gram is tokenFrequencies)")
    require(minSupport >= 1, "minSupport must be >= 1")
    val base = events
      .filter(col(userCol).isNotNull && col(typeCol).isNotNull &&
        col(tsCol).isNotNull)
      .select(col(userCol).as("user"), col(typeCol).cast("string").as("ty"),
        col(tsCol).cast("long").as("ts"), col(idCol).as("eid"))
    val w = Window.partitionBy("user").orderBy(col("ts"), col("eid"))
    val led = (1 until k).foldLeft(base) { (d, i) =>
      d.withColumn(s"ty$i", lead("ty", i).over(w))
    }
    val pats = led
      .filter((1 until k).map(i => col(s"ty$i").isNotNull).reduce(_ && _))
      .select(col("user"), concat_ws(">",
        col("ty") +: (1 until k).map(i => col(s"ty$i")): _*).as("pattern"))
    val grouped = pats.groupBy("pattern", "user")
      .agg(count(lit(1)).as("c"))
    grouped.groupBy("pattern")
      .agg(sum("c").as("n_occurrences"), count(lit(1)).as("n_users"))
      .filter(col("n_users") >= minSupport)
  }

  /**
   * Shared fail-loud level-cardinality gate for the survival trio
   * ([[kaplanMeier]] / [[logRankTest]] / [[nelsonAalen]]) — the house
   * convention ([[fisherExactTest]]'s `maxSupport` twenty lines below;
   * [[graft.operators.Profiling]]'s spearmanMatrix `maxLevels`): all
   * three estimators run `Window.orderBy("t")` over the distinct-
   * duration LEVEL frame, an unpartitioned single-task window that is
   * bounded ONLY when durations are quantized. This guard cuts the
   * level aggregate's lineage (one map-side-combined agg — the count
   * job is keys-only and fully parallel; the cut frame then feeds the
   * window job without a rescan), counts it, and refuses to plan the
   * window past `maxLevels`, with the quantize-upstream escape in the
   * message. Default 10⁷ levels: far above any day/hour-quantized
   * duration domain, far below the 10⁸ cliff the docs warn about.
   */
  private def guardedSurvivalLevels(levels: DataFrame, op: String,
                                    maxLevels: Long): DataFrame = {
    require(maxLevels >= 1, s"maxLevels must be >= 1: $maxLevels")
    val cut = levels.lineageCut()
    val n = cut.count()
    require(n <= maxLevels,
      s"$op: $n distinct duration levels exceeds maxLevels=$maxLevels — " +
        "the ordered survival window runs over the level frame in ONE " +
        "task at this cardinality; quantize durations upstream (bucket " +
        "to days/hours) or raise maxLevels deliberately")
    cut
  }

  /**
   * Kaplan-Meier product-limit survival estimator (Kaplan & Meier
   * 1958) — THE retention/churn curve with right-censoring done
   * correctly: a user who simply hasn't converted/churned YET
   * (censored) still counts in the at-risk denominator up to their
   * observation end, where naive "conversion by day t" curves throw
   * them away and bias the estimate. Input: one row per subject with
   * an integer `durationCol` (time observed) and boolean `eventCol`
   * (true = the event happened at that time; false = censored there).
   *
   * EXACTNESS: rows collapse to per-duration LEVELS (d_t events,
   * all_t leaving) — exact longs; the at-risk count n_t = N − (rows
   * with shorter duration) is an exclusive running sum over levels
   * (ordered, deterministic); each factor 1 − d/n is one IEEE
   * division; the PRODUCT runs as exp(Σ ln factor) with the Σ a
   * RUNNING window fold in duration order — a sequential left fold in
   * both engines — and a d = n level (survival hits exactly 0) routes
   * through a running zero-flag instead of ln(0) (DuckDB raises on
   * ln(0); Spark returns NULL — the flag is the one portable form).
   * `survival` rounds 6dp.
   *
   * Scale shape: one map-side-combined level aggregate; the window
   * runs over LEVELS (distinct durations), never rows — and that
   * cardinality is now ENFORCED, not just documented: `maxLevels`
   * fails loud (see [[guardedSurvivalLevels]]) before the
   * unpartitioned window is ever planned, because a continuous /
   * ns-resolution duration column makes the level frame row-sized and
   * would move the whole dataset through ONE window task. Quantize
   * durations upstream (bucket to days/hours) or raise `maxLevels`
   * deliberately. Returns one row per EVENT time (d_t > 0, the
   * standard KM step points): (`t`, `n_risk`, `n_events`, `survival`).
   */
  def kaplanMeier(df: DataFrame, durationCol: String,
                  eventCol: String,
                  maxLevels: Long = 10000000L): DataFrame = {
    val base = df
      .filter(col(durationCol).isNotNull && col(eventCol).isNotNull)
      .select(col(durationCol).cast("long").as("t"),
        col(eventCol).cast("boolean").as("ev"))
    val levels = guardedSurvivalLevels(base.groupBy("t").agg(
      sum(when(col("ev"), 1L).otherwise(0L)).as("d"),
      count(lit(1)).as("all")), "kaplanMeier", maxLevels)
    val wPrev = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wRun = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val atRisk = levels
      .withColumn("n_risk",
        sum("all").over(wTot) - coalesce(sum("all").over(wPrev), lit(0L)))
    val factor = lit(1.0) -
      col("d").cast("double") / col("n_risk").cast("double")
    val stepped = atRisk
      .withColumn("__lnf",
        when(col("d") === col("n_risk"), lit(0.0)).otherwise(log(factor)))
      .withColumn("__zero",
        max(when(col("d") === col("n_risk"), 1L).otherwise(0L)).over(wRun))
      .withColumn("__lnsum", sum(col("__lnf")).over(wRun))
    stepped.filter(col("d") > 0L)
      .select(col("t"), col("n_risk"), col("d").as("n_events"),
        when(col("__zero") === 1L, lit(0.0))
          .otherwise(round(exp(col("__lnsum")), 6)).as("survival"))
  }

  /**
   * Kaplan-Meier curve WITH Greenwood confidence intervals (Greenwood
   * 1926) — [[kaplanMeier]] plus the variance every published survival
   * curve draws: Var(Ŝ(t)) = Ŝ(t)² · Σ_{s ≤ t} d/(n(n−d)), se = √Var,
   * and the PLAIN linear 95%-style interval Ŝ ± z·se clipped to [0, 1]
   * (stated — the log-log transform is a different, also-defensible
   * interval; the linear Greenwood form is the textbook default and
   * the one with a fixed replayable arithmetic chain). At and after a
   * d = n level Ŝ = 0 and Greenwood's sum is undefined (division by
   * n − d = 0): `se`/`ci_lo`/`ci_hi` report NULL there (stated).
   *
   * EXACTNESS: the [[kaplanMeier]] level machinery verbatim (exact
   * long levels, exclusive at-risk sums, running ln fold), with ONE
   * more running fold Σ d/(n(n−d)) in duration order (each term a
   * fixed IEEE chain from exact longs); se is one multiply + one sqrt
   * from the two folds; the CI bounds are single chains from the
   * UNROUNDED Ŝ and se. Everything rounds 6dp at the very end. z is a
   * caller literal (default 1.96, the conventional 95% quantile —
   * documented constant, the [[oddsRiskRatio]] precedent).
   *
   * Scale shape: identical to [[kaplanMeier]] — one level aggregate,
   * running windows over LEVELS under the same enforced `maxLevels`
   * gate. One row per event time: (`t`, `n_risk`, `n_events`,
   * `survival`, `se`, `ci_lo`, `ci_hi`).
   */
  def kaplanMeierCI(df: DataFrame, durationCol: String, eventCol: String,
                    z: Double = 1.96,
                    maxLevels: Long = 10000000L): DataFrame = {
    require(z > 0.0, s"z must be > 0: $z")
    val base = df
      .filter(col(durationCol).isNotNull && col(eventCol).isNotNull)
      .select(col(durationCol).cast("long").as("t"),
        col(eventCol).cast("boolean").as("ev"))
    val levels = guardedSurvivalLevels(base.groupBy("t").agg(
      sum(when(col("ev"), 1L).otherwise(0L)).as("d"),
      count(lit(1)).as("all")), "kaplanMeierCI", maxLevels)
    val wPrev = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wRun = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val atRisk = levels
      .withColumn("n_risk",
        sum("all").over(wTot) - coalesce(sum("all").over(wPrev), lit(0L)))
    val factor = lit(1.0) -
      col("d").cast("double") / col("n_risk").cast("double")
    val gwTerm = when(col("d") === col("n_risk"), lit(0.0)).otherwise(
      col("d").cast("double") /
        (col("n_risk").cast("double") *
          (col("n_risk") - col("d")).cast("double")))
    val stepped = atRisk
      .withColumn("__lnf",
        when(col("d") === col("n_risk"), lit(0.0)).otherwise(log(factor)))
      .withColumn("__zero",
        max(when(col("d") === col("n_risk"), 1L).otherwise(0L)).over(wRun))
      .withColumn("__lnsum", sum(col("__lnf")).over(wRun))
      .withColumn("__gw", sum(gwTerm).over(wRun))
    val s = exp(col("__lnsum"))
    val se = s * sqrt(col("__gw"))
    stepped.filter(col("d") > 0L)
      .select(col("t"), col("n_risk"), col("d").as("n_events"),
        when(col("__zero") === 1L, lit(0.0))
          .otherwise(round(s, 6)).as("survival"),
        when(col("__zero") === 1L, lit(null).cast("double"))
          .otherwise(round(se, 6)).as("se"),
        when(col("__zero") === 1L, lit(null).cast("double"))
          .otherwise(round(greatest(lit(0.0), s - lit(z) * se), 6))
          .as("ci_lo"),
        when(col("__zero") === 1L, lit(null).cast("double"))
          .otherwise(round(least(lit(1.0), s + lit(z) * se), 6))
          .as("ci_hi"))
  }

  /**
   * Restricted mean survival time (Royston & Parmar 2013's
   * recommended reporting summary; Irwin 1949) — the area under the
   * [[kaplanMeier]] step curve up to a caller horizon τ: "the average
   * event-free time over the next τ units", the one survival summary
   * that stays defined under heavy censoring (the plain mean is not)
   * and compares arms without the proportional-hazards assumption.
   *
   * EXACTNESS: the KM level machinery verbatim; the integral of a
   * step function is the exact sum Σ Ŝ(t_{i−1})·(t_i − t_{i−1}) over
   * event times ≤ τ plus the tail Ŝ(t_last)·(τ − t_last), with
   * Ŝ(t_0 = 0) = 1 — each segment one IEEE multiply of the UNROUNDED
   * running-fold Ŝ by an exact long width, accumulated as a RUNNING
   * window fold in duration order (sequential in both engines, the
   * kaplanMeier convention), rounded 6dp once at the end. No event
   * time ≤ τ ⇒ RMST = τ exactly (Ŝ = 1 throughout).
   *
   * Scale shape: one level aggregate + ordered windows over LEVELS
   * (same enforced `maxLevels` gate), one single-row rollup. Output
   * one row: (`tau`, `n`, `rmst`).
   */
  def restrictedMeanSurvival(df: DataFrame, durationCol: String,
                             eventCol: String, tau: Long,
                             maxLevels: Long = 10000000L): DataFrame = {
    require(tau > 0L, s"tau must be > 0: $tau")
    val base = df
      .filter(col(durationCol).isNotNull && col(eventCol).isNotNull)
      .select(col(durationCol).cast("long").as("t"),
        col(eventCol).cast("boolean").as("ev"))
    val levels = guardedSurvivalLevels(base.groupBy("t").agg(
      sum(when(col("ev"), 1L).otherwise(0L)).as("d"),
      count(lit(1)).as("all")), "restrictedMeanSurvival", maxLevels)
    val wPrev = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wRun = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val atRisk = levels
      .withColumn("n_risk",
        sum("all").over(wTot) - coalesce(sum("all").over(wPrev), lit(0L)))
    val factor = lit(1.0) -
      col("d").cast("double") / col("n_risk").cast("double")
    val stepped = atRisk
      .withColumn("__lnf",
        when(col("d") === col("n_risk"), lit(0.0)).otherwise(log(factor)))
      .withColumn("__zero",
        max(when(col("d") === col("n_risk"), 1L).otherwise(0L)).over(wRun))
      .withColumn("__lnsum", sum(col("__lnf")).over(wRun))
    // step points inside the horizon; windows re-order over this
    // filtered frame (still LEVEL-sized)
    val wOrd = Window.orderBy("t")
    val wRun2 = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot2 = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val steps = stepped.filter(col("d") > 0L && col("t") <= tau)
      .withColumn("__s",
        when(col("__zero") === 1L, lit(0.0)).otherwise(exp(col("__lnsum"))))
      .withColumn("__sprev", coalesce(lag(col("__s"), 1).over(wOrd), lit(1.0)))
      .withColumn("__tprev", coalesce(lag(col("t"), 1).over(wOrd), lit(0L)))
      .withColumn("__run",
        sum(col("__sprev") * (col("t") - col("__tprev")).cast("double"))
          .over(wRun2))
      .withColumn("__rn", row_number().over(wOrd))
      .withColumn("__nm", count(lit(1)).over(wTot2))
    val last = steps.filter(col("__rn") === col("__nm"))
      .select((col("__run") +
        col("__s") * (lit(tau) - col("t")).cast("double")).as("__rmst"))
      // force exactly one row (null when no step point <= tau) — the
      // krippendorffAlpha dObs convention
      .agg(max("__rmst").as("__rmst"))
    levels.agg(coalesce(sum("all"), lit(0L)).as("n")).crossJoin(last)
      .select(lit(tau).as("tau"), col("n"),
        when(col("n") > 0L,
          round(coalesce(col("__rmst"), lit(tau.toDouble)), 6))
          .as("rmst"))
  }

  /**
   * Cochran's Q test for k matched binary treatments (Cochran 1950) —
   * the repeated-measures extension of McNemar past two conditions:
   * given one row per subject and k boolean outcome columns (did the
   * user view / click / purchase; did a doc pass filter A / B / C),
   * tests whether the k success rates differ when every subject is
   * its own control. NULL outcomes count as failure (stated — the
   * complete-block design needs a value everywhere).
   *
   * EXACTNESS: Q = (k−1)·(k·ΣG_j² − T²) / (k·ΣL_i − ΣL_i²) is a ratio
   * of EXACT INTEGERS — column totals G_j, row-sum moments ΣL, ΣL²
   * from ONE aggregate (L² ≤ k² so plain longs suffice; ΣG² widens to
   * decimal before summing the k squares in column order) — then ONE
   * IEEE division, 4dp. Degenerate denominator (every subject all-
   * success or all-failure) reports NULL q. df = k−1 ships alongside.
   *
   * Scale shape: one map-side-combined aggregate to one row. Nothing
   * else moves.
   */
  def cochranQ(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two outcome columns")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in the frame: $missing")
    val k = cols.size
    val base = df.select(cols.zipWithIndex.map { case (c, i) =>
      when(col(c).cast("boolean") <=> lit(true), 1L).otherwise(0L)
        .as(s"__x$i")
    }: _*)
      .withColumn("__l", cols.indices.map(i => col(s"__x$i"))
        .reduceLeft(_ + _))
    val aggs = cols.indices.map(i => sum(s"__x$i").as(s"__g$i")) ++
      Seq(sum("__l").as("__t"), sum(col("__l") * col("__l")).as("__l2"),
        count(lit(1)).as("__n"))
    val mom = base.agg(aggs.head, aggs.tail: _*)
    val sumG2 = cols.indices.map(i =>
      col(s"__g$i").cast("decimal(38,0)") * col(s"__g$i"))
      .reduceLeft(_ + _)
    val num = (lit(k.toLong) * sumG2 -
      col("__t").cast("decimal(38,0)") * col("__t")).cast("double")
    val den = (lit(k.toLong) * col("__t") - col("__l2")).cast("double")
    mom.select(col("__n").as("n"), lit(k - 1).as("df"),
      when(den > 0d, round(lit((k - 1).toDouble) * num / den, 4))
        .as("q"))
  }

  /**
   * Two-sample log-rank test (Mantel 1966; Peto & Peto 1972) — the
   * significance companion to [[kaplanMeier]]: do two survival curves
   * differ, counting censored subjects correctly? Rows where
   * `groupCol = groupA` form arm A; every other non-null group is arm
   * B (the same one-vs-rest convention as
   * [[Profiling.cliffsDelta]]). At each distinct EVENT time t the
   * observed arm-A events d_At are compared to the hypergeometric
   * expectation d_t·n_At/n_t given the at-risk counts, and
   * χ² = (O_A − E_A)² / V with V the sum of per-time hypergeometric
   * variances d·(n_A/n)·(n_B/n)·(n−d)/(n−1).
   *
   * EXACTNESS: rows collapse to per-duration LEVELS of exact longs
   * (d_At, d_Bt, leaving_At, leaving_Bt); at-risk counts are exclusive
   * running sums over the ordered level frame (deterministic); each
   * E/V term is one IEEE chain from exact integers, the level terms
   * sum in ONE aggregate, and — so both engines build χ² from the same
   * 4dp quantities — `e_a` and `variance` are ROUNDED FIRST and χ²
   * computed from the rounded values (stated; the alternative of
   * rounding only χ² leaves the comparison hostage to last-ulp
   * summation-order drift amplified by the square). Levels with
   * n_t = 1 contribute zero variance (the n−1 guard).
   *
   * Scale shape: one level aggregate (map-side combined), two ordered
   * windows over LEVELS (distinct durations — `maxLevels` ENFORCES the
   * bound via [[guardedSurvivalLevels]] before the unpartitioned
   * windows are planned; quantize upstream past it), one single-row
   * rollup. Output:
   * one row (`n_a`, `n_b`, `o_a`, `e_a`, `variance`, `chi2`, `df`).
   */
  def logRankTest(df: DataFrame, durationCol: String, eventCol: String,
                  groupCol: String, groupA: String,
                  maxLevels: Long = 10000000L): DataFrame = {
    val base = df
      .filter(col(durationCol).isNotNull && col(eventCol).isNotNull &&
        col(groupCol).isNotNull)
      .select(col(durationCol).cast("long").as("t"),
        col(eventCol).cast("boolean").as("ev"),
        (col(groupCol).cast("string") === lit(groupA)).as("ga"))
    val levels = guardedSurvivalLevels(base.groupBy("t").agg(
      sum(when(col("ga") && col("ev"), 1L).otherwise(0L)).as("da"),
      sum(when(!col("ga") && col("ev"), 1L).otherwise(0L)).as("db"),
      sum(when(col("ga"), 1L).otherwise(0L)).as("la"),
      sum(when(!col("ga"), 1L).otherwise(0L)).as("lb")),
      "logRankTest", maxLevels)
    val wPrev = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val atRisk = levels
      .withColumn("n_a_tot", sum("la").over(wTot))
      .withColumn("n_b_tot", sum("lb").over(wTot))
      .withColumn("na",
        col("n_a_tot") - coalesce(sum("la").over(wPrev), lit(0L)))
      .withColumn("nb",
        col("n_b_tot") - coalesce(sum("lb").over(wPrev), lit(0L)))
    val n = (col("na") + col("nb")).cast("double")
    val d = (col("da") + col("db")).cast("double")
    val eTerm = d * col("na").cast("double") / n
    val vTerm = when(col("na") + col("nb") > 1L,
      d * (col("na").cast("double") / n) * (col("nb").cast("double") / n) *
        ((n - d) / (n - lit(1.0)))).otherwise(lit(0.0))
    val mom = atRisk.filter(col("da") + col("db") > 0L).agg(
      max("n_a_tot").as("n_a"),
      max("n_b_tot").as("n_b"),
      sum("da").as("o_a"),
      round(sum(eTerm), 4).as("e_a"),
      round(sum(vTerm), 4).as("variance"))
    mom.select(col("n_a"), col("n_b"), col("o_a"), col("e_a"),
      col("variance"),
      when(col("variance") > 0d,
        round((col("o_a").cast("double") - col("e_a")) *
          (col("o_a").cast("double") - col("e_a")) / col("variance"), 4))
        .as("chi2"),
      lit(1).as("df"))
  }

  /**
   * 2×2 association effect sizes with Wald intervals: odds ratio
   * (Woolf 1955 log-interval) and risk ratio (Katz et al. 1978) from
   * two boolean columns — the epidemiology-style readout of an A/B
   * exposure/outcome table, complementing [[graft.operators
   * .Profiling]]'s significance tests (χ²/McNemar say WHETHER the
   * margins associate; this says HOW MUCH, with uncertainty). NULL in
   * either column drops the row (stated).
   *
   * EXACTNESS: one aggregate to four exact long cells; every derived
   * value is a single fixed IEEE chain from those integers, rounded
   * 6dp. The interval z is the LITERAL 1.96 (the conventional 95%
   * normal quantile — documented constant, not a computed quantile).
   * Any zero cell makes the ratios/intervals NULL rather than applying
   * a continuity correction silently (stated; callers who want
   * Haldane-Anscombe +0.5 can add it upstream).
   *
   * Scale shape: one map-side-combined aggregate to ONE row; no
   * shuffle wider than four longs.
   */
  /**
   * First-order Markov-chain attribution with removal effects (Anderl
   * et al. 2014, "Mapping the customer journey") — the data-driven
   * answer to last-touch bias: journeys become a Markov chain
   * START → channels → {CONV, NULL}, and a channel's credit is its
   * REMOVAL EFFECT — how much absorption probability into CONV drops
   * when every edge into that channel redirects to NULL — normalized
   * across channels into attribution shares. [[attribution]]'s
   * rule-based models (first/last/linear) answer "who touched";
   * this answers "who was CAUSALLY load-bearing in the graph".
   *
   * Journey construction (stated): per user, events of the given
   * channel types plus `conversionType` order by (ts, id); the path
   * truncates at the FIRST conversion (→ CONV) or runs to the end
   * (→ NULL); transitions are START→first touch, touch→touch,
   * last-touch-or-START→{CONV, NULL}. Event types outside
   * channels+conversion are ignored.
   *
   * EXACTNESS: the DISTRIBUTED work is one transition-count aggregate
   * (exact longs over a (K+2)²-bounded state space); each transition
   * probability is ONE division of exact longs; the absorption system
   * (I − A)v = b solves EXACTLY by driver-side Gaussian elimination in
   * FIXED pivot order (no magnitude pivoting — I − A of a substochastic
   * chain is an M-matrix, the natural diagonal never vanishes while
   * the chain can convert), every update m_ij − (m_ik/m_kk)·m_kj and
   * every back-substitution fold a PINNED left-assoc chain — the
   * fellegiSunterEM determinism contract, so the GENERATED
   * elimination-CTE oracle replays the arithmetic bit-for-bit. K+1
   * scenarios solve (full + each channel removed; removal zeroes the
   * p(·→c) terms — redirect-to-NULL); outputs round 6dp at the end
   * only.
   *
   * Scale shape: journeys need one user-keyed window pass + one
   * count aggregate; the driver holds (K+2)² longs and runs
   * O(K³·(K+1)) flops — `channels.size` ≤ 64 enforced, so the
   * solve is microseconds regardless of corpus size. Nothing
   * row-proportional ever reaches the driver.
   *
   * Returns one row per channel (ascending): (`channel`,
   * `removal_effect`, `attribution`, `p_conv` — the full-chain
   * conversion probability, identical on every row; all NULL when the
   * chain never converts).
   */
  /** Shared journey → transition-count collection for the chain-based
    * attribution operators: one window pass, one count aggregate,
    * (K+2)²-bounded collect. See [[markovAttribution]] for the journey
    * semantics (truncate at FIRST conversion; START/CONV/NULL pads). */
  private def journeyCounts(df: DataFrame, userCol: String,
                            typeCol: String, tsCol: String, idCol: String,
                            conversionType: String,
                            chs: Seq[String]): Map[(String, String), Long] = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = df
      .filter(col(typeCol).isin((conversionType +: chs).map(x => x: Any): _*) &&
        col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("u"), col(typeCol).cast("string").as("ty"),
        col(tsCol).cast("long").as("ts"), col(idCol).as("eid"))
    val w = Window.partitionBy("u").orderBy(col("ts"), col("eid"))
    val rn = base.withColumn("rn", row_number().over(w))
      .select("u", "ty", "rn")
      .lineageCut()
    val convRn = rn.filter(col("ty") === conversionType)
      .groupBy("u").agg(min("rn").as("crn"))
    val kept = rn.join(convRn, Seq("u"), "left")
      .filter(col("crn").isNull || col("rn") <= col("crn"))
    val touches = kept.filter(col("ty") =!= conversionType)
      .select("u", "ty", "rn")
    val wT = Window.partitionBy("u").orderBy("rn")
    val steps = touches
      .select(col("u"), coalesce(lag("ty", 1).over(wT), lit("START"))
        .as("src"), col("ty").as("dst"))
    val lastTouch = touches.groupBy("u")
      .agg(max(struct(col("rn"), col("ty"))).as("__l"))
      .select(col("u"), col("__l.ty").as("lastTy"))
    val ends = rn.select("u").distinct()
      .join(convRn, Seq("u"), "left")
      .join(lastTouch, Seq("u"), "left")
      .select(coalesce(col("lastTy"), lit("START")).as("src"),
        when(col("crn").isNotNull, lit("CONV")).otherwise(lit("NULL"))
          .as("dst"))
    steps.select("src", "dst").unionByName(ends)
      .groupBy("src", "dst").agg(count(lit(1)).as("c"))
      .as[(String, String, Long)].collect()
      .map { case (s, d, c) => (s, d) -> c }.toMap
  }

  /** Exact absorption probability P(CONV | START) of the counted chain
    * with every edge into a `removed` channel redirected to NULL:
    * Gaussian elimination in FIXED pivot order on (I − A | b) — every
    * arithmetic op mirrored verbatim by the generated SQL oracles
    * (including the no-op updates under the START column, whose A
    * entries are 0). I − A of a substochastic chain is an M-matrix;
    * the natural diagonal never vanishes while the chain can convert. */
  private def absorption(counts: Map[(String, String), Long],
                         chs: Seq[String],
                         removed: Set[String]): Double = {
    val states = "START" +: chs
    def total(s: String): Long =
      (chs ++ Seq("CONV", "NULL")).map(d => counts.getOrElse((s, d), 0L)).sum
    def p(s: String, d: String): Double = {
      val t = total(s)
      if (t == 0L) 0.0 else counts.getOrElse((s, d), 0L).toDouble / t
    }
    def pp(s: String, d: String): Double =
      if (removed.contains(d)) 0.0 else p(s, d)
    val n = states.size
    var m = Array.tabulate(n, n + 1) { (i, j) =>
      if (j == n) pp(states(i), "CONV")
      else {
        val a = if (j == 0) 0.0 else pp(states(i), states(j))
        (if (i == j) 1.0 else 0.0) - a
      }
    }
    var k = 0
    while (k < n - 1) {
      val next = Array.tabulate(n, n + 1) { (i, j) =>
        if (i <= k) m(i)(j)
        else m(i)(j) - (m(i)(k) / m(k)(k)) * m(k)(j)
      }
      m = next
      k += 1
    }
    val v = new Array[Double](n)
    var i = n - 1
    while (i >= 0) {
      var acc = m(i)(n)
      var j = i + 1
      while (j < n) { acc = acc - m(i)(j) * v(j); j += 1 }
      v(i) = acc / m(i)(i)
      i -= 1
    }
    v(0) // START
  }

  def markovAttribution(df: DataFrame, userCol: String, typeCol: String,
                        tsCol: String, idCol: String,
                        conversionType: String,
                        channels: Seq[String]): DataFrame = {
    require(channels.nonEmpty && channels.distinct.size == channels.size,
      "channels must be non-empty and distinct")
    require(channels.size <= 64, s"too many channels: ${channels.size}")
    require(!channels.contains(conversionType),
      "conversionType cannot also be a channel")
    val spark = df.sparkSession
    import spark.implicits._
    val chs = channels.sorted
    val counts = journeyCounts(df, userCol, typeCol, tsCol, idCol,
      conversionType, chs)
    def solve(removed: Option[String]): Double =
      absorption(counts, chs, removed.toSet)
    val pFull = solve(None)
    // !(pFull > 0.0) — not pFull <= 0.0 — so a NaN from a degenerate
    // pivot routes to the documented all-NULL row instead of blowing
    // up inside BigDecimal(NaN) (NaN fails every comparison)
    val rows: Seq[(String, Option[Double], Option[Double], Option[Double])] =
      if (!(pFull > 0.0)) chs.map(c => (c, None, None, None))
      else {
        def r6(x: Double): Option[Double] =
          if (x.isNaN) None
          else Some(BigDecimal(x)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        val res = chs.map(c => c -> (1.0 - solve(Some(c)) / pFull)).toMap
        val reSum = chs.foldLeft(0.0)((acc, c) => acc + res(c))
        chs.map { c =>
          (c, r6(res(c)),
            if (reSum > 0.0) r6(res(c) / reSum) else None,
            r6(pFull))
        }
      }
    rows.toDF("channel", "removal_effect", "attribution", "p_conv")
  }

  /**
   * Shapley-value attribution over the SAME journey chain as
   * [[markovAttribution]] (Shapley 1953 applied to conversion credit —
   * the one attribution scheme with the fairness axioms: efficiency,
   * symmetry, null player): the coalition value v(S) is the chain's
   * conversion probability when only channels in S exist (edges into
   * every other channel redirect to NULL — the removal semantics,
   * applied to the complement), and channel c earns
   * φ_c = Σ_{S ⊆ C\{c}} |S|!(K−|S|−1)!/K! · (v(S ∪ {c}) − v(S)).
   * Removal effects answer "what breaks if c disappears"; Shapley
   * splits the TOTAL lift v(C) − v(∅) fairly across channels
   * (efficiency: Σφ = v(C) − v(∅) exactly, which the spec asserts).
   *
   * EXACTNESS: the distributed work is the one [[journeyCounts]]
   * aggregate; all 2^K coalition values solve by the same fixed-pivot
   * Gaussian elimination ([[absorption]]); Shapley weights render as
   * single divisions of exact factorial integers, and every φ fold is
   * pinned left-assoc over subsets in ASCENDING BITMASK order of the
   * sorted channel list — bit-replayable by the generated oracle.
   * 2^K scenarios bound the work: `channels.size` ≤ 16 enforced
   * (65536 K³ driver solves at the cap — still sub-second; the SQL
   * oracle is only generated for small K fixtures).
   *
   * Returns one row per channel (ascending): (`channel`, `shapley`,
   * `share` = φ/Σφ, `p_conv` = v(C); all NULL when the chain never
   * converts).
   */
  def shapleyAttribution(df: DataFrame, userCol: String, typeCol: String,
                         tsCol: String, idCol: String,
                         conversionType: String,
                         channels: Seq[String]): DataFrame = {
    require(channels.nonEmpty && channels.distinct.size == channels.size,
      "channels must be non-empty and distinct")
    require(channels.size <= 16,
      s"Shapley enumerates 2^K coalitions: K = ${channels.size} > 16")
    require(!channels.contains(conversionType),
      "conversionType cannot also be a channel")
    val spark = df.sparkSession
    import spark.implicits._
    val chs = channels.sorted
    val k = chs.size
    val counts = journeyCounts(df, userCol, typeCol, tsCol, idCol,
      conversionType, chs)
    // v indexed by coalition bitmask over the sorted channels
    val v = (0 until (1 << k)).map { mask =>
      val removed = chs.zipWithIndex
        .filter { case (_, i) => (mask & (1 << i)) == 0 }
        .map(_._1).toSet
      absorption(counts, chs, removed)
    }
    val pFull = v((1 << k) - 1)
    def fact(x: Int): Long = (1 to x).foldLeft(1L)(_ * _)
    // !(pFull > 0.0) catches NaN from a degenerate pivot as well as
    // the never-converts chain — same guard as [[markovAttribution]]
    val rows: Seq[(String, Option[Double], Option[Double], Option[Double])] =
      if (!(pFull > 0.0)) chs.map(c => (c, None, None, None))
      else {
        def r6(x: Double): Option[Double] =
          if (x.isNaN) None
          else Some(BigDecimal(x)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        val phi = chs.zipWithIndex.map { case (c, ci) =>
          val bit = 1 << ci
          val masks = (0 until (1 << k)).filter(m => (m & bit) == 0)
          c -> masks.foldLeft(0.0) { (acc, m) =>
            val s = Integer.bitCount(m)
            val wgt = (fact(s) * fact(k - 1 - s)).toDouble / fact(k).toDouble
            acc + wgt * (v(m | bit) - v(m))
          }
        }.toMap
        val phiSum = chs.foldLeft(0.0)((acc, c) => acc + phi(c))
        chs.map { c =>
          (c, r6(phi(c)),
            if (phiSum > 0.0) r6(phi(c) / phiSum) else None,
            r6(pFull))
        }
      }
    rows.toDF("channel", "shapley", "share", "p_conv")
  }

  /** The deterministic permutation for sampled-Shapley replica `b`:
    * channels sorted by (md5("b:channel") hex, channel) — the
    * [[graft.operators.Profiling.permutationTestMeanDiff]] md5-coin
    * mechanism applied to ordering, so every replica is
    * cross-engine-replicable (the generated oracle calls this SAME
    * function at SQL-generation time; the hex tiebreak on the channel
    * name makes the order total even under digest collisions). */
  def shapleySampleOrder(chs: Seq[String], b: Int): Seq[String] = {
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    chs.sortBy(c => (md5hex(s"$b:$c"), c))
  }

  /**
   * Sampled-permutation Shapley attribution (Castro, Gómez & Tejada
   * 2009, "Polynomial calculation of the Shapley value based on
   * sampling") — [[shapleyAttribution]] past its K ≤ 16 exact-fold
   * cap: real marketing journeys carry 20-50 channels, where 2^K
   * coalition solves are unpayable. The estimator walks `samples`
   * random permutations; a channel's marginal contribution in a
   * permutation is v(prefix ∪ {c}) − v(prefix), and φ̂_c is the mean
   * over samples. EFFICIENCY STILL HOLDS EXACTLY (Σφ̂ = v(C) − v(∅),
   * each permutation's marginals telescope); the per-channel values
   * converge to the exact Shapley at O(1/√samples).
   *
   * EXACTNESS (the house determinism contract, not statistical
   * exactness): the distributed work is the one [[journeyCounts]]
   * aggregate; permutations come from [[shapleySampleOrder]]'s
   * md5-derived total order — bit-replicable cross-engine, no RNG
   * state; coalition values solve by the SAME fixed-pivot elimination
   * as the exact fold ([[absorption]]), CACHED by coalition (distinct
   * prefixes across samples, ≤ samples·K + 2 solves); each φ̂
   * accumulates marginals in ascending replica order (a pinned
   * left-assoc fold the generated oracle replays term-for-term) and
   * ends in ONE division by `samples`. Outputs round 6dp at the end.
   *
   * Scale shape: one window pass + one count aggregate distribute;
   * the driver holds (K+2)² longs and runs ≤ samples·K + 2 solves of
   * O(K³) — ~1.3 GFlop at K = 50, samples = 200, corpus-independent
   * (`channels.size` ≤ 64 from the journeyCounts state-space cap;
   * `samples` ≤ 4096 enforced).
   *
   * Returns one row per channel (ascending): (`channel`, `shapley`,
   * `share` = φ̂/Σφ̂, `p_conv` = v(C); all NULL when the chain never
   * converts).
   */
  def shapleySampledAttribution(df: DataFrame, userCol: String,
                                typeCol: String, tsCol: String,
                                idCol: String, conversionType: String,
                                channels: Seq[String],
                                samples: Int = 200): DataFrame = {
    require(channels.nonEmpty && channels.distinct.size == channels.size,
      "channels must be non-empty and distinct")
    require(channels.size <= 64, s"too many channels: ${channels.size}")
    require(samples >= 1 && samples <= 4096,
      s"samples must be in [1, 4096]: $samples")
    require(!channels.contains(conversionType),
      "conversionType cannot also be a channel")
    val spark = df.sparkSession
    import spark.implicits._
    val chs = channels.sorted
    val k = chs.size
    val idx = chs.zipWithIndex.toMap
    val counts = journeyCounts(df, userCol, typeCol, tsCol, idCol,
      conversionType, chs)
    val cache = scala.collection.mutable.Map.empty[
      scala.collection.immutable.BitSet, Double]
    def v(members: scala.collection.immutable.BitSet): Double =
      cache.getOrElseUpdate(members, {
        val removed = chs.zipWithIndex
          .filterNot { case (_, i) => members(i) }.map(_._1).toSet
        absorption(counts, chs, removed)
      })
    val full = scala.collection.immutable.BitSet(0 until k: _*)
    val pFull = v(full)
    val rows: Seq[(String, Option[Double], Option[Double], Option[Double])] =
      if (!(pFull > 0.0)) chs.map(c => (c, None, None, None))
      else {
        def r6(x: Double): Option[Double] =
          if (x.isNaN) None
          else Some(BigDecimal(x)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        val acc = Array.fill(k)(0.0)
        var b = 0
        while (b < samples) {
          val order = shapleySampleOrder(chs, b)
          var prefix = scala.collection.immutable.BitSet.empty
          var prev = v(prefix)
          order.foreach { c =>
            prefix = prefix + idx(c)
            val cur = v(prefix)
            acc(idx(c)) += cur - prev
            prev = cur
          }
          b += 1
        }
        val phi = chs.map(c => c -> acc(idx(c)) / samples.toDouble).toMap
        val phiSum = chs.foldLeft(0.0)((a, c) => a + phi(c))
        chs.map { c =>
          (c, r6(phi(c)),
            if (phiSum > 0.0) r6(phi(c) / phiSum) else None,
            r6(pFull))
        }
      }
    rows.toDF("channel", "shapley", "share", "p_conv")
  }

  /**
   * Nelson-Aalen cumulative-hazard estimator (Nelson 1972; Aalen
   * 1978) — [[kaplanMeier]]'s additive sibling: Ĥ(t) = Σ_{s ≤ t}
   * d_s/n_s accumulates hazard instead of multiplying survival, is
   * defined THROUGH a d = n level (where KM's survival pins to 0 and
   * stays there), and its increments are what a proportional-hazards
   * diagnostic or a piecewise-exponential fit consumes. Same input
   * contract as kaplanMeier (integer duration + boolean event,
   * censored = false).
   *
   * EXACTNESS: identical level machinery to kaplanMeier — exact long
   * level counts, exclusive at-risk running sums — with the hazard a
   * RUNNING window fold of single IEEE divisions d/n in duration order
   * (sequential in both engines); `cum_hazard` and its Poisson-variance
   * companion `cum_var` (Σ d/n², Klein 1991's simpler form) round 6dp.
   *
   * Scale shape: the kaplanMeier contract verbatim — one level
   * aggregate, windows over LEVELS (distinct durations, bounded by
   * the same enforced `maxLevels` gate, [[guardedSurvivalLevels]]),
   * one row out per event time: (`t`, `n_risk`, `n_events`,
   * `cum_hazard`, `cum_var`).
   */
  def nelsonAalen(df: DataFrame, durationCol: String,
                  eventCol: String,
                  maxLevels: Long = 10000000L): DataFrame = {
    val base = df
      .filter(col(durationCol).isNotNull && col(eventCol).isNotNull)
      .select(col(durationCol).cast("long").as("t"),
        col(eventCol).cast("boolean").as("ev"))
    val levels = guardedSurvivalLevels(base.groupBy("t").agg(
      sum(when(col("ev"), 1L).otherwise(0L)).as("d"),
      count(lit(1)).as("all")), "nelsonAalen", maxLevels)
    val wPrev = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wRun = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    levels
      .withColumn("n_risk",
        sum("all").over(wTot) - coalesce(sum("all").over(wPrev), lit(0L)))
      .withColumn("__h", sum(
        col("d").cast("double") / col("n_risk").cast("double")).over(wRun))
      .withColumn("__v", sum(
        col("d").cast("double") /
          (col("n_risk").cast("double") * col("n_risk").cast("double")))
        .over(wRun))
      .filter(col("d") > 0L)
      .select(col("t"), col("n_risk"), col("d").as("n_events"),
        round(col("__h"), 6).as("cum_hazard"),
        round(col("__v"), 6).as("cum_var"))
  }

  /**
   * Fisher's exact test, two-sided, for a 2×2 table (Fisher 1935) —
   * the small-cell regime where the χ² approximation breaks (any
   * expected cell < 5, the textbook cutoff): sums hypergeometric point
   * probabilities P(k) over every table with the observed margins
   * whose probability does not exceed the observed table's (the
   * standard two-sided definition, with R's (1 + 10⁻⁷) relative
   * tolerance so exactly-tied tables — symmetric margins — are
   * included robustly).
   *
   * EXACTNESS: no factorials anywhere — unnormalized log-probabilities
   * build by the recurrence P(k)/P(k−1) = (r1−k+1)(c1−k+1) /
   * (k(r2−c1+k)) as an ORDERED running ln-sum over the support levels
   * (sequential fold in both engines, the kaplanMeier convention; each
   * step is ln of exact-integer-derived doubles); weights re-center at
   * the support max before exp (overflow-immune for any margins); the
   * normalizer, the selected mass, and the observed-row lookup are all
   * ordered window folds over the SAME level frame; the inclusion test
   * compares ln-space (lnQ ≤ lnQ_obs + ln(1+10⁻⁷)) — no exp on the
   * decision path. `p_value` rounds 6dp.
   *
   * Scale shape: one aggregate to four exact cells, then a SUPPORT-
   * sized level frame (min(r1, c1) − max(0, c1 − r2) + 1 rows) with
   * ordered windows over it. The support is margin-sized, not
   * row-sized, but a 100 TB 2×2 can still have a 10⁹ support —
   * `maxSupport` fails loud (use the χ² / G-test at that scale: Fisher
   * exists precisely for SMALL cells).
   *
   * Returns one row: (`a`, `b`, `c`, `d`, `p_value`).
   */
  def fisherExactTest(df: DataFrame, exposureCol: String,
                      outcomeCol: String,
                      maxSupport: Long = 1000000L): DataFrame = {
    require(maxSupport >= 1, s"maxSupport must be >= 1: $maxSupport")
    val base = df
      .filter(col(exposureCol).isNotNull && col(outcomeCol).isNotNull)
      .select(col(exposureCol).cast("boolean").as("e"),
        col(outcomeCol).cast("boolean").as("o"))
    val cells = base.agg(
      sum(when(col("e") && col("o"), 1L).otherwise(0L)).as("a"),
      sum(when(col("e") && !col("o"), 1L).otherwise(0L)).as("b"),
      sum(when(!col("e") && col("o"), 1L).otherwise(0L)).as("c"),
      sum(when(!col("e") && !col("o"), 1L).otherwise(0L)).as("d"))
      .withColumn("r1", col("a") + col("b"))
      .withColumn("r2", col("c") + col("d"))
      .withColumn("c1", col("a") + col("c"))
      .withColumn("kmin", greatest(lit(0L), col("c1") - col("r2")))
      .withColumn("kmax", least(col("r1"), col("c1")))
    val levels = cells
      .filter(when(col("kmax") - col("kmin") >= maxSupport,
        raise_error(lit("fisherExactTest: support exceeds maxSupport — " +
          "use chi2/G-test at this scale")).cast("boolean"))
        .otherwise(lit(true)))
      .withColumn("k", explode(sequence(col("kmin"), col("kmax"))))
    val wRun = Window.orderBy("k")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.orderBy("k")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // ln step k-1 -> k (zero at the support floor)
    val step = when(col("k") === col("kmin"), lit(0.0)).otherwise(
      log((col("r1") - col("k") + 1L).cast("double")) +
        log((col("c1") - col("k") + 1L).cast("double")) -
        log(col("k").cast("double")) -
        log((col("r2") - col("c1") + col("k")).cast("double")))
    val lp = levels
      .withColumn("__lnq", sum(step).over(wRun))
      .withColumn("__m", max(col("__lnq")).over(wTot))
      .withColumn("__lnobs",
        max(when(col("k") === col("a"), col("__lnq"))).over(wTot))
      .withColumn("__w", exp(col("__lnq") - col("__m")))
      .withColumn("__keep",
        col("__lnq") <= col("__lnobs") + lit(9.999999505838704e-8))
      .withColumn("__tot", sum(col("__w")).over(wRun))
      .withColumn("__sel",
        sum(when(col("__keep"), col("__w")).otherwise(lit(0.0)))
          .over(wRun))
      .withColumn("__rn", row_number().over(Window.orderBy("k")))
      .withColumn("__cnt", count(lit(1)).over(wTot))
      .filter(col("__rn") === col("__cnt"))
    lp.select(col("a"), col("b"), col("c"), col("d"),
      round(col("__sel") / col("__tot"), 6).as("p_value"))
  }

  def oddsRiskRatio(df: DataFrame, exposureCol: String,
                    outcomeCol: String): DataFrame = {
    val base = df
      .filter(col(exposureCol).isNotNull && col(outcomeCol).isNotNull)
      .select(col(exposureCol).cast("boolean").as("e"),
        col(outcomeCol).cast("boolean").as("o"))
    val cells = base.agg(
      sum(when(col("e") && col("o"), 1L).otherwise(0L)).as("a"),
      sum(when(col("e") && !col("o"), 1L).otherwise(0L)).as("b"),
      sum(when(!col("e") && col("o"), 1L).otherwise(0L)).as("c"),
      sum(when(!col("e") && !col("o"), 1L).otherwise(0L)).as("d"))
    val ad = col("a").cast("double")
    val bd = col("b").cast("double")
    val cd = col("c").cast("double")
    val dd = col("d").cast("double")
    val anyZero = col("a") === 0L || col("b") === 0L ||
      col("c") === 0L || col("d") === 0L
    val z = lit(1.96)
    val lnOr = log(ad * dd / (bd * cd))
    val seOr = sqrt(lit(1.0) / ad + lit(1.0) / bd +
      lit(1.0) / cd + lit(1.0) / dd)
    val lnRr = log((ad / (ad + bd)) / (cd / (cd + dd)))
    val seRr = sqrt(lit(1.0) / ad - lit(1.0) / (ad + bd) +
      lit(1.0) / cd - lit(1.0) / (cd + dd))
    cells.select(col("a"), col("b"), col("c"), col("d"),
      when(!anyZero, round(exp(lnOr), 6)).as("odds_ratio"),
      when(!anyZero, round(exp(lnOr - z * seOr), 6)).as("or_lo"),
      when(!anyZero, round(exp(lnOr + z * seOr), 6)).as("or_hi"),
      when(!anyZero, round(exp(lnRr), 6)).as("risk_ratio"),
      when(!anyZero, round(exp(lnRr - z * seRr), 6)).as("rr_lo"),
      when(!anyZero, round(exp(lnRr + z * seRr), 6)).as("rr_hi"))
  }
}
