package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * First-touch funnel analysis over an event stream: how many users
 * reach each stage of an ordered conversion sequence (view → click →
 * purchase) within a time window of their FIRST first-stage event —
 * the conversion report every product-analytics pipeline keys on, and
 * the canonical event-sequence workload next to sessionization.
 *
 * Semantics (the deterministic "first touch" convention): stage 1's
 * time is the user's EARLIEST stage-1 event; each later stage matches
 * the earliest event of its type STRICTLY AFTER the previous stage's
 * matched time and within `windowNs` of the stage-1 time. Greedy
 * earliest-first matching — order-independent, reproducible, and
 * exactly replayable in SQL (the oracle re-derives the same chain with
 * one CTE per stage).
 *
 * Scale shape: stage i is ONE equi-join keyed by user between the
 * type-filtered event scan (the `typeCol` filter pushes into the
 * parquet scan) and the previous stage's (user, t, t1) frame — a
 * keys-and-timestamps frame, never event payloads — followed by a
 * per-user min aggregate. k stages ⇒ k shuffles of per-user vectors,
 * each no larger than the converting-user count, which funnels
 * (literally) monotonically DOWN with every stage. No windows, no
 * sorts, no per-user event collections.
 */
object Funnel {

  /** Per-stage completion counts: one row per stage,
    * (`stage` 1-based, `stage_name`, `users`). `tsCol` must be (or
    * cast losslessly to) long event-time — use epoch-nanos like the
    * rest of the temporal operators. */
  def firstTouch(events: DataFrame, userCol: String, typeCol: String,
                 tsCol: String, stages: Seq[String],
                 windowNs: Long): DataFrame = {
    require(stages.nonEmpty, "need at least one stage")
    require(stages.distinct.size == stages.size, s"duplicate stages: $stages")
    require(windowNs > 0, "windowNs must be positive")
    val spark = events.sparkSession
    val ev = events.select(col(userCol).as("u"), col(typeCol).as("ty"),
      col(tsCol).cast("long").as("ts"))
    var cur = ev.filter(col("ty") === stages.head)
      .groupBy("u").agg(min("ts").as("t"))
      .withColumn("t1", col("t"))
    val counts = scala.collection.mutable.ListBuffer(
      (1, stages.head, cur.count()))
    var i = 2
    for (stg <- stages.tail) {
      cur = ev.filter(col("ty") === stg)
        .join(cur.select(col("u"), col("t").as("__pt"), col("t1")), "u")
        .filter(col("ts") > col("__pt") &&
          col("ts") <= col("t1") + windowNs)
        .groupBy("u", "t1").agg(min("ts").as("t"))
        .select("u", "t", "t1")
      counts += ((i, stg, cur.count()))
      i += 1
    }
    toFrame(spark, counts.toSeq)
  }

  private def toFrame(spark: SparkSession,
                      rows: Seq[(Int, String, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("stage", "stage_name", "users")
  }
}
