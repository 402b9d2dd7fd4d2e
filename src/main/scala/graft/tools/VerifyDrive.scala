package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch driver for manual end-to-end verification (not part of the API). */
object VerifyDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      // testdata events.ts is parquet TIMESTAMP(NANOS) — Spark 4 refuses it
      // unless read as epoch-nanos long
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")

    // ── as-of join: latest prior click per event ─────────────────────────
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    val asof = graft.operators.TemporalJoin.asOf(ev, clicks, Seq("user_id"), "ts")
    asof.select("event_id", "user_id", "ts", "asof_ts", "click_id")
      .orderBy("user_id", "ts").show(8, false)
    println("== asOf explain (expect ONE exchange on user_id + window) ==")
    asof.explain("formatted")

    // ── range join: events within 1h windows ─────────────────────────────
    val hourNs = 3600L * 1000000000L
    val iv = ev.filter(col("event_id") % 97 === 0)
      .select(col("event_id").as("interval_id"), col("ts").as("start_ts"),
        (col("ts") + lit(hourNs)).as("end_ts"))
    val rj = graft.operators.TemporalJoin
      .rangeJoin(ev, iv, "ts", "start_ts", "end_ts", bucketWidth = hourNs / 4)
      .groupBy("interval_id").agg(count(lit(1)).as("n_events"))
    rj.orderBy("interval_id").show(5)
    println("== rangeJoin explain (expect equi-join on __bucket, NO BroadcastNestedLoop) ==")
    rj.explain("formatted")

    // ── deterministic sampling ───────────────────────────────────────────
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sampled = graft.operators.Samples.bernoulli(docs, "doc_id", 0.25, seed = 7)
    println(s"[sample] kept=${sampled.count()} of ${docs.count()}")
    println("== sample explain (expect filter pushed into scan) ==")
    sampled.select("doc_id").explain("formatted")
    spark.stop()
  }
}
