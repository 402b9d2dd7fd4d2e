package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Stress-tier validation of the r17/r18 scale-adaptive heuristics
 * (VERDICT r17 item 4): proves on a 16M-row frame that
 *
 *  1. `LineageCut.cutFanout` / `cutFanoutBy` are NO-OPS when the
 *     materialized frame already has ≥ max(shuffle partitions, default
 *     parallelism) partitions (no added exchange at data scale), and do
 *     fire on a single-split frame;
 *  2. `Ranking.withGlobalRank`'s session-derived chunk count tracks
 *     `spark.sql.shuffle.partitions` (the deployment knob), verified
 *     off the executed range exchange;
 *  3. `spearmanMatrix`'s r18 level-count form stays level-bounded at a
 *     16M-row tier (wall printed for the SCALING.md row).
 *
 * Run: `sbt "runMain graft.tools.ScaleProbe"` (local[32], ~2-4 min).
 */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.core.LineageCut

    def time[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }

    // ---- 1. cutFanout / cutFanoutBy no-op at scale
    val big = spark.range(0, 16L << 20, 1, 64).toDF("id")
      .withColumn("v", pmod(xxhash64(col("id")), lit(1000L)))
    val bigCut = LineageCut.cutFanout(big)
    println(s"cutFanout @16M/64p: partitions 64 -> " +
      s"${bigCut.rdd.getNumPartitions} (must stay 64: no added exchange)")
    assert(bigCut.rdd.getNumPartitions == 64)
    val bigCutBy = LineageCut.cutFanoutBy(big, Seq("v"))
    println(s"cutFanoutBy @16M/64p: partitions 64 -> " +
      s"${bigCutBy.rdd.getNumPartitions} (must stay 64)")
    assert(bigCutBy.rdd.getNumPartitions == 64)
    val small = spark.range(0, 1000, 1, 1).toDF("id")
    val smallCut = LineageCut.cutFanout(small)
    println(s"cutFanout @1k/1p: partitions 1 -> " +
      s"${smallCut.rdd.getNumPartitions} (must fan out to 32)")
    assert(smallCut.rdd.getNumPartitions == 32)

    // ---- 2. rank chunk count tracks spark.sql.shuffle.partitions
    def rangeParts(parts: String): Int = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try {
        val ranked = graft.operators.Ranking.withGlobalRank(
          spark.range(0, 1L << 20, 1, 8).toDF("id")
            .withColumn("v", pmod(xxhash64(col("id")), lit(97L))),
          Seq(col("v").asc, col("id").asc), "r", "n")
        // the eager cut inside the helper already executed the range
        // exchange; read its partitioning off the materialized frame
        ranked.rdd.getNumPartitions // = chunk count of the cut frame
      } finally spark.conf.set("spark.sql.shuffle.partitions", "32")
    }
    val at96 = rangeParts("96")
    val at48 = rangeParts("48")
    println(s"withGlobalRank chunks: shuffle.partitions=96 -> $at96, " +
      s"48 -> $at48 (chunk count must track the knob)")
    assert(at96 == 96 && at48 == 48)

    // ---- 3. spearmanMatrix level form at 16M rows (3 columns)
    val wide = spark.range(0, 16L << 20, 1, 64).toDF("id")
      .withColumn("x", (pmod(xxhash64(col("id"), lit(1)), lit(100000L))
        / 100.0))
      .withColumn("y", (pmod(xxhash64(col("id"), lit(2)), lit(5000L))
        / 100.0))
      .withColumn("z", (pmod(xxhash64(col("id"), lit(3)), lit(50L))
        / 10.0))
    val (dt, n) = time {
      graft.operators.Profiling.spearmanMatrix(
        wide, Seq("x", "y", "z"), "id").count()
    }
    println(f"spearmanMatrix level form @16M x 3 cols " +
      f"(~100k/5k/50 quantized levels): $dt%.1f s, $n rows")
    spark.stop()
  }
}
