package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch driver for manual end-to-end verification (not part of the API). */
object VerifyDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // current investigation: minhash XL tier after the lean-band-join
    // restructure (sig no longer rides the banded shuffle)
    val n = 1280000L
    val docs = spark.range(n).toDF("doc_id")
      .withColumn("text", concat_ws(" ",
        expr(s"transform(sequence(1, 40), i -> hex(pmod(xxhash64(doc_id, i), 50000)))")))
    docs.cache().count()
    for ((label, cap) <- Seq("uncapped" -> 0, "cap1k" -> 1000)) {
      val t0 = System.nanoTime()
      val c = graft.operators.Dedup.minhashPairs(docs, "doc_id", "text",
        threshold = 0.5, maxBucketSize = cap).count()
      println(f"[drive] minhash_$label n=$n ${(System.nanoTime() - t0) / 1e9}%.2f s ($c rows)")
      spark.sparkContext.getPersistentRDDs.values
        .filterNot(_.id == 0).foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
