package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** scratch twin of the test-scope MockSchemeFileSystem */
class DriveMockFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "graftmock"
  override def getUri: java.net.URI = java.net.URI.create("graftmock:///")
}

/** Scratch driver for manual end-to-end verification (not part of the API). */
object VerifyDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // current investigation: shared-slim-checkpoint effect on composed
    // dedup operators at the bench scale factor
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (q <- Seq("split_leakage_safe", "dedup_incremental", "dedup_pipeline",
        "dedup_chunk", "training_corpus_build"); i <- 1 to 2) {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      // collect(), not count(): count lets Catalyst prune the aggregate
      // expressions under measurement (the recurring timing trap)
      graft.SparkEntry.queries(q)(spark, sfDir).collect()
      println(f"[drive] $q pass $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
