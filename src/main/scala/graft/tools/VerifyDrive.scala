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

    // current investigation: the graph stress tier shows UNWEIGHTED
    // pageRank 2-5x slower than weighted on the same synthetic edges
    // (all-unique pairs), while the sf0.1 bench (duplicate-heavy edges)
    // shows no gap. Isolate: is the e-construction stage (distinct vs
    // groupBy+sum) the difference, or the iteration loop?
    def run(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[drive] $tag%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s ($n rows)")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
    }
    val n = 16000000L
    val nodes = n / 10
    val edges = spark.range(n).select(
      pmod(col("id") * 2654435761L, lit(nodes)).as("src"),
      pmod(xxhash64(col("id")), lit(nodes)).as("dst"),
      (pmod(xxhash64(col("id"), lit(3)), lit(5)) + 1).cast("double").as("w"))
      .cache()
    edges.count()
    for (i <- 1 to 2) {
      run(s"pr_unweighted#$i")(
        graft.operators.Graph.pageRank(edges, "src", "dst", iters = 6).count())
      run(s"pr_weighted#$i")(
        graft.operators.Graph.pageRank(edges, "src", "dst", iters = 6,
          weightCol = Some("w")).count())
      run(s"pr_dangling#$i")(
        graft.operators.Graph.pageRank(edges, "src", "dst", iters = 6,
          redistributeDangling = true).count())
    }
    spark.stop()
  }
}
