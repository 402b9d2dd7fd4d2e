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

    // current investigation: per-exchange shuffle bytes of the hashed
    // dedupChunks path — which exchange carries the unexpected volume?
    val n = 500000L
    val docs = spark.range(n).toDF("doc_id")
      .withColumn("pool", when(col("doc_id") % 10 === 0,
        col("doc_id") % 997).otherwise(col("doc_id")))
      .withColumn("text", expr("concat_ws(' ', transform(sequence(1, 40), " +
        "i -> substring(hex(xxhash64(pool, i)), 1, 8)))"))
      .select("doc_id", "text")
      .cache()
    docs.count()
    val out = graft.operators.Dedup.dedupChunks(docs, "doc_id", "text", 8)
      .select(sum(length(col("clean_text"))).as("sig"), count(lit(1)).as("nn"))
    out.collect()
    def walk(p: org.apache.spark.sql.execution.SparkPlan, depth: Int): Unit =
      p match {
        case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(qs.plan, depth)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan, depth)
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike =>
          val b = e.metrics.get("shuffleBytesWritten").map(_.value).getOrElse(0L)
          val r = e.metrics.get("shuffleRecordsWritten").map(_.value).getOrElse(0L)
          println(f"[drive] exchange@$depth: ${b / 1e6}%8.1f MB, $r rows :: " +
            e.child.getClass.getSimpleName)
          e.children.foreach(walk(_, depth + 1))
        case other => other.children.foreach(walk(_, depth + 1))
      }
    walk(out.queryExecution.executedPlan, 0)
    println(out.queryExecution.executedPlan.toString.take(8000))
    spark.stop()
  }
}
