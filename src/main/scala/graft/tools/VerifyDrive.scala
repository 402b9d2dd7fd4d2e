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

    // current investigation: containmentPairs stage breakdown at the
    // 1.28M-doc stress tier — which exchange owns the superlinear step
    // (explode+dropDup, the cut write, the gh aggregate, or the joins)?
    def run(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[drive] $tag%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s ($n rows)")
    }
    val n = 1280000L
    val vocab = 2000
    val docs = spark.range(n).toDF("doc_id")
      .withColumn("text", expr(
        s"array_join(transform(sequence(1, 40), " +
          s"i -> hex(pmod(xxhash64(doc_id, i), $vocab))), ' ')"))
      .cache()
    run("corpus_cache")(docs.count())
    import graft.core.LineageCut.CutOps
    val grams0 = docs
      .select(col("doc_id").as("__id"),
        explode(graft.functions.Text.wordNgrams(col("text"), 5)).as("__gram"))
      .select(col("__id"), xxhash64(col("__gram")).as("__gh"))
    run("explode_only")(grams0.queryExecution.toRdd.count())
    val dd = grams0.dropDuplicates("__id", "__gh")
    run("drop_dup")(dd.queryExecution.toRdd.count())
    val grams = dd.lineageCut()
    run("cut_write")(grams.queryExecution.toRdd.count())
    run("dfc_agg")(grams.groupBy("__gh").agg(count(lit(1))).queryExecution.toRdd.count())
    run("totals_agg")(grams.groupBy("__id").agg(count(lit(1))).queryExecution.toRdd.count())
    run("full_operator")(graft.operators.Dedup.containmentPairs(
      docs, "doc_id", "text", n = 5, threshold = 0.8, maxGramDf = 100).count())
    spark.stop()
  }
}
