package graft.tools

import org.apache.spark.sql.SparkSession

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

    // current investigation: dedup_incremental fixed cost (shared-sketch
    // admitDelta) at the bench scale factor
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val fn = graft.SparkEntry.queries("dedup_incremental")
    for (i <- 1 to 3) {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      println(f"[drive] dedup_incremental pass $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // job-level profile of one warm pass: where does the fixed cost sit?
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = scala.collection.mutable.ArrayBuffer.empty[(Int, Double, String)]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.put(js.jobId, (System.nanoTime(),
          Option(js.properties.getProperty("spark.job.description")).getOrElse("?")))
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val (t0, d) = jobs.getOrDefault(je.jobId, (0L, "?"))
        done.synchronized { done += ((je.jobId, (System.nanoTime() - t0) / 1e9, d)) }
      }
    })
    fn(spark, sfDir).count()
    Thread.sleep(500)
    done.sortBy(_._1).foreach { case (id, s, d) =>
      println(f"[drive] job $id%3d ${s}%6.2f s  ${d.take(80)}") }
    spark.stop()
  }
}
