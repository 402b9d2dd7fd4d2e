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
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // current investigation: graftmock:// read-path behavior
    import org.apache.hadoop.fs.Path
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.graftmock.impl", classOf[DriveMockFs].getName)
    val localDir = java.nio.file.Files.createTempDirectory("graft-drive-scheme").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(localDir, "index.latest"), "x")
    val dest = s"graftmock://$localDir"
    val fs = new Path(dest).getFileSystem(conf)
    println(s"[drive] fs class = ${fs.getClass}")
    println(s"[drive] exists(indices parent) = ${fs.exists(new Path(dest))}")
    println(s"[drive] exists(index.latest) = ${fs.exists(new Path(dest, "index.latest"))}")
    println(s"[drive] listStatus = ${fs.listStatus(new Path(dest)).map(_.getPath.toString).mkString(", ")}")
    spark.stop()
  }
}
