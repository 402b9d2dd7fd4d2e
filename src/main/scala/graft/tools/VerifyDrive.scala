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

    // current investigation: why is ivfPqTopK recall low on the clustered
    // manifold — quantization error, or a shortlist/scoring bug?
    import graft.operators.Similarity
    import spark.implicits._
    val n = 200000L
    val cClusters = 256
    val d = 64
    val sigma = 0.08
    val vecs = spark.range(n).toDF("vec_id")
      .withColumn("embedding", expr(
        s"transform(sequence(1, $d), i -> cast(" +
          s"(pmod(xxhash64(pmod(vec_id, $cClusters), i), 1000) / 1000.0 - 0.5)" +
          s" + $sigma * (pmod(xxhash64(vec_id, i, 7), 1000) / 1000.0 - 0.5)" +
          s" as float))"))
      .cache()
    vecs.count()
    val pq = Similarity.trainPq(vecs, m = 8)
    val sample = vecs.limit(2000).as[(Long, Array[Float])].collect()
    // reconstruction error vs signal scale
    def recon(code: Array[Byte]): Array[Float] = {
      val out = new Array[Float](pq.dim)
      for (s <- 0 until pq.m; i <- 0 until pq.subDim)
        out(s * pq.subDim + i) = pq.sub(s)(code(s) & 0xff)(i)
      out
    }
    val errs = sample.map { case (_, v) =>
      val r = recon(pq.encode(v))
      math.sqrt(v.zip(r).map { case (a, b) => (a - b) * (a - b) }.sum)
    }
    val norms = sample.map { case (_, v) =>
      math.sqrt(v.map(x => x * x).sum) }
    println(f"[drive] pq recon err mean=${errs.sum / errs.length}%.4f " +
      f"norm mean=${norms.sum / norms.length}%.4f")
    // ADC vs true cosine ordering for one query against its cluster
    val q = sample.head._2
    val lut = pq.lut(q)
    val scored = sample.map { case (id, v) =>
      val cos = {
        val dn = math.sqrt(v.map(x => x * x).sum) *
          math.sqrt(q.map(x => x * x).sum)
        v.zip(q).map { case (a, b) => a * b }.sum / dn
      }
      (id, cos, pq.adc(lut, pq.encode(v)))
    }
    val byCos = scored.sortBy(-_._2).take(5).map(_._1).toSet
    val byAdc = scored.sortBy(_._3).take(50).map(_._1).toSet
    println(s"[drive] top5-by-cosine=$byCos in ADC-top50? " +
      s"${byCos.intersect(byAdc).size}/5")
    println("[drive] head by cos: " +
      scored.sortBy(-_._2).take(5).map(t => f"(${t._1},cos=${t._2}%.3f,adc=${t._3}%.3f)").mkString(" "))
    println("[drive] head by adc: " +
      scored.sortBy(_._3).take(5).map(t => f"(${t._1},cos=${t._2}%.3f,adc=${t._3}%.3f)").mkString(" "))
    spark.stop()
  }
}
