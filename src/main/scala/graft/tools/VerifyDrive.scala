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

    // current investigation: q_triangles stage breakdown at sf0.1 —
    // where do the 29 s go (edge derivation vs wedge join vs closure
    // probe), and does the closure broadcast actually fire?
    def run(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[drive] $tag%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s ($n rows)")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
    }
    val dir = "/root/testdata/sf0.1"
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    def edges = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("src"), col("b.pk").as("dst"))
      .agg(count(lit(1)).as("m")).select("src", "dst")
    run("edge_derivation")(edges.count())
    val canon = edges.select(col("src").as("a"), col("dst").as("b")).cache()
    run("canon_cache")(canon.count())
    val deg = canon.select(col("a").as("n"))
      .unionAll(canon.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg")).cache()
    run("deg")(deg.count())
    val withDeg = canon
      .join(deg.select(col("n").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("deg").as("db")), "b")
    val fwd = col("da") < col("db") || (col("da") === col("db"))
    val oriented = withDeg.select(
      when(fwd, col("a")).otherwise(col("b")).as("u"),
      when(fwd, col("b")).otherwise(col("a")).as("v"),
      when(fwd, col("db")).otherwise(col("da")).as("dv")).cache()
    run("oriented_cache")(oriented.count())
    val o1 = oriented.select(col("u"), col("v").as("v1"), col("dv").as("dv1"))
    val o2 = oriented.select(col("u"), col("v").as("v2"), col("dv").as("dv2"))
    val wedges = o1.join(o2, Seq("u"))
      .filter(col("dv1") < col("dv2") ||
        (col("dv1") === col("dv2") && col("v1") < col("v2")))
    run("wedges")(wedges.count())
    val closure = broadcast(oriented.select(col("u").as("cu"), col("v").as("cv")))
    val tris = wedges.join(closure,
      col("v1") === col("cu") && col("v2") === col("cv"))
    run("tris_probe")(tris.count())
    run("full_operator")(graft.operators.Graph.triangleCounts(
      edges, "src", "dst").count())
    spark.stop()
  }
}
