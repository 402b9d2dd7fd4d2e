package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.EsHash._

/** Scratch driver for manual end-to-end verification (not part of the API). */
object VerifyDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      // testdata events.ts is parquet TIMESTAMP(NANOS) — Spark 4 refuses it
      // unless read as epoch-nanos long
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("doc_id", col("event_id").cast("string"))
    val out = ev.select(col("doc_id"), esMurmur3(col("doc_id")).as("h"),
        esShard(col("doc_id"), 5).as("shard"), esRouting(col("doc_id"), 5).as("routing"))
      .filter(col("doc_id").isin("0", "1", "2", "3", "4", "42", "999"))
    out.orderBy(col("doc_id").cast("int")).show(10, false)
    println("== explain ==")
    out.explain("formatted")
    // probe: null doc id
    val probe = spark.range(1).select(lit(null).cast("string").as("doc_id"))
      .select(esMurmur3(col("doc_id")).as("h"), esShard(col("doc_id"), 5).as("s"))
    probe.show(false)
    // probe: empty string + shard distribution over all 1000 events
    spark.range(1).select(esMurmur3(lit("")).as("empty_hash")).show()
    ev.groupBy(esShard(col("doc_id"), 5).as("shard")).count()
      .orderBy("shard").show()
    // skew: salted join vs plain join on real tables must agree exactly
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = orders.join(cust, "o_custkey")
      .agg(count(lit(1)).as("n"), sum("o_totalprice").as("s")).head()
    val salted = graft.operators.SkewJoin
      .saltedJoin(orders, cust, "o_custkey", salt = 8)
      .agg(count(lit(1)).as("n"), sum("o_totalprice").as("s")).head()
    println(s"[skew] plain=$plain salted=$salted equal=${plain == salted}")
    spark.stop()
  }
}
