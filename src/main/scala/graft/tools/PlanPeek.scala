package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: inspect partitioning preservation through localCheckpoint
  * and the pageRank round plan (not part of the API). */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.core.LineageCut

    val df = spark.range(1000).toDF("id")
      .withColumn("dst", pmod(col("id"), lit(100L)))
      .withColumn("w", lit(1.0))
    val parted = df.repartition(col("dst")).persist()
    parted.count()
    println("=== agg over cut(repartition(dst)) ===")
    parted.groupBy("dst").agg(sum("w")).explain("formatted")

    val ranks = LineageCut.cut(
      spark.range(100).toDF("node").withColumn("rank", lit(0.01)))
    println("=== round plan: bc-join + agg ===")
    parted.join(broadcast(ranks), parted("id") % 100 === ranks("node"))
      .groupBy("dst").agg(sum(col("rank") * col("w")))
      .explain("formatted")
    spark.stop()
  }
}
