package graft.operators


import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Shuffle-elimination evidence for co-located joins: bucketing both fact
  * tables on the join key lets the join run with ZERO exchanges — the
  * 100 TB pattern for repeated joins on the same key (SURVEY.md §7.4
  * scale notes; pre-shuffled storage plays the role the reference's
  * shard-partitioned reducers play for its one join-like movement). */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed tables join without any ShuffleExchange") {
    // at this tiny SF Spark prefers broadcast, which hides the bucketing
    // effect under test — force the shuffle-join path
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try bucketedJoinBody()
    finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  private def bucketedJoinBody(): Unit = {
    // warehouse.dir is a static conf — tables land in ./spark-warehouse
    // (gitignored); drop metastore entries AND stale locations up front
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    val wh = new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")))
    Seq("b_orders", "b_lineitem").foreach { t =>
      val d = new java.io.File(wh, t)
      if (d.exists()) {
        java.nio.file.Files.walk(d.toPath).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }

    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("qty"))
    joined.collect() // force execution so the final plan is adaptive-final

    // AQE hides exchanges of materialized stages behind leaf QueryStages —
    // count them in the final plan text instead of via collect()
    def exchangeCount(df: org.apache.spark.sql.DataFrame): Int = {
      val text = df.queryExecution.executedPlan.toString()
      val finalOnly = text.indexOf("== Initial Plan ==") match {
        case -1 => text
        case i => text.substring(0, i)
      }
      "Exchange hashpartitioning".r.findAllIn(finalOnly).size
    }

    val plan = joined.queryExecution.executedPlan.toString()
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
    // join inputs co-located: only the tiny post-join aggregation shuffles
    val joinExchanges = exchangeCount(joined)
    assert(joinExchanges <= 1, s"join should be co-located, got:\n$plan")

    // same join on unbucketed parquet shuffles BOTH sides — the baseline
    val unbucketed = lineitem.join(orders,
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"))
    unbucketed.collect()
    assert(exchangeCount(unbucketed) > joinExchanges)

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }
}
