package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.EsMurmur3
import graft.sources.Ingest

class ShardPartitioningSpec extends SparkSpec {

  test("partition i holds exactly the rows with shard == i (X1)") {
    val n = 7
    val df = spark.range(500).select(col("id").cast("string").as("doc_id"))
      .withColumn("shard", graft.functions.EsHash.esShard(col("doc_id"), n))
    val placed = ShardPartitioning.partitionByShard(df, "shard", n)
    assert(placed.rdd.getNumPartitions === n)
    val perPartition = placed
      .select(col("shard"), spark_partition_id().as("p"))
      .distinct().collect()
    perPartition.foreach(r => assert(r.getInt(0) === r.getInt(1)))
    // no rows lost or duplicated by the round-trip
    assert(placed.count() === 500)
  }

  test("typed partitionDocs preserves envelopes and placement") {
    val src = spark.range(200).toDF("event_id")
      .withColumn("payload", concat(lit("v"), col("event_id")))
    val docs = Ingest.fromColumns(src, "idx", "event_id", 5)
    val placed = ShardPartitioning.partitionDocs(docs, 5)
    val rows = placed.toDF()
      .select(col("docId"), col("shard"), spark_partition_id().as("p"))
      .collect()
    assert(rows.length === 200)
    rows.foreach { r =>
      val expected = EsMurmur3.shard(r.getString(0), 5)
      assert(r.getInt(1) === expected)
      assert(r.getInt(2) === expected)
    }
  }

  test("empty shards still materialize as empty partitions (A4 precondition)") {
    val df = spark.range(1).select(lit("0").as("doc_id"),
      lit(EsMurmur3.shard("0", 64)).as("shard"))
    val placed = ShardPartitioning.partitionByShard(df, "shard", 64)
    assert(placed.rdd.getNumPartitions === 64)
    assert(placed.count() === 1)
  }
}
