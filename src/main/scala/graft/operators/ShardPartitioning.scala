package graft.operators

import org.apache.spark.Partitioner
import org.apache.spark.sql.{DataFrame, Dataset, Row}

import graft.core.IndexableDoc

/**
 * Exact shard→partition placement (SURVEY.md §2.3 X1; reference:
 * src/main/java/com/simondata/elasticfreight/util/ShardPartitioner.java:34-39).
 *
 * `df.repartition(n, col)` is NOT sufficient: Spark re-hashes the column
 * with its own murmur3 (seed 42), so shard s lands on an arbitrary
 * partition. The offline-index topology requires partition i == shard i
 * (one writer builds exactly one output shard), which only a custom RDD
 * [[Partitioner]] guarantees.
 *
 * Scale note (100 TB): this is the job's single required shuffle — the
 * same movement the reference does once per record (IndexingJob.java:119).
 * The Row round-trip costs one serialization per record, on par with the
 * shuffle write itself; there is no second shuffle downstream because the
 * sink consumes partitions as-is.
 */
object ShardPartitioning {

  /** Identity partitioner over precomputed shard ids ∈ [0, numShards). */
  final class ShardPartitioner(val numShards: Int) extends Partitioner {
    override def numPartitions: Int = numShards
    override def getPartition(key: Any): Int = key.asInstanceOf[Int]
    override def equals(other: Any): Boolean = other match {
      case p: ShardPartitioner => p.numShards == numShards
      case _ => false
    }
    override def hashCode(): Int = numShards
  }

  /**
   * Repartition so that output partition i contains exactly the rows with
   * `shardCol` == i. Produces exactly `numShards` partitions (empty
   * partitions preserved — the sink backfills empty shards, SURVEY.md A4).
   */
  def partitionByShard(df: DataFrame, shardCol: String, numShards: Int): DataFrame = {
    val schema = df.schema
    val idx = schema.fieldIndex(shardCol)
    val partitioned = df.rdd
      .map(r => (r.getInt(idx), r))
      .partitionBy(new ShardPartitioner(numShards))
      .values
    df.sparkSession.createDataFrame(partitioned, schema)
  }

  /**
   * Placement proof at histogram cost: routes rows through the SAME
   * [[ShardPartitioner]] as [[partitionByShard]] but carries only the
   * shard id — map-side combine collapses each input partition to
   * ≤ numShards (shard, count) pairs before the shuffle, so the proof
   * moves O(partitions·shards) rows instead of the full payload (the
   * full-envelope variant serialized every row to JSON first: ~50×
   * heavier for a query whose output is 8 rows).
   *
   * Output: (shard, partition, n) — correct placement ⇔ all rows on the
   * diagonal shard == partition.
   */
  def placementHistogram(df: DataFrame, shardCol: String, numShards: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(shardCol).rdd
      .map(r => (r.getInt(0), 1L))
      .reduceByKey(new ShardPartitioner(numShards), _ + _)
      .mapPartitionsWithIndex { case (pid, it) =>
        it.map { case (shard, n) => (shard, pid, n) }
      }
      .toDF("shard", "partition", "n")
  }

  /** Typed variant for the standard envelope. */
  def partitionDocs(ds: Dataset[IndexableDoc], numShards: Int): Dataset[IndexableDoc] = {
    val spark = ds.sparkSession
    import spark.implicits._
    val partitioned = ds.rdd
      .map(d => (d.shard, d))
      .partitionBy(new ShardPartitioner(numShards))
      .values
    spark.createDataset(partitioned)
  }
}
