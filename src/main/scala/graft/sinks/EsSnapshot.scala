package graft.sinks

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.core.{IndexableDoc, ShardConfig}
import graft.sinks.essnapshot.EsSnapshotSink

/** User-facing facade over the `es-snapshot` DSv2 sink. */
object EsSnapshot {

  /**
   * Bulk-build an offline snapshot from an envelope stream.
   * The engine inserts the one required shuffle (cluster by index+shard);
   * commit stitches per-shard snapshots into a single restorable layout.
   * Repos accumulate: each write appends a snapshot + generation;
   * `overwrite = true` makes this snapshot the repo's only one.
   */
  def write(docs: Dataset[IndexableDoc], dest: String,
            shards: ShardConfig = ShardConfig(),
            snapshotName: Option[String] = None,
            mappings: Option[String] = None,
            template: Option[String] = None,
            options: Map[String, String] = Map.empty,
            overwrite: Boolean = false): Unit = {
    var w = docs.toDF().write.format("es-snapshot")
      .option("path", dest)
      .option(EsSnapshotSink.ShardsDefaultOption, shards.defaultShards)
    shards.perIndex.foreach { case (ix, n) =>
      w = w.option(EsSnapshotSink.ShardsPerIndexPrefix + ix, n)
    }
    snapshotName.foreach(n => w = w.option(EsSnapshotSink.SnapshotNameOption, n))
    mappings.foreach(m => w = w.option(EsSnapshotSink.MappingsOption, m))
    template.foreach(t => w = w.option(EsSnapshotSink.TemplateOption, t))
    options.foreach { case (k, v) => w = w.option(k, v) }
    w.mode(if (overwrite) "overwrite" else "append").save()
  }

  /** DSv2 read of a committed snapshot: table of (index, shard, json) with
    * one partition per shard dir and shard/index filter pruning at the
    * directory listing (restore parallelism == shard topology). Repos
    * accumulate snapshots across generations; `snapshot` selects one by
    * name or uuid (default: the most recent). */
  def readTable(spark: SparkSession, dest: String,
                snapshot: Option[String] = None): DataFrame = {
    val r = spark.read.format("es-snapshot")
    snapshot.foreach(s => r.option("snapshot", s))
    r.load(dest)
  }

  /** Read a committed snapshot's documents back: one row per document with
    * its shard provenance — the verification/restore path (a real ES
    * restore would replay these into a live cluster; layout mode makes the
    * payloads directly scannable instead). */
  def readDocs(spark: SparkSession, dest: String, indexName: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val indexDir = s"$dest/indices/${graft.sinks.essnapshot.SnapshotLayout.indexId(indexName)}"
    spark.read
      .option("pathGlobFilter", "docs-*.ndjson*") // .ndjson or .ndjson.gz
      .option("recursiveFileLookup", "true")
      .text(indexDir)
      .withColumn("shard",
        regexp_extract(input_file_name(), "/(\\d+)/docs-", 1).cast("int"))
      .select(col("value").as("json"), col("shard"))
  }

  /** The committed manifest, one row per populated shard:
    * `index|snapshotUUID|indexId` (reference: BaseESReducer.java:317-319). */
  def readManifest(spark: SparkSession, dest: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.read.text(s"$dest/manifest.txt")
      .select(split(col("value"), "\\|").as("f"))
      .select(col("f").getItem(0).as("index"),
        col("f").getItem(1).as("snapshotUuid"),
        col("f").getItem(2).as("indexId"))
  }
}
