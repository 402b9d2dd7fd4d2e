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

  /**
   * Delete one snapshot from a repo (ES delete-snapshot semantics): the
   * snapshot disappears from a NEW generation, its metadata files go, and
   * its data files are removed unless another snapshot's shard manifest
   * still references them. Driver-side metadata surgery — O(shards) file
   * ops, no Spark job. Returns false if the snapshot isn't in the repo.
   */
  def deleteSnapshot(spark: SparkSession, dest: String,
                     nameOrUuid: String): Boolean = {
    import graft.sinks.essnapshot.SnapshotLayout
    import org.apache.hadoop.fs.Path
    val conf = spark.sparkContext.hadoopConfiguration
    val destPath = new Path(dest)
    val fs = destPath.getFileSystem(conf)
    def readStr(p: Path): String = {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    def readBytes(p: Path): Array[Byte] = SnapshotLayout.readBytes(fs, p)
    def writeStr(p: Path, body: String): Unit = {
      val out = fs.create(p, true)
      try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }

    val latestPath = new Path(destPath, SnapshotLayout.IndexLatest)
    if (!fs.exists(latestPath)) return false
    val gen = {
      val in = fs.open(latestPath)
      val buf = new Array[Byte](8)
      try { in.readFully(buf); SnapshotLayout.parseIndexLatest(buf) }
      finally in.close()
    }
    val genPath = new Path(destPath, SnapshotLayout.generationFile(gen))
    if (!fs.exists(genPath)) return false
    val body = readStr(genPath)
    val snapshots = SnapshotLayout.parseGenerationSnapshots(body)
    val victim = snapshots.reverse.find(_._1 == nameOrUuid)
      .orElse(snapshots.find(_._2 == nameOrUuid))
    victim match {
      case None => false
      case Some((_, uuid)) =>
        val remaining = snapshots.filterNot(_._2 == uuid)
        val indices = SnapshotLayout.parseGenerationIndices(body)
        val newIndices = indices
          .map { case (ix, uuids) => ix -> uuids.filterNot(_ == uuid) }
          .filter(_._2.nonEmpty)
        // publish the new generation FIRST (readers atomically stop seeing
        // the victim), then garbage-collect its files
        writeStr(new Path(destPath, SnapshotLayout.generationFile(gen + 1)),
          SnapshotLayout.generationJson(remaining, newIndices))
        val out = fs.create(latestPath, true)
        try out.write(SnapshotLayout.indexLatestBytes(gen + 1))
        finally out.close()

        val survivingIds = newIndices.map { case (ix, _) =>
          SnapshotLayout.indexId(ix) }.toSet
        for ((ix, uuids) <- indices if uuids.contains(uuid)) {
          val ixDir = new Path(SnapshotLayout.indicesDir(dest, ix))
          if (fs.exists(ixDir)) {
            if (!survivingIds.contains(SnapshotLayout.indexId(ix))) {
              fs.delete(ixDir, true) // no snapshot carries this index now
            } else {
              fs.delete(new Path(ixDir, SnapshotLayout.metaDat(uuid)), false)
              for (shardDir <- fs.listStatus(ixDir) if shardDir.isDirectory) {
                val sd = shardDir.getPath
                val snapDat = new Path(sd, SnapshotLayout.snapDat(uuid))
                if (fs.exists(snapDat)) {
                  // FAIL CLOSED: the ref-count sweep deletes a data file
                  // only when it can PROVE no surviving snapshot references
                  // it. A parse failure on any manifest — the victim's or a
                  // survivor's — means that proof is unavailable, so data
                  // files in this shard dir are left in place (an orphan
                  // leak, recoverable) rather than garbage-collected (data
                  // loss for every snapshot the corrupt manifest covers).
                  val proof = try {
                    val mine = SnapshotLayout.parseShardSnapFiles(readBytes(snapDat))
                    val referenced = fs.listStatus(sd).map(_.getPath)
                      .filter(p => p.getName.startsWith("snap-") &&
                        p.getName != SnapshotLayout.snapDat(uuid))
                      .flatMap(p => SnapshotLayout.parseShardSnapFiles(readBytes(p)))
                      .toSet
                    Some((mine, referenced))
                  } catch { case _: Exception => None }
                  proof.foreach { case (mine, referenced) =>
                    mine.filterNot(referenced.contains)
                      .foreach(f => fs.delete(new Path(sd, f), false))
                  }
                  fs.delete(snapDat, false)
                }
              }
            }
          }
        }
        fs.delete(new Path(destPath, SnapshotLayout.snapDat(uuid)), false)
        fs.delete(new Path(destPath, SnapshotLayout.metaDat(uuid)), false)
        true
    }
  }

  /**
   * Compact a snapshot repo to its `keep` most recent snapshots: older
   * snapshots go through [[deleteSnapshot]]'s reference-counted GC (data
   * files shared with a surviving snapshot are kept), then the metadata
   * chain is collapsed — superseded `index-N` generation files are pruned
   * so the repo's metadata footprint is O(keep), not O(total writes).
   * The retention policy every long-lived repo needs (a streaming
   * `streamToSnapshots` repo grows one snapshot per micro-batch).
   * Returns the number of snapshots removed.
   */
  def compactRepo(spark: SparkSession, dest: String, keep: Int = 1): Int = {
    require(keep >= 1, "keep must be >= 1")
    import graft.sinks.essnapshot.SnapshotLayout
    import org.apache.hadoop.fs.Path
    val conf = spark.sparkContext.hadoopConfiguration
    val destPath = new Path(dest)
    val fs = destPath.getFileSystem(conf)
    val latestPath = new Path(destPath, SnapshotLayout.IndexLatest)
    if (!fs.exists(latestPath)) return 0
    def currentGen(): Long = {
      val in = fs.open(latestPath)
      val buf = new Array[Byte](8)
      try { in.readFully(buf); SnapshotLayout.parseIndexLatest(buf) }
      finally in.close()
    }
    val genPath = new Path(destPath, SnapshotLayout.generationFile(currentGen()))
    if (!fs.exists(genPath)) return 0
    val body = {
      val in = fs.open(genPath)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    // generation order is append order: oldest first
    val victims = SnapshotLayout.parseGenerationSnapshots(body).dropRight(keep)
    victims.foreach { case (_, uuid) => deleteSnapshot(spark, dest, uuid) }
    // each delete published a new generation; sweep every superseded one
    val live = SnapshotLayout.generationFile(currentGen())
    fs.listStatus(destPath).map(_.getPath)
      .filter { p => p.getName.startsWith("index-") && p.getName != live }
      .foreach(p => fs.delete(p, false))
    victims.size
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
