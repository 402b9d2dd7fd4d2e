package graft.jobs

import org.apache.spark.sql.SparkSession

import graft.core.ShardConfig
import graft.sinks.EsSnapshot
import graft.sources.Ingest

/**
 * The reference's CLI job (`hadoop jar … esIndex …`, reference:
 * src/main/java/com/simondata/example/IndexingJob.java:38-108 arg surface,
 * README.md:27-62) as a spark-submit main: NDJSON in → routed envelope →
 * clustered snapshot build → manifest out.
 *
 * Usage (positional, mirroring the reference's argument order):
 * {{{
 * spark-submit --class graft.jobs.EsIndexJob <jar> \
 *   <inputPaths(pipe-separated globs)> <snapshotDest> <indexName> \
 *   <docIdField> <numShards> [snapshotName] [mappingsFile] [templateFile]
 * }}}
 *
 * The reference's bulk-batching knobs (batchSize/batchMb/flushSec,
 * IndexingJob.java:64-75) collapse into the sink's stream-flush
 * granularity (`batch.bytes` option); its ramdisk/working-dir args are
 * obsolete (writers stream straight to the destination FS).
 */
object EsIndexJob {

  final case class Args(inputPaths: Seq[String], dest: String, index: String,
                        docIdField: String, numShards: Int,
                        snapshotName: Option[String], mappings: Option[String],
                        template: Option[String])

  def parse(argv: Array[String]): Args = {
    require(argv.length >= 5,
      "usage: <inputPaths(|-sep)> <dest> <indexName> <docIdField> <numShards> " +
        "[snapshotName] [mappingsFile] [templateFile]")
    Args(
      inputPaths = argv(0).split('|').toSeq.filter(_.nonEmpty), // README.md:30-31
      dest = argv(1).stripSuffix("/"), // IndexingJob.java:94
      index = argv(2),
      docIdField = argv(3),
      numShards = argv(4).toInt,
      snapshotName = argv.lift(5),
      mappings = argv.lift(6),
      template = argv.lift(7))
  }

  def run(spark: SparkSession, args: Args): Long = {
    val mappings = args.mappings.map(Ingest.readConfigFile(spark, _))
    val template = args.template.map(Ingest.readConfigFile(spark, _))
    val raw = Ingest.ndjsonRaw(spark, args.inputPaths)
    val docs = Ingest.toIndexable(raw, args.index, args.docIdField, args.numShards)
    EsSnapshot.write(docs, args.dest, ShardConfig(args.numShards),
      args.snapshotName, mappings, template)
    EsSnapshot.readManifest(spark, args.dest).count()
  }

  def main(argv: Array[String]): Unit = {
    val args = parse(argv)
    val spark = SparkSession.builder()
      .appName(s"graft-es-index-${args.index}")
      .config("spark.sql.session.timeZone", "UTC") // Driver.java:28-29
      .getOrCreate()
    val populatedShards = run(spark, args)
    // the reference's final console signal: the manifest location
    println(s"[es-index] snapshot committed: ${args.dest} " +
      s"($populatedShards populated shards; manifest at ${args.dest}/manifest.txt)")
    spark.stop()
  }
}
