package graft.sinks

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.ShardConfig
import graft.sinks.essnapshot.SnapshotLayout
import graft.sources.Ingest

/**
 * Golden walk of the RESTORE-read path over a committed snapshot, step by
 * step as the reference performs it (so a consumer that follows the
 * reference's discovery logic finds every file where it expects it):
 *
 *  1. `index.latest` is an 8-byte big-endian generation number and names
 *     the live `index-N` file (BaseTransport.java:169-179,
 *     getLatestIndexFilename: "index-" + bytesToLong(blob)).
 *  2. `index-N` carries `snapshots[0].uuid` and `indices[<name>].id`
 *     (BaseTransport.java:186-201, getSnapshotMetadata via ObjectMapper —
 *     parsed here with the same Jackson API).
 *  3. Root `snap-<uuid>.dat` / `meta-<uuid>.dat` follow the
 *     makeSnapshotFilename/makeMetadataFilename patterns
 *     (BaseTransport.java:329-335).
 *  4. EVERY shard 0..n-1 of the index exists as a directory — the
 *     missing-shard backfill contract (BaseTransport.java:144-167
 *     placeMissingShards) — each with its own per-shard `snap-<uuid>.dat`
 *     under the ONE stitched snapshot uuid (IndexingPostProcessor.java:
 *     195-216 renames per-reducer snap files to the base uuid; this sink
 *     writes them born-stitched).
 *  5. Every data file named by a per-shard snap manifest exists in that
 *     shard's directory, and manifest doc counts sum to the input count.
 *
 * The `.dat` BODIES are SMILE-encoded (the wire format a live ES 5.x
 * restore parses — `:)\n` header pinned below), decoded here with the
 * repo's subset reader. The remaining byte-level delta vs a live repo is
 * the field SCHEMA inside the SMILE trees and the Lucene segment payloads
 * (layout mode) — tracked in README's compatibility matrix.
 */
class SnapshotRestorePathSpec extends SparkSpec {

  test("restore-read walk discovers the snapshot exactly like the reference") {
    val dest = Files.createTempDirectory("graft-restore").toString
    val numShards = 6
    // few docs over many shards → at least one shard is likely empty; the
    // walk below asserts ALL shard dirs exist regardless
    val src = spark.range(40).toDF("event_id")
      .withColumn("payload", concat(lit("doc-"), col("event_id")))
    val docs = Ingest.fromColumns(src, "idx_restore", "event_id", numShards)
    EsSnapshot.write(docs, dest, ShardConfig(numShards), Some("restore_snap"))

    val root = Paths.get(dest)
    val mapper = new ObjectMapper()

    // step 1: index.latest → generation → index-N name
    val genBytes = Files.readAllBytes(root.resolve("index.latest"))
    assert(genBytes.length === 8, "index.latest must be an 8-byte long")
    val gen = java.nio.ByteBuffer.wrap(genBytes).getLong
    val genFile = root.resolve(s"index-$gen")
    assert(Files.exists(genFile), s"generation file index-$gen must exist")

    // step 2: snapshots[0].uuid + indices[name].id, via Jackson like the
    // reference's getSnapshotMetadata
    val tree = mapper.readTree(Files.readAllBytes(genFile))
    val snapshots = tree.get("snapshots")
    assert(snapshots.isArray && snapshots.size() === 1)
    assert(snapshots.get(0).get("state").asText() === "SUCCESS")
    val uuid = snapshots.get(0).get("uuid").asText()
    assert(uuid.nonEmpty)
    val indexInfo = tree.get("indices").get("idx_restore")
    assert(indexInfo != null, "indices map must key by index NAME")
    val indexId = indexInfo.get("id").asText()
    assert(indexId === SnapshotLayout.indexId("idx_restore"))
    assert(indexInfo.get("snapshots").get(0).asText() === uuid)

    // step 3: root metadata under the reference's file-name patterns
    assert(Files.exists(root.resolve(s"snap-$uuid.dat")))
    assert(Files.exists(root.resolve(s"meta-$uuid.dat")))

    // step 4: every shard dir exists (missing-shard backfill) with a
    // per-shard snap under the single stitched uuid
    val indexDir = root.resolve("indices").resolve(indexId)
    assert(Files.exists(indexDir.resolve(s"meta-$uuid.dat")))
    var totalDocs = 0L
    for (shard <- 0 until numShards) {
      val shardDir = indexDir.resolve(shard.toString)
      assert(Files.isDirectory(shardDir), s"shard $shard dir must exist")
      val snapFile = shardDir.resolve(s"snap-$uuid.dat")
      assert(Files.exists(snapFile), s"shard $shard snap-$uuid.dat must exist")

      // step 5: data files named in the shard manifest are all present
      // (shard snap bodies are SMILE — decode with the subset reader)
      import graft.sinks.essnapshot.Smile
      val shardTree = Smile.read(graft.sinks.essnapshot.SnapshotLayout
        .datSmileBody(Files.readAllBytes(snapFile)))
      assert(Smile.str(shardTree, "snapshot").contains("restore_snap"))
      assert(Smile.long(shardTree, "shard").contains(shard.toLong))
      totalDocs += Smile.long(shardTree, "doc_count").getOrElse(0L)
      val listed = Smile.arr(shardTree, "files")
        .collect { case Smile.SStr(s) => s }
      listed.foreach(f => assert(Files.exists(shardDir.resolve(f)),
        s"manifested data file $f must exist in shard $shard"))
      // and nothing but manifested data files survives the commit sweep
      val onDisk = Files.list(shardDir).iterator().asScala
        .map(_.getFileName.toString).filter(_.startsWith("docs-")).toSet
      assert(onDisk === listed.toSet)
    }
    assert(totalDocs === 40L)

    // .dat blobs are CodecUtil-framed SMILE: the frame verifies (magics +
    // CRC32) under its ES 5.x codec name, and the body inside leads with
    // the ":)\n" SMILE magic + flags byte a real restore expects to parse
    import graft.sinks.essnapshot.LuceneFrame
    for ((datPath, codec) <- Seq(
        root.resolve(s"snap-$uuid.dat") -> LuceneFrame.SnapshotCodec,
        root.resolve(s"meta-$uuid.dat") -> LuceneFrame.MetadataCodec,
        indexDir.resolve(s"meta-$uuid.dat") -> LuceneFrame.IndexMetadataCodec,
        indexDir.resolve("0").resolve(s"snap-$uuid.dat")
          -> LuceneFrame.SnapshotCodec)) {
      val body = LuceneFrame.unwrapExpecting(codec, Files.readAllBytes(datPath))
      val head = body.take(4)
      assert(head === Array[Byte](0x3A, 0x29, 0x0A, 0x00),
        s".dat bodies are SMILE-encoded (got ${head.mkString(",")} in $datPath)")
    }
  }
}
