package graft.sinks

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.ShardConfig
import graft.sinks.essnapshot.SnapshotLayout
import graft.sources.Ingest

/**
 * Snapshot repos accumulate: each write commits a NEW snapshot and
 * publishes the next generation (`index.latest` increments, `index-N`
 * lists every snapshot — the reference repo shape,
 * BaseTransport.java:169-201), and earlier snapshots stay restorable:
 * the commit sweep must never delete a file manifested by a prior
 * snapshot's snap-*.dat.
 */
class SnapshotGenerationsSpec extends SparkSpec {

  test("two writes → two generations, both snapshots restorable") {
    val dest = Files.createTempDirectory("graft-gens").toString
    val numShards = 4

    val first = Ingest.fromColumns(
      spark.range(100).toDF("event_id"), "events", "event_id", numShards)
    EsSnapshot.write(first, dest, ShardConfig(numShards), Some("snap_a"))

    val second = Ingest.fromColumns(
      spark.range(100, 160).toDF("event_id"), "events", "event_id", numShards)
    EsSnapshot.write(second, dest, ShardConfig(numShards), Some("snap_b"))

    val root = Paths.get(dest)
    // generation bumped; the live index-N lists BOTH snapshots in order
    assert(SnapshotLayout.parseIndexLatest(
      Files.readAllBytes(root.resolve("index.latest"))) === 1L)
    val genBody = Files.readString(root.resolve("index-1"))
    val snaps = SnapshotLayout.parseGenerationSnapshots(genBody)
    assert(snaps.map(_._1) === Seq("snap_a", "snap_b"))
    val Seq((_, uuidA), (_, uuidB)) = snaps
    assert(uuidA !== uuidB)
    // the index maps to both containing snapshots
    val indices = SnapshotLayout.parseGenerationIndices(genBody).toMap
    assert(indices("events") === Seq(uuidA, uuidB))
    // root metadata for both snapshots coexists
    assert(Files.exists(root.resolve(s"snap-$uuidA.dat")))
    assert(Files.exists(root.resolve(s"snap-$uuidB.dat")))

    // default read = latest snapshot only
    assert(EsSnapshot.readTable(spark, dest).count() === 60)
    // select by name: each snapshot reads back exactly its own docs
    assert(EsSnapshot.readTable(spark, dest, Some("snap_a")).count() === 100)
    assert(EsSnapshot.readTable(spark, dest, Some("snap_b")).count() === 60)
    // select by uuid works too
    assert(EsSnapshot.readTable(spark, dest, Some(uuidA)).count() === 100)

    // the second commit's sweep preserved every file the first snapshot
    // manifests (spot-check shard 0)
    val shard0 = Paths.get(SnapshotLayout.shardDir(dest, "events", 0))
    val manifestedA = SnapshotLayout.parseShardSnapFiles(
      Files.readString(shard0.resolve(s"snap-$uuidA.dat")))
    manifestedA.foreach(f =>
      assert(Files.exists(shard0.resolve(f)), s"snap_a file $f must survive"))

    // shard placement invariant holds across both snapshots
    val misplaced = EsSnapshot.readTable(spark, dest, Some("snap_a"))
      .select(get_json_object(col("json"), "$.event_id").as("id"), col("shard"))
      .collect()
      .count(r => graft.core.EsMurmur3.shard(r.getString(0), numShards) != r.getInt(1))
    assert(misplaced === 0)
  }
}
