package graft.sinks.essnapshot

import java.io.{BufferedReader, InputStreamReader}
import java.util.zip.GZIPInputStream

import scala.collection.mutable

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/**
 * Read side of the `es-snapshot` format: a committed snapshot scans back
 * as a table of `(index, shard, json)` with ONE InputPartition per
 * (index, shard) directory — restore parallelism == shard topology, the
 * same property a live ES restore has (one shard = one recovery unit).
 *
 * Shard-level pruning: filters on `shard`/`index` push down into the
 * directory listing (SupportsPushDownFilters), so a targeted-routing read
 * (X2's `getPossibleRoutingHashes` use case — find one document's shard,
 * read only it) touches 1/numShards of the data.
 */
class EsSnapshotScanBuilder(dest: String, conf: SerializableConfiguration,
                            snapshot: Option[String] = None)
    extends ScanBuilder with SupportsPushDownFilters {

  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, rest) = filters.partition {
      case EqualTo("shard" | "index", _) => true
      case In("shard" | "index", _) => true
      case GreaterThan("shard", _) | GreaterThanOrEqual("shard", _) => true
      case LessThan("shard", _) | LessThanOrEqual("shard", _) => true
      case _ => false
    }
    pushed = supported
    rest ++ supported // Spark re-evaluates for exactness; pruning is a speedup
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new EsSnapshotScan(dest, conf, pushed, snapshot)
}

object EsSnapshotRead {
  val Schema: StructType = StructType(Seq(
    StructField("index", StringType, nullable = false),
    StructField("shard", IntegerType, nullable = false),
    StructField("json", StringType, nullable = false)))
}

case class ShardInputPartition(index: String, shard: Int,
                               files: Seq[String]) extends InputPartition

class EsSnapshotScan(dest: String, conf: SerializableConfiguration,
                     filters: Array[Filter],
                     snapshot: Option[String] = None) extends Scan with Batch {
  override def readSchema(): StructType = EsSnapshotRead.Schema
  override def toBatch: Batch = this
  override def description(): String =
    s"es-snapshot read $dest [snapshot ${snapshot.getOrElse("<latest>")}; " +
      s"pruned by ${filters.mkString(", ")}]"

  private def shardAdmitted(shard: Int): Boolean = filters.forall {
    case EqualTo("shard", v: Int) => shard == v
    case In("shard", vs) => vs.exists(v => v == shard)
    case GreaterThan("shard", v: Int) => shard > v
    case GreaterThanOrEqual("shard", v: Int) => shard >= v
    case LessThan("shard", v: Int) => shard < v
    case LessThanOrEqual("shard", v: Int) => shard <= v
    case _ => true
  }

  private def indexAdmitted(indexId: String): Boolean = true // resolved below

  override def planInputPartitions(): Array[InputPartition] = {
    val fs = new Path(dest).getFileSystem(conf.value)
    val indicesDir = new Path(dest, "indices")
    if (!fs.exists(indicesDir)) return Array.empty
    def readStr(p: Path): String = {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    def readBytes(p: Path): Array[Byte] = SnapshotLayout.readBytes(fs, p)
    // live generation via index.latest (BaseTransport.java:169-179), like
    // a restore does; fall back to index-0 for hand-built layouts
    val latest = new Path(dest, SnapshotLayout.IndexLatest)
    val genN: Long =
      if (fs.exists(latest)) {
        val in = fs.open(latest)
        val buf = new Array[Byte](8)
        try { in.readFully(buf); SnapshotLayout.parseIndexLatest(buf) }
        catch { case _: Exception => 0L } finally in.close()
      } else 0L
    val gen = new Path(dest, SnapshotLayout.generationFile(genN))
    val genBody = if (fs.exists(gen)) readStr(gen) else ""
    // snapshot selection: by name (latest with that name) or uuid;
    // default = the repo's most recent snapshot
    val known = SnapshotLayout.parseGenerationSnapshots(genBody)
    val wantedUuid: Option[String] = snapshot match {
      case Some(sel) => known.reverse.find(_._1 == sel).map(_._2).orElse(Some(sel))
      case None => known.lastOption.map(_._2)
    }
    val nameFilterAdmits: String => Boolean = {
      val wanted = filters.collect {
        case EqualTo("index", v: String) => Set(v)
        case In("index", vs) => vs.collect { case s: String => s }.toSet
      }.reduceOption(_ intersect _)
      name => wanted.forall(_.contains(name))
    }
    val parts = mutable.ArrayBuffer.empty[InputPartition]
    for (ixDir <- fs.listStatus(indicesDir) if ixDir.isDirectory) {
      val indexId = ixDir.getPath.getName
      // recover the index name from the generation JSON (id appears once)
      val name = ("\"([^\"]+)\":\\{\"id\":\"" + java.util.regex.Pattern.quote(indexId) + "\"").r
        .findFirstMatchIn(genBody).map(_.group(1)).getOrElse(indexId)
      if (nameFilterAdmits(name)) {
        for (shardDir <- fs.listStatus(ixDir.getPath) if shardDir.isDirectory) {
          val shard = shardDir.getPath.getName.toIntOption.getOrElse(-1)
          if (shard >= 0 && shardAdmitted(shard)) {
            // snapshot-scoped file set from the shard's snap manifest (the
            // restore unit); fall back to all data files when no manifest
            // exists (hand-built layouts)
            val manifested: Option[Set[String]] = wantedUuid.flatMap { uuid =>
              val snapDat = new Path(shardDir.getPath, SnapshotLayout.snapDat(uuid))
              if (fs.exists(snapDat))
                Some(SnapshotLayout.parseShardSnapFiles(readBytes(snapDat)).toSet)
              else None
            }
            val files = fs.listStatus(shardDir.getPath)
              .filter(_.getPath.getName.startsWith("docs-"))
              .filter(f => manifested.forall(_.contains(f.getPath.getName)))
              .map(_.getPath.toString).toSeq
            if (files.nonEmpty) parts += ShardInputPartition(name, shard, files)
          }
        }
      }
    }
    parts.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ShardReaderFactory(conf)
}

class ShardReaderFactory(conf: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ShardInputPartition]
    new PartitionReader[InternalRow] {
      private val fileIter = p.files.iterator
      private var reader: BufferedReader = null
      private var line: String = null
      private val indexUtf8 = UTF8String.fromString(p.index)

      private def nextReader(): Boolean = {
        if (reader != null) reader.close()
        if (!fileIter.hasNext) { reader = null; false }
        else {
          val path = new Path(fileIter.next())
          val fs = path.getFileSystem(conf.value)
          val raw: java.io.InputStream = fs.open(path)
          val in = if (path.getName.endsWith(".gz")) new GZIPInputStream(raw) else raw
          reader = new BufferedReader(new InputStreamReader(in, "UTF-8"))
          true
        }
      }

      override def next(): Boolean = {
        while (true) {
          if (reader == null && !nextReader()) return false
          line = reader.readLine()
          if (line != null) return true
          reader.close(); reader = null
        }
        false
      }

      override def get(): InternalRow =
        InternalRow(indexUtf8, p.shard, UTF8String.fromString(line))

      override def close(): Unit = if (reader != null) reader.close()
    }
  }
}
