package graft.sinks.essnapshot

import java.util.UUID

/**
 * Pure path/name builders and tiny JSON codecs for the emulated ES snapshot
 * repository layout (reference: src/main/java/com/simondata/elasticfreight/
 * transport/BaseTransport.java:69-115, 144-201, 329-335 and
 * IndexingPostProcessor.java:144-246).
 *
 * Layout written by the sink:
 * {{{
 * dest/
 *   index-0                 snapshot-repo generation file (JSON)
 *   index.latest            8-byte big-endian generation number
 *   snap-<snapUuid>.dat     root snapshot metadata
 *   meta-<snapUuid>.dat     root cluster metadata (mappings/template passthrough)
 *   indices/<indexId>/
 *     meta-<snapUuid>.dat   index metadata
 *     <shard>/
 *       snap-<snapUuid>.dat per-shard snapshot metadata
 *       docs-<writer>.ndjson.gz   document payloads (layout mode)
 *   manifest.txt            index|snapshotUUID|indexId per populated shard
 *   _SUMMARY.json           JOB_COUNTER-equivalent metrics
 * }}}
 *
 * "Layout mode": document payloads are gzipped NDJSON rather than Lucene
 * segments (no embedded ES available in this environment — SURVEY.md §7.3
 * hard part #1); every orchestration step the reference performs (per-shard
 * snapshot, base-UUID stitching, missing-shard backfill, manifest merge) is
 * real.
 */
object SnapshotLayout {

  /** Deterministic index id from the index name (reference reads the ES-
    * generated random id back from the base snapshot,
    * BaseTransport.java:187-201; deterministic is strictly better for
    * idempotent re-runs and is a documented deviation). */
  def indexId(indexName: String): String =
    UUID.nameUUIDFromBytes(("graft-index:" + indexName).getBytes("UTF-8")).toString

  def indicesDir(dest: String, indexName: String): String =
    s"$dest/indices/${indexId(indexName)}"

  def shardDir(dest: String, indexName: String, shard: Int): String =
    s"${indicesDir(dest, indexName)}/$shard"

  /** reference: BaseTransport.java:329-331 */
  def snapDat(uuid: String): String = s"snap-$uuid.dat"

  /** reference: BaseTransport.java:333-335 */
  def metaDat(uuid: String): String = s"meta-$uuid.dat"

  def dataFile(writerUuid: String, gzip: Boolean = true): String =
    if (gzip) s"docs-$writerUuid.ndjson.gz" else s"docs-$writerUuid.ndjson"

  val IndexLatest = "index.latest"
  val ManifestFile = "manifest.txt"
  val SummaryFile = "_SUMMARY.json"

  def generationFile(gen: Long): String = s"index-$gen"

  /** 8-byte big-endian generation, as the reference parses it
    * (BaseTransport.java:169-179). */
  def indexLatestBytes(gen: Long): Array[Byte] =
    java.nio.ByteBuffer.allocate(8).putLong(gen).array()

  def parseIndexLatest(bytes: Array[Byte]): Long =
    java.nio.ByteBuffer.wrap(bytes).getLong

  /** Manifest line per populated shard (reference: BaseESReducer.java:317-319). */
  def manifestLine(index: String, snapshotUuid: String, indexId: String): String =
    s"$index|$snapshotUuid|$indexId"

  // ── minimal JSON emission (metadata files only — data plane never uses this) ──

  def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  def jsonObj(fields: (String, String)*): String =
    fields.map { case (k, v) => s"${jsonStr(k)}:$v" }.mkString("{", ",", "}")

  def jsonArr(items: Seq[String]): String = items.mkString("[", ",", "]")

  /** Root `index-N` generation content: snapshot list + index-name→id map. */
  def generationJson(snapshotName: String, snapshotUuid: String,
                     indexes: Seq[String]): String =
    jsonObj(
      "snapshots" -> jsonArr(Seq(jsonObj(
        "name" -> jsonStr(snapshotName),
        "uuid" -> jsonStr(snapshotUuid),
        "state" -> jsonStr("SUCCESS")))),
      "indices" -> jsonObj(indexes.map(ix =>
        ix -> jsonObj(
          "id" -> jsonStr(indexId(ix)),
          "snapshots" -> jsonArr(Seq(jsonStr(snapshotUuid))))): _*))

  /** Per-shard snap-<uuid>.dat content. */
  def shardSnapJson(snapshotName: String, index: String, shard: Int,
                    docCount: Long, bytes: Long, files: Seq[String]): String =
    jsonObj(
      "snapshot" -> jsonStr(snapshotName),
      "index" -> jsonStr(index),
      "shard" -> shard.toString,
      "doc_count" -> docCount.toString,
      "total_size_bytes" -> bytes.toString,
      "files" -> jsonArr(files.map(jsonStr)))

  /** Root snap-<uuid>.dat content. */
  def rootSnapJson(snapshotName: String, snapshotUuid: String,
                   indexes: Seq[String], totalDocs: Long): String =
    jsonObj(
      "name" -> jsonStr(snapshotName),
      "uuid" -> jsonStr(snapshotUuid),
      "state" -> jsonStr("SUCCESS"),
      "indices" -> jsonArr(indexes.map(jsonStr)),
      "total_docs" -> totalDocs.toString,
      "version" -> jsonStr("graft-layout-1"))
}
