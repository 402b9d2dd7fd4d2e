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

  /** Root `index-N` generation content: full snapshot list + index-name→
    * (id, containing-snapshot-uuids) map — the repo-level view a restore
    * reads (BaseTransport.java:186-201). Multi-snapshot: each commit
    * appends itself and rewrites the next generation. */
  def generationJson(snapshots: Seq[(String, String)],
                     indices: Seq[(String, Seq[String])]): String =
    jsonObj(
      "snapshots" -> jsonArr(snapshots.map { case (name, uuid) =>
        jsonObj(
          "name" -> jsonStr(name),
          "uuid" -> jsonStr(uuid),
          "state" -> jsonStr("SUCCESS"))
      }),
      "indices" -> jsonObj(indices.map { case (ix, uuids) =>
        ix -> jsonObj(
          "id" -> jsonStr(indexId(ix)),
          "snapshots" -> jsonArr(uuids.map(jsonStr)))
      }: _*))

  // ── generation/manifest JSON parsing (Jackson, as the reference's
  //    getSnapshotMetadata does — BaseTransport.java:186-201) ──

  private def mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** (name, uuid) per snapshot, in commit order. */
  def parseGenerationSnapshots(body: String): Seq[(String, String)] = {
    val t = mapper.readTree(body)
    val arr = t.get("snapshots")
    if (arr == null || !arr.isArray) Seq.empty
    else (0 until arr.size()).map { i =>
      (arr.get(i).get("name").asText(), arr.get(i).get("uuid").asText())
    }
  }

  /** (indexName, snapshotUuids) per index. */
  def parseGenerationIndices(body: String): Seq[(String, Seq[String])] = {
    val t = mapper.readTree(body)
    val ix = t.get("indices")
    if (ix == null || !ix.isObject) Seq.empty
    else {
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, Seq[String])]
      val names = ix.fieldNames()
      while (names.hasNext) {
        val name = names.next()
        val snaps = ix.get(name).get("snapshots")
        val uuids =
          if (snaps == null || !snaps.isArray) Seq.empty[String]
          else (0 until snaps.size()).map(snaps.get(_).asText())
        out += ((name, uuids))
      }
      out.toSeq
    }
  }

  /** Data files listed in a per-shard snap-<uuid>.dat manifest. */
  def parseShardSnapFiles(body: String): Seq[String] = {
    val files = mapper.readTree(body).get("files")
    if (files == null || !files.isArray) Seq.empty
    else (0 until files.size()).map(files.get(_).asText())
  }

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
