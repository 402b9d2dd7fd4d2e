package graft.sinks

import java.net.URI

/**
 * A registered non-`file` Hadoop scheme (`graftmock://`) backed by local
 * disk — stands in for the reference's remote transports (S3/HDFS,
 * S3SnapshotTransport.java:49-193, HDFSSnapshotTransport.java:53-111) to
 * prove the sink's single Hadoop `FileSystem` path really is
 * transport-agnostic: every byte must flow through THIS FileSystem's
 * create/rename/list/delete, not through java.io side doors.
 */
class MockSchemeFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "graftmock"
  override def getUri: URI = URI.create("graftmock:///")
}
