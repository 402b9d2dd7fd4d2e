package graft.core

import graft.SparkSpec
import graft.operators.{Dedup, Similarity}

/**
 * The engine-wide lineage-cut reliability contract: every operator that
 * truncates lineage through [[LineageCut]] must produce BIT-IDENTICAL
 * results whether the cut lands executor-local (local-mode default) or
 * on a reliable checkpoint dir (the cluster mode that survives executor
 * loss). One Dedup path and one Similarity path prove the routing —
 * the Graph module's equivalent test lives in GraphSpec.
 */
class LineageCutSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river"),
    (2L, "the quick brown fox jumps over the lazy dog near the creek"),
    (3L, "an entirely different document about training data pipelines"),
    (4L, "the quick brown fox jumps over the lazy dog near the river"),
    (5L, "short text"),
    (6L, "an entirely different document about training data pipelines!")
  ).toDF("doc_id", "text")

  private def vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f)), (2L, Array(0.9f, 0.1f, 0.0f)),
    (3L, Array(0.0f, 1.0f, 0.0f)), (4L, Array(0.0f, 0.9f, 0.2f)),
    (5L, Array(0.0f, 0.0f, 1.0f)), (6L, Array(0.5f, 0.5f, 0.0f))
  ).toDF("vec_id", "embedding")

  /** Run `f` twice — default mode, then with a reliable checkpoint dir
   *  configured on the shared context — and require identical results;
   *  also require the reliable run actually wrote checkpoint files. */
  private def bothModes(f: => Set[String]): Unit = {
    val local = f
    val dir = java.nio.file.Files.createTempDirectory("graft-cut-spec")
    try {
      spark.sparkContext.setCheckpointDir(dir.toString)
      val reliable = f
      assert(reliable === local)
      val wrote = java.nio.file.Files.walk(dir).count() > 1
      assert(wrote, "reliable mode wrote nothing under the checkpoint dir")
    } finally {
      spark.sparkContext.setCheckpointDir(null)
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }

  test("Dedup.dedupe survivors identical under both cut modes") {
    bothModes {
      Dedup.dedupe(docs, "doc_id", "text", jaccardThreshold = 0.8)
        .select("doc_id").as[Long].collect().toSet.map((x: Long) => x.toString)
    }
  }

  test("Dedup.similarityJoinExact pairs identical under both cut modes") {
    bothModes {
      Dedup.similarityJoinExact(docs, "doc_id", "text", threshold = 0.5)
        .collect().map(_.toString).toSet
    }
  }

  test("Similarity.semanticDedup keepers identical under both cut modes") {
    bothModes {
      Similarity.semanticDedup(vecs, threshold = 0.9, numCells = 2,
          idCol = "vec_id", vecCol = "embedding")
        .select("vec_id").as[Long].collect().toSet.map((x: Long) => x.toString)
    }
  }
}
