package graft.core

import org.apache.spark.sql.Dataset

/**
 * Engine-wide lineage-truncation helper — ONE reliability contract for
 * every operator that cuts lineage (iterative loops, frames consumed by
 * multiple downstream jobs, expensive derivations referenced twice).
 *
 * Truncating lineage means the truncated blocks become the ONLY copy of
 * the data: the plan that could recompute them is discarded by design.
 * `localCheckpoint` stores those blocks executor-local and
 * non-replicated — free and fine on local[n], but on a real cluster one
 * lost executor after truncation fails the job unrecoverably. When the
 * SparkContext has a checkpoint directory configured
 * (`sparkContext.setCheckpointDir` on a cluster FS), every cut made
 * through this helper switches to RELIABLE `checkpoint()` there — the
 * mode a 100 TB run must use; local mode keeps the zero-IO default.
 *
 * This is the same contract the Graph module's iterative loops exposed
 * first (`pageRank`/`connectedComponents`/... `checkpointDir` params);
 * lifted here so Dedup/Similarity/Splits/CorpusPipeline/LangModel/
 * Classifier single-pass caches obey it too instead of hardcoding
 * `localCheckpoint`. Streaming parity-drive memory-sink pins are the
 * one deliberate exemption: those frames are test scratch re-derivable
 * from the in-memory sink, not pipeline state.
 *
 * Both modes are EAGER (materialize now): every call site relies on the
 * cut frame being computed exactly once before fan-out.
 */
object LineageCut {

  /** Truncate `ds`'s lineage: reliable `checkpoint()` when the context
   *  has a checkpoint dir configured, executor-local `localCheckpoint`
   *  otherwise. Eager in both modes. */
  def cut[T](ds: Dataset[T]): Dataset[T] =
    if (ds.sparkSession.sparkContext.getCheckpointDir.isDefined)
      ds.checkpoint(eager = true)
    else ds.localCheckpoint(eager = true)

  /** Chainable form: `df.transform(...).lineageCut()`. */
  implicit class CutOps[T](private val ds: Dataset[T]) extends AnyVal {
    def lineageCut(): Dataset[T] = cut(ds)
  }
}
