package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Concat-and-split sequence packing (mission extension, SURVEY.md §7.4):
 * lay every document's tokens end to end in a deterministic global order
 * and cut the stream every `seqLen` tokens — the standard way LLM
 * training examples are built from a corpus (each document lands at a
 * global token offset; sequence `i` is tokens `[i*seqLen, (i+1)*seqLen)`,
 * and a document may straddle a cut).
 *
 * The global order is `md5(seed:id)` (tie-break on id) — the same
 * engine-portable hash order [[Samples]] uses, so the packing doubles as
 * the corpus SHUFFLE for training (hash order is uniform, independent of
 * input layout, and reproducible by any engine from (seed, id) alone).
 *
 * Scale shape: a naive exact packing is one global-order window — a
 * single task sorting the corpus. Instead the hash order is factored
 * through its own prefix: rows group by the first `chunkChars` hex chars
 * of the hash (16^chunkChars chunks whose lexicographic order EXTENDS the
 * hash order), per-chunk token sums roll into exact exclusive prefix
 * offsets over a summary frame (16^chunkChars rows, the only global
 * sort), and each chunk's running sum starts from its offset. Exact long
 * arithmetic end to end — the assignment is provably identical for every
 * `chunkChars`, so the knob only sizes tasks: pick it so one chunk
 * (corpus_tokens / 16^chunkChars) fits a task's sort budget; the default
 * 3 gives 4096-way parallelism.
 */
object Packing {

  /**
   * Assigns each row its packed position: `seq_id` (which training
   * sequence its first token lands in) and `seq_pos` (token offset within
   * that sequence). `costCol` is the row's token count; rows with cost 0
   * occupy no space but still get the position they straddle.
   */
  def packSequences(df: DataFrame, idCol: String, costCol: String,
                    seqLen: Long, seed: Long = 42L,
                    chunkChars: Int = 3): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    require(chunkChars >= 1 && chunkChars <= 8, "chunkChars in [1,8]")
    val reserved = df.columns.filter(_.startsWith("__"))
    require(reserved.isEmpty,
      s"column names starting with __ are reserved here: ${reserved.toSet}")
    val withH = df
      .withColumn("__h",
        md5(concat(lit(seed.toString), lit(":"), col(idCol).cast("string"))))
      .withColumn("__chunk", substring(col("__h"), 1, chunkChars))
    // exact exclusive prefix offsets over the chunk summary (the only
    // global-order window — 16^chunkChars rows, one tiny task)
    val sums = withH.groupBy("__chunk")
      .agg(sum(col(costCol).cast("long")).as("__csum"))
    val offW = Window.orderBy(col("__chunk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sums
      .withColumn("__off", coalesce(sum(col("__csum")).over(offW), lit(0L)))
      .select("__chunk", "__off")
    // parallel within-chunk running sums, stitched by the offsets
    val w = Window.partitionBy(col("__chunk"))
      .orderBy(col("__h").asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    withH.join(broadcast(offsets), Seq("__chunk"))
      .withColumn("__start",
        col("__off") + coalesce(sum(col(costCol).cast("long")).over(w), lit(0L)))
      .withColumn("seq_id", expr(s"__start div ${seqLen}L"))
      .withColumn("seq_pos", col("__start") % seqLen)
      .drop("__h", "__chunk", "__off", "__start")
  }

  /**
   * CURRICULUM sequence packing — [[packSequences]] with an explicit
   * training order (easy-to-hard by a difficulty score, short-to-long by
   * length, …) instead of the hash shuffle: rows lay out by
   * (`priorityValue` asc, id) and cut every `seqLen` tokens. Same
   * exact-prefix-sum factorization, but chunks come from approximate
   * QUANTILES of the priority value (equal values always share a chunk,
   * so chunk order extends the total order — the
   * `Samples.byTokenBudgetScalable` pattern); quantile error only skews
   * chunk sizes, never the assignment. No global-order window task.
   */
  def packSequencesBy(df: DataFrame, idCol: String, costCol: String,
                      seqLen: Long, priorityValue: Column,
                      chunks: Int = 64): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    require(chunks > 1, "need at least 2 chunks")
    val reserved = df.columns.filter(_.startsWith("__"))
    require(reserved.isEmpty,
      s"column names starting with __ are reserved here: ${reserved.toSet}")
    val withP = df.withColumn("__p", priorityValue.cast("double"))
    val qs = (1 until chunks).map(i => i.toDouble / chunks)
    val bounds = withP.agg(
      expr(s"percentile_approx(__p, array(${qs.mkString(",")}), 1000)")
        .as("__bnds"))
    val chunked = withP.crossJoin(broadcast(bounds))
      .withColumn("__chunk",
        size(filter(col("__bnds"), b => b < col("__p")))) // 0..chunks-1
      .drop("__bnds")
    val sums = chunked.groupBy("__chunk")
      .agg(sum(col(costCol).cast("long")).as("__csum"))
    val offW = Window.orderBy(col("__chunk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sums
      .withColumn("__off", coalesce(sum(col("__csum")).over(offW), lit(0L)))
      .select("__chunk", "__off")
    val w = Window.partitionBy(col("__chunk"))
      .orderBy(col("__p").asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    chunked.join(broadcast(offsets), Seq("__chunk"))
      .withColumn("__start",
        col("__off") + coalesce(sum(col(costCol).cast("long")).over(w), lit(0L)))
      .withColumn("seq_id", expr(s"__start div ${seqLen}L"))
      .withColumn("seq_pos", col("__start") % seqLen)
      .drop("__p", "__chunk", "__off", "__start")
  }

  /**
   * Length-bucketed BATCHING — the inference/eval-side sibling of
   * [[packSequences]]: group rows of similar token length into
   * fixed-size batches so per-batch padding (to the batch max) stays
   * small. Rows bucket by `costCol div bucketWidth`; within a length
   * bucket they order by the same engine-portable md5 hash and cut
   * every `batchSize` rows. Adds `length_bucket`, `batch_id` (dense
   * within its bucket), `batch_pos`.
   *
   * Same scale factorization as [[packSequences]], over COUNTS instead
   * of token sums: a hot length bucket (most web docs cluster around
   * the median) never sorts in one task — hash-prefix chunks compute
   * exact exclusive row-number offsets over a (bucket × 16^chunkChars)
   * summary frame, and the row number is provably chunking-invariant.
   */
  def batchByLength(df: DataFrame, idCol: String, costCol: String,
                    bucketWidth: Long, batchSize: Int, seed: Long = 42L,
                    chunkChars: Int = 2): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(batchSize > 0, "batchSize must be positive")
    require(chunkChars >= 1 && chunkChars <= 8, "chunkChars in [1,8]")
    val reserved = df.columns.filter(_.startsWith("__"))
    require(reserved.isEmpty,
      s"column names starting with __ are reserved here: ${reserved.toSet}")
    // col(costCol), not a spliced SQL string — a cost column named with
    // spaces/dots/hyphens must resolve like everywhere else in this file
    val withH = df
      .withColumn("__c", col(costCol).cast("long"))
      .withColumn("length_bucket", expr(s"__c div ${bucketWidth}L"))
      .drop("__c")
      .withColumn("__h",
        md5(concat(lit(seed.toString), lit(":"), col(idCol).cast("string"))))
      .withColumn("__chunk", substring(col("__h"), 1, chunkChars))
    val counts = withH.groupBy("length_bucket", "__chunk")
      .agg(count(lit(1)).as("__cnt"))
    val offW = Window.partitionBy(col("length_bucket")).orderBy(col("__chunk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("__off", coalesce(sum(col("__cnt")).over(offW), lit(0L)))
      .select("length_bucket", "__chunk", "__off")
    val w = Window.partitionBy(col("length_bucket"), col("__chunk"))
      .orderBy(col("__h").asc, col(idCol).asc)
    withH.join(broadcast(offsets), Seq("length_bucket", "__chunk"))
      .withColumn("__rn", col("__off") + row_number().over(w) - 1)
      .withColumn("batch_id", expr(s"__rn div ${batchSize}L"))
      .withColumn("batch_pos", col("__rn") % batchSize)
      .drop("__h", "__chunk", "__off", "__rn")
  }
}
