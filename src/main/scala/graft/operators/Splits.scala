package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.LineageCut._

/**
 * Deterministic dataset splitting for training pipelines (mission
 * extension, SURVEY.md §7.4): train/val/test assignment by hashing a
 * stable id — unlike `randomSplit`, the assignment is a pure function of
 * (id, salt), so it is reproducible across runs, cluster sizes, and
 * re-partitioning, and a document keeps its split when the corpus grows
 * (critical for eval-set hygiene: no train/test leakage on re-runs).
 *
 * Scale shape: one codegen'd hash + a when-chain per row, no shuffle.
 */
object Splits {

  private val Buckets = 1000000L

  /**
   * Adds a `split` column with the name of the assigned split. `weights`
   * are normalized; assignment is disjoint and exhaustive.
   */
  def assign(df: DataFrame, idCol: String, weights: Seq[(String, Double)],
             salt: Long = 0L, out: String = "split"): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "weights must be positive")
    val total = weights.map(_._2).sum
    // cumulative upper bucket bounds, last pinned to Buckets so rounding
    // can never leave a row unassigned
    val cum = weights.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(w => math.round(w / total * Buckets))
      .init :+ Buckets
    val h = pmod(xxhash64(col(idCol), lit(salt)), lit(Buckets))
    val chain = weights.map(_._1).zip(cum).foldLeft(Option.empty[Column]) {
      case (acc, (name, ub)) =>
        Some(acc.fold(when(h < ub, name))(_.when(h < ub, name)))
    }.get
    df.withColumn(out, chain)
  }

  /** Keep only one split — the typical consumption shape
    * (`Splits.only(df, "doc_id", weights, "train")`). */
  def only(df: DataFrame, idCol: String, weights: Seq[(String, Double)],
           name: String, salt: Long = 0L): DataFrame =
    assign(df, idCol, weights, salt).filter(col("split") === name).drop("split")

  /**
   * LEAKAGE-SAFE split: hashing raw ids puts two near-duplicate documents
   * in different splits with probability 1 - Σw², quietly leaking train
   * content into eval (the classic contamination eval papers flag).
   * Here every near-dup connected component is hashed by its CANONICAL
   * id ([[Dedup.minhashPairs]] → verify → [[Dedup.assignCanonical]]),
   * so a whole dup group always lands in ONE split; singleton docs hash
   * by their own id exactly as [[assign]] does.
   *
   * Scale shape: the dup graph is the same lean band-join machinery as
   * [[Dedup.dedupe]] (cost ∝ candidates, not n²); the split itself stays
   * a map-only hash on the joined canonical column.
   */
  def assignLeakageSafe(df: DataFrame, idCol: String, textCol: String,
                        weights: Seq[(String, Double)],
                        jaccardThreshold: Double = 0.85, salt: Long = 0L,
                        out: String = "split"): DataFrame = {
    require(!df.columns.contains("__canon") && !df.columns.contains("__lsid"),
      "columns __canon/__lsid are reserved here")
    // ids must be BIGINT: the canonical label lives in the long domain,
    // and hashing a silently-cast id would diverge from assign() for any
    // other type (a NULL-producing cast would even collapse the whole
    // corpus into one split) — fail loudly instead
    require(df.schema(idCol).dataType ==
        org.apache.spark.sql.types.LongType,
      s"$idCol must be BIGINT for leakage-safe splitting " +
        s"(got ${df.schema(idCol).dataType}); derive a long id first")
    // ONE shared (id, text) projection feeds sketch, verify, and label
    // stages (the dup-graph machinery re-scanned the source table per
    // stage otherwise); only the final label join reads the source again
    val slim = df.select(col(idCol), col(textCol)).lineageCut()
    val cand = Dedup.minhashPairs(slim, idCol, textCol,
      threshold = math.max(0.0, jaccardThreshold - 0.2)) // recall margin
      .select("id_a", "id_b")
    val verified = Dedup.verifyJaccard(cand, slim, idCol, textCol)
      .filter(col("jaccard") >= jaccardThreshold).select("id_a", "id_b")
    // alias uniquely: df may itself carry an "id" column
    val labels = Dedup.assignCanonical(
        slim.select(col(idCol).as("id")), verified)
      .select(col("id").as("__lsid"), col("canonical_id").as("__canon"))
    assign(df.join(labels, col(idCol) === col("__lsid"), "left")
        .drop("__lsid")
        // a doc outside the dup graph is its own canonical; NULL-safe
        .withColumn("__canon", coalesce(col("__canon"), col(idCol))),
      "__canon", weights, salt, out)
      .drop("__canon")
  }

  /**
   * Deterministic k-fold assignment for cross-validation: fold =
   * (md5-uniform of the id) mod k — engine-portable (the md5 hex-prefix
   * convention every sampler here uses, so the SQL oracle reproduces
   * the EXACT fold of every row, unlike xxhash-based [[assign]] whose
   * oracle is counts-only), stable across runs/partitionings, and ids
   * never migrate between folds as the corpus grows. Map-only.
   */
  def kFold(df: DataFrame, idCol: String, k: Int, seed: Long = 42L,
            out: String = "fold"): DataFrame = {
    require(k >= 2, "k must be >= 2")
    df.withColumn(out,
      conv(substring(md5(concat(lit(seed.toString), lit(":"),
        col(idCol).cast("string"))), 1, 8), 16, 10)
        .cast("long") % k)
  }
}
