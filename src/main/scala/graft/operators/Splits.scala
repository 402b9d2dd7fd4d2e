package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
}
