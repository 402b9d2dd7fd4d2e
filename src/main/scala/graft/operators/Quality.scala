package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Declarative data-quality expectations — the ingest/release gate a
 * 100 TB pipeline runs BEFORE a table ships (the Great-Expectations /
 * Deequ pattern, re-expressed Spark-first): a rule battery evaluates
 * in as few passes as the rule classes allow, and the output is one
 * row per rule with exact violation counts — machine-checkable
 * (`violations == 0`) and human-readable at once.
 *
 * Rule classes and their physical cost:
 *  - ROW rules (`NotNull`, `InRange`, `MatchesRegex`, `InSet`,
 *    `Custom`): ALL of them fold into ONE map-side-combined aggregate
 *    over ONE scan — adding a row rule adds a codegen'd column, never
 *    a pass.
 *  - `Unique`: one keyed aggregate per distinct key set (duplicates =
 *    rows beyond the first per key; NULL keys group like SQL GROUP BY
 *    — a duplicated NULL is a duplicate, stated).
 *  - `ForeignKey`: one distinct + LEFT ANTI join per parent (the
 *    [[Profiling.inclusionCoverage]] shape; violations = CHILD ROWS
 *    whose non-null key misses the parent, so the count is
 *    row-attributable).
 *
 * EXACTNESS: every count is an exact long from hash aggregates; no
 * floating point anywhere (`pass` is an integer comparison).
 */
object Quality {

  sealed trait Expectation { def name: String }

  /** Column must be non-null. */
  final case class NotNull(column: String) extends Expectation {
    def name: String = s"not_null($column)"
  }

  /** Non-null values must sit in [lo, hi] (inclusive). NULLs pass —
    * compose with [[NotNull]] to forbid them (stated; conflating the
    * two makes every range rule double-count nulls). */
  final case class InRange(column: String, lo: Double, hi: Double)
      extends Expectation {
    def name: String = s"in_range($column,$lo,$hi)"
  }

  /** Non-null values must fully match the Java regex. */
  final case class MatchesRegex(column: String, pattern: String)
      extends Expectation {
    def name: String = s"matches_regex($column)"
  }

  /** Non-null values must be one of the given literals. */
  final case class InSet(column: String, values: Seq[String])
      extends Expectation {
    def name: String = s"in_set($column)"
  }

  /** Arbitrary row predicate (a violation where it is false or NULL). */
  final case class Custom(name: String, predicate: Column)
      extends Expectation

  /** The key set must identify rows uniquely. */
  final case class Unique(columns: Seq[String]) extends Expectation {
    def name: String = s"unique(${columns.mkString(",")})"
  }

  /** Non-null child keys must exist in the parent key set. */
  final case class ForeignKey(column: String, parent: DataFrame,
                              parentColumn: String) extends Expectation {
    def name: String = s"foreign_key($column)"
  }

  /**
   * Evaluate the battery. Returns one row per rule, in RULE ORDER
   * (an `idx` column pins it): (`idx`, `rule`, `n_rows`, `violations`,
   * `pass`).
   *
   * Scale shape: one scan + one aggregate for ALL row rules combined,
   * plus one keyed aggregate per [[Unique]] and one distinct+anti-join
   * per [[ForeignKey]] — the result is rule-count-sized. Nothing
   * collects to the driver.
   */
  def checkExpectations(df: DataFrame,
                        rules: Seq[Expectation]): DataFrame = {
    require(rules.nonEmpty, "need at least one expectation")
    val names = rules.map(_.name)
    require(names.distinct.size == names.size,
      s"duplicate rule names: ${names.diff(names.distinct).distinct}")
    val spark = df.sparkSession

    def violation(e: Expectation): Option[Column] = e match {
      case NotNull(c) => Some(when(col(c).isNull, 1L).otherwise(0L))
      case InRange(c, lo, hi) => Some(when(col(c).isNotNull &&
        (col(c) < lo || col(c) > hi), 1L).otherwise(0L))
      case MatchesRegex(c, p) => Some(when(col(c).isNotNull &&
        !col(c).rlike("^(?:" + p + ")$"), 1L).otherwise(0L))
      case InSet(c, vs) => Some(when(col(c).isNotNull &&
        !col(c).cast("string").isin(vs: _*), 1L).otherwise(0L))
      case Custom(_, pred) =>
        Some(when(coalesce(pred, lit(false)), 0L).otherwise(1L))
      case _ => None
    }

    val rowRules = rules.zipWithIndex.flatMap { case (r, i) =>
      violation(r).map(v => (i, r.name, v))
    }
    val rowPart: Option[DataFrame] =
      if (rowRules.isEmpty) None
      else {
        val aggs = count(lit(1)).as("__n") +:
          rowRules.map { case (i, _, v) => sum(v).as(s"__v$i") }
        val one = df.agg(aggs.head, aggs.tail: _*)
        Some(one.select(explode(array(rowRules.map { case (i, n, _) =>
          struct(lit(i).as("idx"), lit(n).as("rule"),
            col("__n").as("n_rows"),
            coalesce(col(s"__v$i"), lit(0L)).as("violations"))
        }: _*)).as("__r")).select("__r.*"))
      }

    val keyedParts = rules.zipWithIndex.collect {
      case (u @ Unique(cols), i) =>
        val dups = df.groupBy(cols.map(col): _*)
          .agg(count(lit(1)).as("__c"))
          .agg(coalesce(sum(col("__c") - 1L), lit(0L)).as("violations"),
            coalesce(sum("__c"), lit(0L)).as("n_rows"))
        dups.select(lit(i).as("idx"), lit(u.name).as("rule"),
          col("n_rows"), col("violations"))
      case (f @ ForeignKey(c, parent, pc), i) =>
        val childKeys = df.filter(col(c).isNotNull).select(col(c).as("__k"))
        val parentKeys = parent.filter(col(pc).isNotNull)
          .select(col(pc).cast(df.schema(c).dataType).as("__k")).distinct()
        val miss = childKeys.join(parentKeys, Seq("__k"), "left_anti")
          .agg(count(lit(1)).as("violations"))
        val n = df.agg(count(lit(1)).as("n_rows"))
        n.crossJoin(miss).select(lit(i).as("idx"),
          lit(f.name).as("rule"), col("n_rows"), col("violations"))
    }

    val parts = rowPart.toSeq ++ keyedParts
    parts.reduce(_ unionByName _)
      .select(col("idx"), col("rule"), col("n_rows"), col("violations"),
        (col("violations") === 0L).as("pass"))
  }
}
