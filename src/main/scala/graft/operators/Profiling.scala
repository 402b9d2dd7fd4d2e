package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Ingest-side data profiling: per-column null counts, distinct counts,
 * and min/max in ONE aggregation pass over the frame — the "what did we
 * actually receive" gate a 100 TB drop needs before any pipeline stage
 * trusts the data (null-rate spikes and cardinality collapses are the
 * two classic upstream-breakage signatures).
 *
 * Output rows: `(col_name, n_rows, n_nulls, n_distinct, min_value,
 * max_value)` — min/max cast to string so heterogeneous columns share
 * one schema (bigint/string casts are engine-identical; profile
 * float columns with `approxDistinct` knowing their string forms are
 * engine-specific).
 *
 * Scale shape: everything partial-aggregates map-side. With exact
 * distinct counts Spark plans one Expand (input × #profiled columns) —
 * fine for a scan-bounded profile of a few columns; at the 100 TB tier
 * set `approxDistinct = true` (HLL, no Expand, one sketch per column
 * per partition moves). The final `stack` runs over the single
 * aggregated row — driver never touches data.
 */
object Profiling {

  def profile(df: DataFrame, columns: Seq[String] = Nil,
              approxDistinct: Boolean = false): DataFrame = {
    val cols = if (columns.nonEmpty) columns else df.columns.toSeq
    require(cols.nonEmpty, "nothing to profile")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in the frame: $missing")
    val aggs = cols.flatMap { c =>
      val distinct =
        if (approxDistinct) approx_count_distinct(col(c))
        else countDistinct(col(c))
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        distinct.as(s"__distinct_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val agged = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    val stackArgs = cols.map(c =>
      s"'$c', __nulls_$c, __distinct_$c, __min_$c, __max_$c").mkString(", ")
    agged.select(col("__rows"),
        expr(s"stack(${cols.size}, $stackArgs) " +
          "as (col_name, n_nulls, n_distinct, min_value, max_value)"))
      .select(col("col_name"), col("__rows").as("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_value"), col("max_value"))
  }
}
