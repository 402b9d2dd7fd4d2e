package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Multi-dimensional data layout (mission extension, SURVEY.md §7.4): at
 * 100 TB the dominant cost is the SCAN, and scans are won before the
 * query runs — by writing files whose min/max column stats are tight for
 * the predicates that matter. A single-key sort tightens one column;
 * Z-ordering tightens BOTH join/filter dimensions at once (each written
 * file covers a small tile of the (a, b) plane), so parquet row-group
 * pruning works for queries filtering on either — the same capability
 * Delta/Iceberg expose as OPTIMIZE ZORDER, absent from vanilla Spark.
 */
object DataLayout {

  /**
   * Re-layout `df` so rows are range-partitioned and sorted by the
   * Z-order (Morton) value of `(a, b)` — write the result out to get
   * two-dimensionally prunable files. Columns are masked to their low 31
   * bits (rank/bucket wider domains first). Pass `numPartitions` sized to
   * the target FILE size (total bytes / ~1 GB); an explicit count also
   * keeps AQE from coalescing the layout into fewer, fatter tiles.
   */
  def clusterByZOrder(df: DataFrame, a: String, b: String,
                      numPartitions: Option[Int] = None): DataFrame = {
    require(!df.columns.contains("__z"), "column __z is reserved here")
    val withZ = df.withColumn("__z",
      graft.functions.Layout.zorder62(col(a).cast("long"), col(b).cast("long")))
    numPartitions.fold(withZ.repartitionByRange(col("__z")))(
        n => withZ.repartitionByRange(n, col("__z")))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
