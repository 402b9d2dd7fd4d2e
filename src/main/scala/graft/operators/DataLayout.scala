package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Three-dimension variant of [[clusterByZOrder]] (21 bits per
    * dimension — tenant × time × key). */
  def clusterByZOrder3(df: DataFrame, a: String, b: String, c: String,
                       numPartitions: Option[Int] = None): DataFrame = {
    require(!df.columns.contains("__z"), "column __z is reserved here")
    val withZ = df.withColumn("__z",
      graft.functions.Layout.zorder63(col(a).cast("long"),
        col(b).cast("long"), col(c).cast("long")))
    numPartitions.fold(withZ.repartitionByRange(col("__z")))(
        n => withZ.repartitionByRange(n, col("__z")))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /**
   * Quantile-bucket a column of ANY orderable type into `[0, buckets)` —
   * the domain compactor that makes [[clusterByZOrder]] usable on wide
   * longs, doubles, or timestamps (zorder62 interleaves 31-bit values;
   * a quantile rank preserves order AND equalizes bucket occupancy,
   * which is what tiles the z-plane evenly when data is skewed). One
   * bounded `percentile_approx` aggregate broadcasts back — no global
   * sort, no per-row window. Equal values always share a bucket.
   */
  def withQuantileBucket(df: DataFrame, valueCol: Column, out: String,
                         buckets: Int = 1024): DataFrame = {
    require(buckets > 1 && buckets <= 4096,
      "buckets in (1, 4096] — bucket resolution, not cardinality")
    require(!df.columns.contains("__qb_bnds") && !df.columns.contains("__qb_v"),
      "columns __qb_v/__qb_bnds are reserved")
    val qs = (1 until buckets).map(i => i.toDouble / buckets)
    val bounds = df.select(valueCol.cast("double").as("__qb_v"))
      .agg(expr(s"percentile_approx(__qb_v, array(${qs.mkString(",")}), " +
        s"${math.min(buckets * 4, 10000)})").as("__qb_bnds"))
    // NULL values stay NULL (a NULL never orders into any bucket; without
    // the guard `b < NULL` is NULL, filter() drops it, and size() = 0
    // silently co-clusters null rows with the smallest values)
    df.crossJoin(broadcast(bounds))
      .withColumn(out,
        when(valueCol.isNull, lit(null).cast("long")).otherwise(
          size(filter(col("__qb_bnds"), b => b < valueCol.cast("double")))
            .cast("long")))
      .drop("__qb_bnds")
  }
}
