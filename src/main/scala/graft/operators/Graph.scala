package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Graph centrality over edge frames (mission extension): RefinedWeb /
 * Common-Crawl-style pipelines weight documents by the link authority of
 * their host, and PageRank over the host graph is the canonical form
 * (Page et al. 1999, public literature).
 *
 * Implementation is the classic damped power iteration expressed as
 * DataFrame joins — the textbook iterative-Spark workload. Per
 * iteration: one equi-join (contribution edges × current ranks, on
 * `src`) and one aggregation (sum contributions per `dst`). Both are
 * key-partitioned shuffles of (id, double) pairs — never payloads — and
 * the contribution-edge frame (src, dst, 1/outdeg) is computed once and
 * reused every round from a checkpoint, so iteration N's lineage does
 * not replay rounds 1..N-1. Lineage is additionally truncated every few
 * rounds (iterative plans otherwise grow until analysis itself is the
 * cost). At cluster scale the same loop holds: ranks and edges are both
 * hash-partitioned by the join key, and AQE coalesces the per-round
 * exchanges.
 *
 * Dangling nodes (no out-edges) leak their damped mass — the simple
 * formulation `r' = (1-d)/N + d·Σ_in r/deg`, identical in the SQL
 * oracle, so cross-engine results agree term for term.
 */
object Graph {

  /**
   * Damped PageRank by `iters` power-iteration rounds. Returns one row
   * per node: (`node`, `pr`).
   *
   * Unweighted (`weightCol = None`): duplicate `(src, dst)` edges
   * collapse to one, contribution weight is `1/outdeg`. Weighted:
   * duplicate edges SUM their weights (so a link-count column expresses
   * link frequency naturally) and contribution weight is
   * `w / Σ_out w` — weights must be NON-NULL and strictly positive
   * (checked, fail-loud: aggregates silently skip nulls and a
   * zero/negative weight corrupts every rank downstream of its source,
   * so nulls coerce to -Infinity pre-sum and the single min-check
   * rejects all three cases at once).
   */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 10, damping: Double = 0.85,
               weightCol: Option[String] = None): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val e = (weightCol match {
      case Some(wc) => edges
        .select(col(srcCol).cast("long").as("src"),
          col(dstCol).cast("long").as("dst"),
          // null → -Inf: survives the sum (aggregates skip real nulls)
          // and trips the min > 0 check below instead of silently
          // dropping the edge's weight
          coalesce(col(wc).cast("double"), lit(Double.NegativeInfinity))
            .as("w0"))
        .groupBy("src", "dst").agg(sum("w0").as("w0"))
      case None => edges
        .select(col(srcCol).cast("long").as("src"),
          col(dstCol).cast("long").as("dst"))
        .distinct()
        .withColumn("w0", lit(1.0))
    }).localCheckpoint(false)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(false)
    val nNodes = nodes.count()
    require(nNodes > 0, "pageRank on an empty edge frame")
    if (weightCol.isDefined) {
      val minW = e.agg(min("w0")).head().getDouble(0)
      require(minW > 0 && !minW.isNaN, // NaN: mixed ±Inf sums
        s"pageRank edge weights must be non-null and strictly positive; " +
          s"min aggregated weight = $minW")
    }

    // contribution weight w/Σ_out w (1/outdeg unweighted), attached
    // once — reused every round
    val outW = e.groupBy("src").agg(sum("w0").as("ow"))
    val contribEdges = e.join(outW, "src")
      .select(col("src"), col("dst"), (col("w0") / col("ow")).as("w"))
      .localCheckpoint(false)

    val base = (1.0 - damping) / nNodes
    var ranks = nodes.select(col("node"), lit(1.0 / nNodes).as("rank"))
    var i = 1
    while (i <= iters) {
      val contribs = contribEdges
        .join(ranks, contribEdges("src") === ranks("node"))
        .groupBy("dst").agg(sum(col("rank") * col("w")).as("contrib"))
      ranks = nodes
        .join(contribs, nodes("node") === contribs("dst"), "left")
        .select(nodes("node"),
          (lit(base) + lit(damping) * coalesce(col("contrib"), lit(0.0))).as("rank"))
      // truncate lineage every 3 rounds; otherwise the plan for round N
      // contains all prior rounds and planning cost compounds
      if (i % 3 == 0 && i < iters) ranks = ranks.localCheckpoint(false)
      i += 1
    }
    ranks.select(col("node"), col("rank").as("pr"))
  }
}
