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
 * CHECKPOINT RELIABILITY: truncating lineage means the truncated blocks
 * are the ONLY copy of the iteration state. `localCheckpoint` stores
 * them executor-local and non-replicated — free and fine on local[n],
 * but on a real cluster one lost executor after truncation fails the
 * job unrecoverably (the lineage that could recompute the blocks is
 * gone by design). Pass `checkpointDir` (or pre-set
 * `sparkContext.setCheckpointDir`) to switch every truncation to
 * RELIABLE `checkpoint()` on the cluster FS — the mode a 100 TB run
 * must use; local mode keeps the zero-IO default.
 *
 * Dangling nodes (no out-edges) leak their damped mass by default —
 * the simple formulation `r' = (1-d)/N + d·Σ_in r/deg`, identical in
 * the SQL oracle, so cross-engine results agree term for term. Set
 * `redistributeDangling` for the mass-conserving form
 * `r' = (1-d)/N + d·(Σ_in r/deg + m_dangling/N)` (m_dangling = total
 * rank on dangling nodes), under which ranks sum to 1 every round —
 * the convention real host-authority weighting usually wants.
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
   * `w / Σ_out w` — weights must be NON-NULL, strictly positive and
   * non-NaN (checked, fail-loud: aggregates silently skip nulls, a
   * zero/negative weight corrupts every rank downstream of its source,
   * and a NaN poisons them outright — so nulls coerce to -Infinity
   * pre-sum for the min-check, and NaNs are counted explicitly because
   * `min` sorts NaN ABOVE all real values and would otherwise let a
   * NaN mixed with positive weights slip through).
   *
   * `checkpointDir`: when set (or when the context already has a
   * checkpoint dir), lineage truncation uses reliable `checkpoint()`
   * there instead of executor-local `localCheckpoint` — survives
   * executor loss; required at cluster scale (see object doc).
   *
   * `redistributeDangling`: when true, each round adds the dangling
   * nodes' pooled rank, divided evenly, to every node's contribution —
   * ranks then sum to 1 (mass-conserving PageRank). Costs one extra
   * O(nodes) join + scalar aggregate per round.
   */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 10, damping: Double = 0.85,
               weightCol: Option[String] = None,
               checkpointDir: Option[String] = None,
               redistributeDangling: Boolean = false): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val sc = edges.sparkSession.sparkContext
    checkpointDir.foreach(sc.setCheckpointDir)
    val reliable = sc.getCheckpointDir.isDefined
    // one truncation mode for every cut in the loop: reliable checkpoint
    // when a cluster-FS dir is available, executor-local otherwise
    def cut(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint(eager = true)
      else df.localCheckpoint(true)
    val e = cut(weightCol match {
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
    })
    val nodes = cut(e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct())
    val nNodes = nodes.count()
    require(nNodes > 0, "pageRank on an empty edge frame")
    if (weightCol.isDefined) {
      // min() alone cannot catch a NaN mixed with real weights (Spark
      // orders NaN greater than every value), so count NaNs explicitly
      val row = e.agg(min("w0").as("mn"),
        sum(when(isnan(col("w0")), 1L).otherwise(0L)).as("nans")).head()
      val minW = row.getDouble(0)
      val nans = row.getLong(1)
      require(nans == 0 && minW > 0 && !minW.isNaN,
        s"pageRank edge weights must be non-null, non-NaN and strictly " +
          s"positive; min aggregated weight = $minW, NaN weights = $nans")
    }

    // contribution weight w/Σ_out w (1/outdeg unweighted), attached
    // once — reused every round
    val outW = e.groupBy("src").agg(sum("w0").as("ow"))
    val contribEdges = cut(e.join(outW, "src")
      .select(col("src"), col("dst"), (col("w0") / col("ow")).as("w")))

    // dangling = nodes with no out-edges; their pooled rank is the
    // per-round redistribution mass (computed only when requested)
    val dangling =
      if (redistributeDangling)
        cut(nodes.join(e.select(col("src").as("node")).distinct(),
          Seq("node"), "left_anti"))
      else null

    val base = (1.0 - damping) / nNodes
    var ranks = nodes.select(col("node"), lit(1.0 / nNodes).as("rank"))
    var i = 1
    while (i <= iters) {
      val contribs = contribEdges
        .join(ranks, contribEdges("src") === ranks("node"))
        .groupBy("dst").agg(sum(col("rank") * col("w")).as("contrib"))
      val next = nodes
        .join(contribs, nodes("node") === contribs("dst"), "left")
      ranks =
        if (redistributeDangling) {
          // one-row frame: Σ rank over dangling nodes this round (a
          // broadcast-nested-loop of a single row — no data-sized join)
          val dm = ranks.join(dangling, Seq("node"), "left_semi")
            .agg(coalesce(sum("rank"), lit(0.0)).as("dm"))
          next.crossJoin(dm)
            .select(nodes("node"),
              (lit(base) + lit(damping) *
                (coalesce(col("contrib"), lit(0.0)) +
                  col("dm") / nNodes)).as("rank"))
        } else next.select(nodes("node"),
          (lit(base) + lit(damping) * coalesce(col("contrib"), lit(0.0))).as("rank"))
      // truncate lineage every 3 rounds; otherwise the plan for round N
      // contains all prior rounds (TWO copies per round when the
      // dangling branch reads `ranks` a second time) and planning cost
      // compounds
      if (i % 3 == 0 && i < iters) ranks = cut(ranks)
      i += 1
    }
    ranks.select(col("node"), col("rank").as("pr"))
  }

  /**
   * HITS hubs-and-authorities (Kleinberg 1999, "Authoritative sources
   * in a hyperlinked environment") — the second classic link-analysis
   * centrality next to [[pageRank]], and the one that separates
   * DIRECTORY pages (hubs: link to many good authorities) from CONTENT
   * pages (authorities: linked from many good hubs). For corpus
   * curation the authority score is the seed-quality signal; the hub
   * score finds the link farms to discount.
   *
   * Per round: `a(v) = Σ_{u→v} h(u)`, L2-normalized; then
   * `h(u) = Σ_{u→v} a(v)`, L2-normalized — two equi-joins + two
   * aggregations over (id, double) pairs and two one-row norm frames
   * (broadcast back; no data-sized join). Duplicate edges collapse
   * (unweighted adjacency, the classic formulation). Same lineage
   * discipline and `checkpointDir` reliability contract as
   * [[pageRank]]: truncations every 2 rounds, reliable `checkpoint()`
   * on a cluster FS when configured.
   *
   * With ≥ 1 edge the norms are always strictly positive (induction:
   * the round's normalized scores have norm 1, so some score is
   * positive, and every positive authority has an in-edge whose source
   * then accrues positive hub mass), so the divisions cannot NaN.
   *
   * Returns one row per node: (`node`, `hub`, `auth`).
   */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
           iters: Int = 10,
           checkpointDir: Option[String] = None): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val sc = edges.sparkSession.sparkContext
    checkpointDir.foreach(sc.setCheckpointDir)
    val reliable = sc.getCheckpointDir.isDefined
    def cut(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint(eager = true)
      else df.localCheckpoint(true)
    val e = cut(edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .distinct())
    val nodes = cut(e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct())
    require(!nodes.isEmpty, "hits on an empty edge frame")

    var hubs = nodes.select(col("node"), lit(1.0).as("h"))
    var auths: DataFrame = null
    var i = 1
    while (i <= iters) {
      val aRaw = nodes.join(
          e.join(hubs, e("src") === hubs("node"))
            .groupBy("dst").agg(sum("h").as("v")),
          nodes("node") === col("dst"), "left")
        .select(nodes("node"), coalesce(col("v"), lit(0.0)).as("ar"))
      val aNorm = aRaw.agg(sqrt(sum(col("ar") * col("ar"))).as("nrm"))
      auths = aRaw.crossJoin(broadcast(aNorm))
        .select(col("node"), (col("ar") / col("nrm")).as("a"))
      val hRaw = nodes.join(
          e.join(auths, e("dst") === auths("node"))
            .groupBy("src").agg(sum("a").as("v")),
          nodes("node") === col("src"), "left")
        .select(nodes("node"), coalesce(col("v"), lit(0.0)).as("hr"))
      val hNorm = hRaw.agg(sqrt(sum(col("hr") * col("hr"))).as("nrm"))
      hubs = hRaw.crossJoin(broadcast(hNorm))
        .select(col("node"), (col("hr") / col("nrm")).as("h"))
      if (i % 2 == 0 && i < iters) {
        hubs = cut(hubs)
        auths = cut(auths)
      }
      i += 1
    }
    hubs.join(auths.select(col("node").as("__an"), col("a")),
        col("node") === col("__an"))
      .select(col("node"), col("h").as("hub"), col("a").as("auth"))
  }
}
