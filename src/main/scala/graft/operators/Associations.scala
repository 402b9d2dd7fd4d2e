package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Market-basket association mining (Agrawal & Srikant 1994, Apriori) —
 * pairwise rules X → Y with support / confidence / lift over a
 * (basket, item) long-format frame. Corpus-curation use: co-occurrence
 * rules over (document, entity) or (session, topic) baskets drive
 * retrieval-augmentation pairing and mixture design the same way
 * co-purchase rules drive recommendations.
 *
 * EXACTNESS: support, confidence, and lift are each computed as ONE
 * IEEE division of exact longs (lift's numerator c(a,b)·n and
 * denominator c(a)·c(b) are exact long products, guarded against
 * overflow past 3·10⁹ counts) — bit-deterministic cross-engine under
 * any partitioning; no rounding anywhere.
 *
 * Scale shape (the Apriori property is the whole story at 100 TB):
 * (1) one (basket, item)-keyed distinct; (2) item counts, keys only;
 * (3) items below `minSupport` are pruned by a BROADCAST-able semi-join
 * BEFORE the pair fan-out — an infrequent item never enters the
 * self-join, which is what bounds the quadratic term (the classic
 * candidate-generation prune); (4) the per-basket self-join fans out
 * ordered pairs, bounded by frequent-items-per-basket, and collapses
 * immediately into a (a, b)-keyed count; (5) each surviving pair emits
 * its two directed rules and joins item counts — on the pruned pair
 * frame, never the fan-out. Everything that moves is (long, long)
 * keys.
 */
object Associations {

  /**
   * Pairwise association rules with at least `minSupport` co-occurring
   * baskets. Returns one row per DIRECTED rule (both a → b and b → a
   * for every frequent unordered pair): (`antecedent`, `consequent`,
   * `pair_count`, `support`, `confidence`, `lift`), ordered
   * (pair_count desc, antecedent, consequent) — an integer total
   * order — and truncated to `topK` when positive (0 = all rules).
   *
   * Duplicate (basket, item) rows collapse (a basket contains an item
   * once); an item co-occurring with itself is impossible by the a < b
   * pair orientation. Baskets with a single frequent item simply
   * produce no pairs.
   *
   * `maxBasketItems` bounds the per-basket quadratic term the Apriori
   * prune does NOT: one mega-basket of 10⁵ items fans out 5·10⁹ pairs
   * on its own. Baskets with more distinct items than the cap are
   * EXCLUDED before ANY counting (standard practice — a basket that
   * large is a crawler artifact or catalog dump and its pair evidence
   * is near-uniform noise; excluding up front keeps n, c(x) and
   * c(a,b) mutually consistent, where dropping only the pair stage
   * would corrupt confidence). Pass 0 to disable.
   */
  def associationRules(baskets: DataFrame, basketCol: String,
                       itemCol: String, minSupport: Long,
                       topK: Int = 0,
                       maxBasketItems: Long = 10000L): DataFrame = {
    require(minSupport >= 1, "minSupport must be >= 1")
    require(topK >= 0, "topK must be >= 0 (0 = unbounded)")
    require(maxBasketItems >= 0, "maxBasketItems must be >= 0")
    val bi0 = baskets
      .select(col(basketCol).cast("long").as("bk"),
        col(itemCol).cast("long").as("it"))
      .filter(col("bk").isNotNull && col("it").isNotNull)
      .distinct()
    // mega-basket exclusion up front (keys-only count + semi-join) so
    // every downstream count shares one consistent basket universe
    val bi = if (maxBasketItems > 0) {
      val ok = bi0.groupBy("bk").agg(count(lit(1)).as("sz"))
        .filter(col("sz") <= maxBasketItems).select("bk")
      bi0.join(ok, Seq("bk"), "left_semi")
    } else bi0
    // distinct (basket, item) feeds three consumers (n_baskets, item
    // counts, the pair fan-out) — materialize it once
    bi.persist()
    val nB = bi.agg(countDistinct("bk").as("n")).head().getLong(0)
    require(nB > 0, "associationRules on an empty basket frame")
    require(nB <= 3000000000L,
      "associationRules: basket count exceeds the exact-long lift range")
    val itemCounts = bi.groupBy(col("it").as("item"))
      .agg(count(lit(1)).as("c"))
      .filter(col("c") >= minSupport)
    // Apriori prune BEFORE the quadratic fan-out: a pair can only be
    // frequent if both items are (left_semi keeps the frame keys-only)
    val frequent = bi.join(
      itemCounts.select(col("item").as("it")), Seq("it"), "left_semi")
    // cut: the rules union below reads pairCounts TWICE (a→b and b→a
    // directions) — uncut, the whole quadratic basket self-join + pair
    // aggregate re-executes per direction (measured ~2× the query's
    // dominant stage at bench scale; the same doubling at any scale)
    val pairCounts = graft.core.LineageCut.cut(frequent.as("x")
      .join(frequent.as("y"),
        col("x.bk") === col("y.bk") && col("x.it") < col("y.it"))
      .groupBy(col("x.it").as("a"), col("y.it").as("b"))
      .agg(count(lit(1)).as("pair_count"))
      .filter(col("pair_count") >= minSupport))
    val rules = pairCounts
      .select(col("a").as("antecedent"), col("b").as("consequent"),
        col("pair_count"))
      .unionAll(pairCounts.select(col("b").as("antecedent"),
        col("a").as("consequent"), col("pair_count")))
      .join(itemCounts.select(col("item").as("antecedent"),
        col("c").as("ca")), "antecedent")
      .join(itemCounts.select(col("item").as("consequent"),
        col("c").as("cb")), "consequent")
      .select(col("antecedent"), col("consequent"), col("pair_count"),
        (col("pair_count").cast("double") / lit(nB.toDouble)).as("support"),
        (col("pair_count").cast("double") / col("ca").cast("double"))
          .as("confidence"),
        ((col("pair_count") * lit(nB)).cast("double") /
          (col("ca") * col("cb")).cast("double")).as("lift"))
    // only the truncated form needs an order (TakeOrderedAndProject
    // heaps); the unbounded form returns the full rule set without a
    // pointless global sort
    if (topK > 0)
      rules.orderBy(col("pair_count").desc,
        col("antecedent"), col("consequent")).limit(topK)
    else rules
  }
}
