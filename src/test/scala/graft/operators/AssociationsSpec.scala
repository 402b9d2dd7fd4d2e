package graft.operators

import graft.SparkSpec

/** Association rules: hand-counted support/confidence/lift, Apriori
  * pruning, duplicate-collapse, and top-k order. */
class AssociationsSpec extends SparkSpec {

  import spark.implicits._

  // b1:{1,2,3} b2:{1,2} b3:{1,2,4} b4:{3,4}; item 5 is a hapax and the
  // duplicated (b2, 1) row must collapse
  private val rows = Seq(
    (1L, 1L), (1L, 2L), (1L, 3L),
    (2L, 1L), (2L, 2L), (2L, 1L),
    (3L, 1L), (3L, 2L), (3L, 4L),
    (4L, 3L), (4L, 4L), (4L, 5L))

  test("associationRules: hand-computed rule pair, exact metrics") {
    val got = Associations.associationRules(
        rows.toDF("order_id", "part_id"), "order_id", "part_id",
        minSupport = 2L)
      .as[(Long, Long, Long, Double, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // only {1,2} co-occurs in ≥2 baskets (3 of 4): two directed rules
    assert(got.keySet === Set((1L, 2L), (2L, 1L)))
    got.values.foreach { r =>
      assert(r._3 === 3L)
      assert(r._4 === 3.0 / 4.0)   // support
      assert(r._5 === 3.0 / 3.0)   // confidence (both items in 3 baskets)
      assert(r._6 === 12.0 / 9.0)  // lift = 3·4 / (3·3), single division
    }
  }

  test("associationRules: minSupport=1 keeps every co-pair; topK truncates on the integer order") {
    val all = Associations.associationRules(
        rows.toDF("order_id", "part_id"), "order_id", "part_id",
        minSupport = 1L)
      .as[(Long, Long, Long, Double, Double, Double)].collect()
    // unordered co-pairs: {1,2}×3, {1,3}, {2,3}, {1,4}, {2,4}, {3,4},
    // {3,5}, {4,5} — 8 pairs → 16 directed rules
    assert(all.length === 16)
    val top = Associations.associationRules(
        rows.toDF("order_id", "part_id"), "order_id", "part_id",
        minSupport = 1L, topK = 2)
      .as[(Long, Long, Long, Double, Double, Double)].collect()
      .map(r => (r._1, r._2)).toSeq
    // (pair_count desc, antecedent, consequent): the count-3 pair first
    assert(top === Seq((1L, 2L), (2L, 1L)))
    intercept[IllegalArgumentException] {
      Associations.associationRules(rows.toDF("order_id", "part_id"),
        "order_id", "part_id", minSupport = 0L)
    }
  }

  test("associationRules: mega-baskets are excluded before any counting") {
    // capping at 2 items drops b1 (3 items) and b3 (3 items) — the
    // {1,2} pair then co-occurs only in b2, below minSupport=2, and
    // n/c(x) shrink consistently with the exclusion
    val capped = Associations.associationRules(
        rows.toDF("order_id", "part_id"), "order_id", "part_id",
        minSupport = 2L, maxBasketItems = 2L)
      .as[(Long, Long, Long, Double, Double, Double)].collect()
    assert(capped.isEmpty)
    // with minSupport=1 the surviving baskets (b2 {1,2}, b4 {3,4,5}→
    // dropped, 3 items) leave exactly the b2 pair, support over n=1
    val loose = Associations.associationRules(
        rows.toDF("order_id", "part_id"), "order_id", "part_id",
        minSupport = 1L, maxBasketItems = 2L)
      .as[(Long, Long, Long, Double, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(loose.keySet === Set((1L, 2L), (2L, 1L)))
    assert(loose((1L, 2L))._4 === 1.0) // support = 1/1 surviving basket
    // cap 0 disables the guard (same totals as the uncapped run)
    val off = Associations.associationRules(
      rows.toDF("order_id", "part_id"), "order_id", "part_id",
      minSupport = 2L, maxBasketItems = 0L)
    assert(off.count() === 2L)
  }
}
