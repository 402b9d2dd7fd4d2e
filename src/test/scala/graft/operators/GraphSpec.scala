package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PageRank: pinned against an in-memory replication of the same damped
  * power iteration (identical formulation — dangling nodes leak their
  * damped mass, as documented in Graph.scala and mirrored by the SQL
  * oracle), plus structural properties. */
class GraphSpec extends SparkSpec {

  import spark.implicits._

  /** Reference power iteration, same `r' = (1-d)/N + d·Σ_in r/deg` form. */
  private def refPageRank(edges: Seq[(Long, Long)], iters: Int,
                          d: Double): Map[Long, Double] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val n = nodes.size
    val outDeg = e.groupBy(_._1).map { case (s, es) => s -> es.size }
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val contrib = e.groupBy(_._2).map { case (dst, in) =>
        dst -> in.map { case (s, _) => r(s) / outDeg(s) }.sum
      }
      r = nodes.map(nd => nd -> ((1 - d) / n + d * contrib.getOrElse(nd, 0.0))).toMap
    }
    r
  }

  // 1 and 3 form a cycle; 4 is dangling (in-edges only); 2 feeds 3
  private val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (3L, 4L))

  test("pageRank matches the in-memory power iteration") {
    val got = Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", iters = 10)
      .as[(Long, Double)].collect().toMap
    val expect = refPageRank(edges, iters = 10, d = 0.85)
    assert(got.keySet === expect.keySet)
    got.foreach { case (node, pr) =>
      assert(math.abs(pr - expect(node)) < 1e-12, s"node $node: $pr vs ${expect(node)}")
    }
    // the cycle hub (3, fed by 1 and 2) must outrank the leaf (2)
    assert(got(3L) > got(2L))
  }

  test("duplicate edges collapse; ranks sum to <= 1 (dangling leak)") {
    val dup = edges ++ edges // pageRank dedups edges internally
    val got = Graph.pageRank(dup.toDF("src", "dst"), "src", "dst", iters = 10)
      .as[(Long, Double)].collect().toMap
    val expect = refPageRank(edges, iters = 10, d = 0.85)
    got.foreach { case (node, pr) =>
      assert(math.abs(pr - expect(node)) < 1e-12)
    }
    // dangling node 4 absorbs then leaks its damped mass each round, so
    // total rank decays well below 1 by iteration 10 — assert the decayed
    // total agrees with the reference, and never exceeds 1
    val total = got.values.sum
    assert(total <= 1.0 + 1e-9, s"rank mass $total exceeds 1")
    assert(math.abs(total - expect.values.sum) < 1e-9)
  }

  test("pageRank validates its inputs") {
    intercept[IllegalArgumentException] {
      Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", iters = 0)
    }
    intercept[IllegalArgumentException] {
      Graph.pageRank(Seq.empty[(Long, Long)].toDF("src", "dst"), "src", "dst")
    }
  }
}
