package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplesSpec extends SparkSpec {
  import spark.implicits._

  private def ids(n: Int) = (0 until n).map(_.toLong).toDF("id")

  test("bernoulli is deterministic and partition-layout independent") {
    val a = Samples.bernoulli(ids(5000), "id", 0.3).as[Long].collect().sorted
    val b = Samples.bernoulli(ids(5000).repartition(7), "id", 0.3)
      .as[Long].collect().sorted
    assert(a.toSeq === b.toSeq)
  }

  test("bernoulli fraction is approximately honored") {
    val n = Samples.bernoulli(ids(20000), "id", 0.25).count()
    assert(math.abs(n / 20000.0 - 0.25) < 0.02)
  }

  test("bernoulli edge fractions: 0 keeps nothing, 1 keeps everything") {
    assert(Samples.bernoulli(ids(100), "id", 0.0).count() === 0L)
    assert(Samples.bernoulli(ids(100), "id", 1.0).count() === 100L)
  }

  test("different seeds select different (but same-sized-ish) subsets") {
    val a = Samples.bernoulli(ids(5000), "id", 0.5, seed = 1).as[Long].collect().toSet
    val b = Samples.bernoulli(ids(5000), "id", 0.5, seed = 2).as[Long].collect().toSet
    assert(a !== b)
    // independent halves overlap on ~a quarter
    assert(math.abs(a.intersect(b).size / 5000.0 - 0.25) < 0.05)
  }

  test("matches a reference MD5 selection computed in plain JVM code") {
    val got = Samples.bernoulli(ids(500), "id", 0.25, seed = 7)
      .as[Long].collect().toSet
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = (0L until 500L).filter { i =>
      md.reset()
      val hex = md.digest(s"7:$i".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 8)
      hex < "40000000"
    }.toSet
    assert(got === expected)
    assert(expected.nonEmpty)
  }

  test("stratified applies per-stratum fractions with default for the rest") {
    val df = (0 until 9000).map(i => (i.toLong, s"s${i % 3}")).toDF("id", "lang")
    val kept = Samples.stratified(df, "id", "lang",
      Map("s0" -> 1.0, "s1" -> 0.2), defaultFraction = 0.0)
    val byStratum = kept.groupBy("lang").count().as[(String, Long)]
      .collect().toMap
    assert(byStratum("s0") === 3000L)
    assert(math.abs(byStratum("s1") / 3000.0 - 0.2) < 0.05)
    assert(!byStratum.contains("s2"))
  }
}
