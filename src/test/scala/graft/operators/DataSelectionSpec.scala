package graft.operators

import graft.SparkSpec

class DataSelectionSpec extends SparkSpec {
  import spark.implicits._

  // Two separated "domains": target-like docs repeat the aa-bb bigram
  // chain, junk docs the zz-qq chain. The raw pool is half each.
  private def pool = (
    Seq.tabulate(30)(i => (i.toLong, "aa bb aa bb aa bb")) ++
    Seq.tabulate(30)(i => (100L + i, "zz qq zz qq zz qq")))
    .toDF("doc_id", "text")
  private def target =
    Seq.tabulate(20)(i => (1000L + i, "aa bb aa bb")).toDF("doc_id", "text")

  test("importanceWeights: target-like llr positive, junk negative, empty NULL") {
    val tm = LangModel.trainBigramLM(target, "text")
    val rm = LangModel.trainBigramLM(pool, "text")
    val w = DataSelection.importanceWeights(
      pool.union(Seq((999L, "")).toDF("doc_id", "text")),
      tm, rm, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(w(0L).getAs[Double]("llr") > 0.0, "target-like doc must score positive llr")
    assert(w(100L).getAs[Double]("llr") < -0.5, "junk doc must score negative llr")
    assert(w(0L).getAs[Double]("llr") - w(100L).getAs[Double]("llr") > 0.8,
      "llr must separate the domains by ~1 nat/token")
    assert(w(999L).isNullAt(w(999L).fieldIndex("llr")), "empty doc llr is NULL")
  }

  test("selectByImportance is the exact Gumbel top-k of the llr weights") {
    val k = 20
    val sel = DataSelection.selectByImportance(
      pool, target, "doc_id", "text", k = k, seed = 11)
    val ids = sel.select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids.length === k)

    // independent replication: llr from importanceWeights + the md5
    // uniform + Gumbel key computed HERE, not through the operator
    val tm = LangModel.trainBigramLM(target, "text")
    val rm = LangModel.trainBigramLM(pool, "text")
    val llr = DataSelection.importanceWeights(pool, tm, rm, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("llr")).toMap
    def gumbelKey(id: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"11:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      val u = (java.lang.Long.parseLong(hex, 16) + 1.0) / 4294967297.0
      llr(id) - math.log(-math.log(u))
    }
    val expected = llr.keys.toSeq
      .sortBy(id => (-gumbelKey(id), id)).take(k).sorted
    assert(ids === expected, "selection must equal the hand-computed top-k")
    // sampling ∝ exp(llr): the target-like side must dominate the cut
    assert(ids.count(_ < 100L) > k / 2, s"got $ids")

    // deterministic: same seed, same cut
    val again = DataSelection.selectByImportance(
      pool, target, "doc_id", "text", k = k, seed = 11)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(again === ids)
  }

  test("madOutliers: hand-computed medians, MAD, flags; heavy tail caught") {
    import org.apache.spark.sql.functions.col
    // stratum A: [1,2,3,4,100] → med 3, |dev| [2,1,0,1,97] → mad 1
    val rows = Seq(
      (1L, "A", Some(1L)), (2L, "A", Some(2L)), (3L, "A", Some(3L)),
      (4L, "A", Some(4L)), (5L, "A", Some(100L)),
      (6L, "A", None) // null value: passes through unflagged
    ).toDF("id", "src", "v")
    val out = DataSelection.madOutliers(rows, "v", "src", threshold = 3.5)
      .select("id", "robust_z", "is_outlier")
      .as[(Long, Option[Double], Option[Boolean])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) === ((Some(-2.0), Some(false))))
    assert(out(3L) === ((Some(0.0), Some(false))))
    assert(out(5L) === ((Some(97.0), Some(true)))) // the heavy tail
    assert(out(6L) === ((None, None)))
  }

  test("madOutliers: mad=0 stratum flags any value off the median; " +
      "null stratum passes through") {
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      (1L, Some("B"), Some(5L)), (2L, Some("B"), Some(5L)),
      (3L, Some("B"), Some(5L)), (4L, Some("B"), Some(7L)),
      (5L, None, Some(9L))
    ).toDF("id", "src", "v")
    val out = DataSelection.madOutliers(rows, "v", "src", threshold = 2.0)
      .select("id", "robust_z", "is_outlier")
      .as[(Long, Option[Double], Option[Boolean])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // med 5, mad 0 → z NULL; only the 7 deviates
    assert(out(1L) === ((None, Some(false))))
    assert(out(4L) === ((None, Some(true))))
    assert(out(5L) === ((None, None))) // null stratum: no evidence
    intercept[IllegalArgumentException] {
      DataSelection.madOutliers(rows, "v", "src", threshold = 0.0)
    }
  }

  test("winsorize clamps into per-stratum exact quantile bands") {
    // stratum a: values 1..5 — p25 = 2.0, p75 = 4.0 (exact interpolated);
    // stratum b: constant 10s — band [10, 10], everything stays 10
    val rows = Seq(
      (1L, Some("a"), Some(1.0)), (2L, Some("a"), Some(2.0)),
      (3L, Some("a"), Some(3.0)), (4L, Some("a"), Some(4.0)),
      (5L, Some("a"), Some(5.0)),
      (6L, Some("b"), Some(10.0)), (7L, Some("b"), Some(10.0)),
      (8L, Some("a"), None), // null value: passes through null
      (9L, None, Some(99.0)) // null stratum: no band, null out
    ).toDF("id", "src", "v")
    val out = DataSelection.winsorize(rows, "v", "src",
        pLow = 0.25, pHigh = 0.75)
      .select("id", "v_w").as[(Long, Option[Double])].collect().toMap
    assert(out(1L) === Some(2.0) && out(5L) === Some(4.0)) // clamped
    assert(out(2L) === Some(2.0) && out(3L) === Some(3.0) &&
      out(4L) === Some(4.0)) // in band
    assert(out(6L) === Some(10.0) && out(7L) === Some(10.0))
    assert(out(8L) === None && out(9L) === None)
    intercept[IllegalArgumentException] {
      DataSelection.winsorize(rows, "v", "src", pLow = 0.9, pHigh = 0.1)
    }
  }

  test("importanceESS: uniform weights read ESS = n; one dominant " +
      "weight collapses toward 1; NULL llr excluded; empty NULL") {
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // equal llr -> w all equal -> ESS = n exactly
    val flat = Seq.tabulate(8)(i => (i.toLong, Option(2.5)))
      .toDF("doc_id", "llr")
    val gf = DataSelection.importanceESS(flat)
      .as[(Long, Option[Double], Option[Double])].collect().head
    assert(gf === ((8L, Some(8.0), Some(1.0))))
    // one dominant llr: hand Kish from the shifted weights
    val dom = Seq((1L, Option(10.0)), (2L, Option(0.0)), (3L, Option(0.0)))
      .toDF("doc_id", "llr")
    val w = Seq(1.0, math.exp(-10.0), math.exp(-10.0))
    val ess = math.pow(w.sum, 2) / w.map(x => x * x).sum
    val gd = DataSelection.importanceESS(dom)
      .as[(Long, Option[Double], Option[Double])].collect().head
    assert(gd._1 === 3L && gd._2 === Some(r4(ess)))
    assert(gd._2.get < 1.001) // collapsed: effectively one document
    // NULL llr rows (empty docs) are excluded from n and the moments
    val withNull = flat.unionByName(
      Seq((99L, Option.empty[Double])).toDF("doc_id", "llr"))
    assert(DataSelection.importanceESS(withNull)
      .as[(Long, Option[Double], Option[Double])].collect().head ===
      ((8L, Some(8.0), Some(1.0))))
    // empty frame: n = 0, NULL ess (never NaN)
    val empty = Seq.empty[(Long, Option[Double])].toDF("doc_id", "llr")
    assert(DataSelection.importanceESS(empty)
      .as[(Long, Option[Double], Option[Double])].collect().head ===
      ((0L, None, None)))
  }
}
