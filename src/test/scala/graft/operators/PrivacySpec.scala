package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Privacy audits: hand-counted k-anonymity classes (NULL quasi values
  * form their own class), the one-row gate summary, and l-diversity's
  * distinct + entropy forms against hand-computed values. */
class PrivacySpec extends SparkSpec {

  import spark.implicits._

  // (zip, sex, diagnosis): class (z1,m) has 3 rows / 2 secrets,
  // (z1,f) 1 row / 1 secret, (z2,m) 2 rows / 1 secret (homogeneous),
  // (NULL,m) 1 row — its own class
  private def tbl = Seq(
    (Option("z1"), "m", "flu"), (Option("z1"), "m", "flu"),
    (Option("z1"), "m", "cold"), (Option("z1"), "f", "flu"),
    (Option("z2"), "m", "cold"), (Option("z2"), "m", "cold"),
    (Option.empty[String], "m", "flu"))
    .toDF("zip", "sex", "dx")

  test("kAnonymityClasses: sizes, violations, NULL-quasi class") {
    val got = Privacy.kAnonymityClasses(tbl, Seq("zip", "sex"), 2L)
      .as[(Option[String], String, Long, Boolean)].collect().toSet
    assert(got === Set(
      (Some("z1"), "m", 3L, false), (Some("z1"), "f", 1L, true),
      (Some("z2"), "m", 2L, false), (None, "m", 1L, true)))
  }

  test("kAnonymityReport: one-row gate summary") {
    val r = Privacy.kAnonymityReport(tbl, Seq("zip", "sex"), 2L)
      .as[(Long, Long, Long, Long, Long, Double)].collect().head
    assert(r === ((7L, 4L, 1L, 2L, 2L,
      BigDecimal(2.0 / 7.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    // k = 1 is vacuous: nothing violates
    val r1 = Privacy.kAnonymityReport(tbl, Seq("zip", "sex"), 1L)
      .as[(Long, Long, Long, Long, Long, Double)].collect().head
    assert(r1._4 === 0L && r1._5 === 0L && r1._6 === 0.0)
  }

  test("lDiversityClasses: distinct + entropy; NULL sensitive dropped") {
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Privacy.lDiversityClasses(tbl, Seq("zip", "sex"), "dx", 2L)
      .as[(Option[String], String, Long, Long, Double, Boolean)]
      .collect().toSet
    // (z1,m): counts {flu:2, cold:1}, H = ln3 − (2ln2 + 0)/3
    val h3 = r4(math.log(3.0) - 2.0 * math.log(2.0) / 3.0)
    assert(got === Set(
      (Some("z1"), "m", 3L, 2L, h3, false),
      (Some("z1"), "f", 1L, 1L, 0.0, true),
      (Some("z2"), "m", 2L, 1L, 0.0, true), // homogeneous: H = 0
      (None, "m", 1L, 1L, 0.0, true)))
    // NULL sensitive values are excluded from the sensitive stats but
    // NEVER drop rows from class_size, and an all-NULL class surfaces
    // with distinct_sensitive = 0 / NULL entropy / violates = true —
    // a release gate iterating `violates` must see every class
    val withNull = tbl.withColumn("dx",
      when(col("dx") === "cold", col("dx"))) // flu -> NULL
    val g2 = Privacy.lDiversityClasses(withNull, Seq("zip", "sex"),
      "dx", 2L)
      .as[(Option[String], String, Long, Long, Option[Double], Boolean)]
      .collect().toSet
    assert(g2 === Set(
      (Some("z1"), "m", 3L, 1L, Some(0.0), true), // 2 NULL + 1 cold
      (Some("z1"), "f", 1L, 0L, None, true),      // all-NULL class
      (Some("z2"), "m", 2L, 1L, Some(0.0), true),
      (None, "m", 1L, 0L, None, true)))           // all-NULL class
  }

  test("tClosenessClasses: hand ordered-EMD per class; all-NULL class " +
      "flagged with NULL t; m = 1 degenerates to 0") {
    // global bands: 0×3, 1×2, 2×1 (Q = 1/2, 1/3, 1/6; m = 3)
    val rows = Seq(
      ("z1", Option(0)), ("z1", Option(0)), ("z1", Option(0)),
      ("z2", Option(1)), ("z2", Option(1)),
      ("z3", Option(2)),
      ("z4", Option.empty[Int]))
      .toDF("zip", "band")
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // replicate the double chains: per class P over (0,1,2)
    def emd(p: Seq[Double]): Double = {
      val q = Seq(3.0 / 6.0, 2.0 / 6.0, 1.0 / 6.0)
      var cum = 0.0; var acc = 0.0
      p.indices.foreach { i => cum += p(i) - q(i); acc += math.abs(cum) }
      acc / 2.0 // m − 1
    }
    val got = Privacy.tClosenessClasses(rows, Seq("zip"), "band", 0.5)
      .as[(String, Long, Option[Double], Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("z1") === (("z1", 3L,
      Some(r6(emd(Seq(1.0, 0.0, 0.0)))), false)))
    assert(got("z2") === (("z2", 2L,
      Some(r6(emd(Seq(0.0, 1.0, 0.0)))), false)))
    // the skewed-to-rare-band class reads the largest distance
    assert(got("z3") === (("z3", 1L,
      Some(r6(emd(Seq(0.0, 0.0, 1.0)))), true)))
    assert(got("z3")._3.get > got("z1")._3.get)
    // all-NULL sensitive: class visible, NULL t, flagged
    assert(got("z4") === (("z4", 1L, None, true)))
    // one global level: every class trivially matches (t = 0)
    val one = Seq(("a", 1), ("b", 1)).toDF("zip", "band")
    val g1 = Privacy.tClosenessClasses(one, Seq("zip"), "band", 0.2)
      .as[(String, Long, Option[Double], Boolean)].collect()
    assert(g1.forall(r => r._3 === Some(0.0) && !r._4))
    intercept[IllegalArgumentException] {
      Privacy.tClosenessClasses(rows, Seq("zip"), "band", 1.5)
    }
  }

  test("tClosenessClasses: maxGridCells fail-loud gate; entirely-NULL " +
      "sensitive column surfaces every class (fails closed)") {
    // 4 classes x 3 levels = 12 grid cells: a gate below that refuses
    val rows = Seq(
      ("z1", Option(0)), ("z1", Option(0)), ("z1", Option(0)),
      ("z2", Option(1)), ("z2", Option(1)),
      ("z3", Option(2)),
      ("z4", Option.empty[Int]))
      .toDF("zip", "band")
    val e = intercept[IllegalArgumentException] {
      Privacy.tClosenessClasses(rows, Seq("zip"), "band", 0.5,
        maxGridCells = 11L)
    }
    assert(e.getMessage.contains("maxGridCells") &&
      e.getMessage.contains("quantize"))
    // exactly at the bound: plans fine
    assert(Privacy.tClosenessClasses(rows, Seq("zip"), "band", 0.5,
      maxGridCells = 12L).count() === 4L)
    // an entirely-NULL sensitive column has ZERO levels — the grid
    // would be empty and every class silently dropped; the contract
    // instead emits one row per class, NULL t, violates = true, so a
    // release gate on `violates` REFUSES (fails closed)
    val allNull = rows.withColumn("band", lit(null).cast("int"))
    val got = Privacy.tClosenessClasses(allNull, Seq("zip"), "band", 0.5)
      .as[(String, Long, Option[Double], Boolean)].collect().toSet
    assert(got === Set(("z1", 3L, None, true), ("z2", 2L, None, true),
      ("z3", 1L, None, true), ("z4", 1L, None, true)))
  }

  test("fairnessReport: hand rates per group, dp_ratio vs the " +
      "most-selected group, NULL tpr/fpr on empty cells") {
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // group g1: 4 rows, 2 pos, selected {pos, pos, neg} = 3 -> tp 2 fp 1
    // group g2: 2 rows, 1 pos, selected 1 (the neg) -> tp 0 fp 1
    // group g3: 1 row, 1 pos, never selected -> fpr NULL (no negatives)
    val rows = Seq(
      ("g1", true, true), ("g1", true, true), ("g1", false, true),
      ("g1", false, false),
      ("g2", true, false), ("g2", false, true),
      ("g3", true, false))
      .toDF("grp", "y", "yh")
    val got = Privacy.fairnessReport(rows, "grp", "y", "yh")
      .as[(String, Long, Double, Double, Option[Double], Option[Double],
        Option[Double])].collect().sortBy(_._1)
    // pred rates: g1 3/4, g2 1/2, g3 0 -> max = 0.75
    assert(got(0) === (("g1", 4L, 0.5, 0.75, Some(1.0), Some(0.5),
      Some(1.0))))
    assert(got(1) === (("g2", 2L, 0.5, 0.5, Some(0.0), Some(1.0),
      Some(r6(0.5 / 0.75)))))
    assert(got(2) === (("g3", 1L, 1.0, 0.0, Some(0.0), None, Some(0.0))))
    // all-zero selection: dp_ratio NULL everywhere (no favored group)
    val none = Privacy.fairnessReport(
      rows.withColumn("yh", lit(false)), "grp", "y", "yh")
      .as[(String, Long, Double, Double, Option[Double], Option[Double],
        Option[Double])].collect()
    assert(none.forall(_._7.isEmpty))
    intercept[IllegalArgumentException] {
      Privacy.fairnessReport(rows, "nope", "y", "yh")
    }
    // a group column named like a fixed report column would collide on
    // the rename-back — rejected loudly
    intercept[IllegalArgumentException] {
      Privacy.fairnessReport(rows.withColumnRenamed("grp", "tpr"),
        "tpr", "y", "yh")
    }
    // a high-cardinality protected attribute (a user id, say) makes
    // the max-window and the report collect row-sized — the maxGroups
    // gate fails loud BEFORE either is planned
    val wide = (1L to 50L).map(i => (s"u$i", i % 2 == 0, i % 3 == 0))
      .toDF("grp", "y", "yh")
    val e = intercept[IllegalArgumentException] {
      Privacy.fairnessReport(wide, "grp", "y", "yh", maxGroups = 10L)
    }
    assert(e.getMessage.contains("maxGroups"))
    // at the default gate the same frame passes (50 groups << 10000)
    assert(Privacy.fairnessReport(wide, "grp", "y", "yh").count() === 50L)
  }

  test("tClosenessClasses + fairnessReport: randomized parity vs " +
      "brute references") {
    val rnd = new scala.util.Random(13579)
    for (trial <- 1 to 3) {
      val n = 40 + rnd.nextInt(120)
      val rows = (1 to n).map(_ =>
        (s"z${rnd.nextInt(5)}", rnd.nextInt(4)))
      // brute EMD per class over the global level set
      val levels = rows.map(_._2).distinct.sorted
      val m = levels.size
      val gTot = rows.size.toDouble
      val q = levels.map(v =>
        rows.count(_._2 == v).toDouble / gTot)
      val byClass = rows.groupBy(_._1)
      val got = Privacy.tClosenessClasses(
        rows.toDF("zip", "band"), Seq("zip"), "band", 0.3)
        .as[(String, Long, Option[Double], Boolean)].collect()
        .map(r => r._1 -> r).toMap
      byClass.foreach { case (z, xs) =>
        val nc = xs.size.toDouble
        val p = levels.map(v => xs.count(_._2 == v).toDouble / nc)
        var cum = 0.0; var acc = 0.0
        levels.indices.foreach { i =>
          cum += p(i) - q(i); acc += math.abs(cum)
        }
        val tRef = if (m > 1) acc / (m - 1) else 0.0
        val r = got(z)
        assert(r._2 === xs.size.toLong, s"trial $trial $z size")
        assert(math.abs(r._3.get - tRef) < 2e-6,
          s"trial $trial $z t ${r._3} vs $tRef")
        assert(r._4 === (tRef > 0.3) ||
          math.abs(tRef - 0.3) < 1e-9, s"trial $trial $z violates")
      }
      // fairness: direct counting per group
      val fr = (1 to n).map(_ =>
        (s"g${rnd.nextInt(4)}", rnd.nextBoolean(), rnd.nextBoolean()))
      val gotF = Privacy.fairnessReport(
        fr.toDF("grp", "y", "yh"), "grp", "y", "yh")
        .as[(String, Long, Double, Double, Option[Double],
          Option[Double], Option[Double])].collect()
        .map(r => r._1 -> r).toMap
      val byG = fr.groupBy(_._1)
      val maxPr = byG.values.map(xs =>
        xs.count(_._3).toDouble / xs.size).max
      def r6(x: Double) = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      byG.foreach { case (g, xs) =>
        val r = gotF(g)
        val nPos = xs.count(_._2); val nNeg = xs.size - nPos
        assert(r._2 === xs.size.toLong, s"trial $trial $g n")
        assert(r._3 === r6(nPos.toDouble / xs.size), s"trial $trial $g")
        assert(r._4 === r6(xs.count(_._3).toDouble / xs.size))
        if (nPos > 0)
          assert(r._5 === Some(r6(
            xs.count(x => x._2 && x._3).toDouble / nPos)))
        else assert(r._5 === None)
        if (nNeg > 0)
          assert(r._6 === Some(r6(
            xs.count(x => !x._2 && x._3).toDouble / nNeg)))
        else assert(r._6 === None)
        if (maxPr > 0)
          assert(math.abs(r._7.get -
            (xs.count(_._3).toDouble / xs.size) / maxPr) < 2e-6,
            s"trial $trial $g dp")
      }
    }
  }

  test("guards: unknown columns and degenerate k/l fail loud") {
    intercept[IllegalArgumentException] {
      Privacy.kAnonymityClasses(tbl, Seq("nope"), 2L)
    }
    intercept[IllegalArgumentException] {
      Privacy.kAnonymityClasses(tbl, Seq.empty, 2L)
    }
    intercept[IllegalArgumentException] {
      Privacy.lDiversityClasses(tbl, Seq("zip"), "dx", 0L)
    }
  }
}
