package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Expectation battery: each rule class hand-counted on a fixture with
  * deliberate violations of every kind, NULL semantics pinned per
  * class, rule order preserved, duplicate-name guard. */
class QualitySpec extends SparkSpec {

  import spark.implicits._
  import Quality._

  // id 4 duplicates id 3's key; id 5 has a null key and a bad code;
  // v=-1 breaks the range; code 'zz' breaks regex + set; fk misses 99
  private def tbl = Seq(
    (Option(1L), 10.0, "aa", 1L),
    (Option(2L), 20.0, "ab", 2L),
    (Option(3L), -1.0, "ba", 99L),
    (Option(3L), 30.0, "bb", 1L),
    (Option.empty[Long], 40.0, "zz", 2L))
    .toDF("k", "v", "code", "fk")

  private def parent = Seq(1L, 2L).toDF("pk")

  test("checkExpectations: every rule class hand-counted") {
    val got = Quality.checkExpectations(tbl, Seq(
      NotNull("k"),
      InRange("v", 0.0, 35.0),
      MatchesRegex("code", "[ab]+"),
      InSet("code", Seq("aa", "ab", "ba", "bb")),
      Custom("v_under_25", col("v") < 25.0),
      Unique(Seq("k")),
      ForeignKey("fk", parent, "pk")))
      .as[(Int, String, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(got.map(_._2).toSeq === Seq("not_null(k)",
      "in_range(v,0.0,35.0)", "matches_regex(code)", "in_set(code)",
      "v_under_25", "unique(k)", "foreign_key(fk)"))
    assert(got.forall(_._3 == 5L))
    // null k -> 1; v=-1 and v=40 -> 2; 'zz' -> 1 regex + 1 set;
    // v<25 fails rows 30.0 and 40.0 -> 2; dup key 3 -> 1; fk 99 -> 1
    assert(got.map(_._4).toSeq === Seq(1L, 2L, 1L, 1L, 2L, 1L, 1L))
    assert(got.map(_._5).toSeq === Seq.fill(7)(false))
    // a clean battery passes
    val clean = Quality.checkExpectations(tbl, Seq(
      InRange("v", -5.0, 50.0), Unique(Seq("k", "v"))))
      .as[(Int, String, Long, Long, Boolean)].collect()
    assert(clean.forall(r => r._4 == 0L && r._5))
  }

  test("NULL semantics per class: range/regex/set pass NULLs, " +
      "Custom fails them, Unique groups them") {
    val withNullCode = tbl.withColumn("code",
      when(col("code") =!= "zz", col("code"))) // zz -> NULL
    val got = Quality.checkExpectations(withNullCode, Seq(
      MatchesRegex("code", "[ab]+"), InSet("code", Seq("aa")),
      Custom("code_set", col("code").isin("aa", "ab", "ba", "bb"))))
      .as[(Int, String, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(got(0)._4 === 0L) // NULL passes regex rule
    assert(got(1)._4 === 3L) // ab/ba/bb violate in_set('aa'); NULL passes
    assert(got(2)._4 === 1L) // Custom: NULL predicate = violation
    // two NULL keys are a duplicate pair under Unique
    val twoNulls = tbl.union(Seq((Option.empty[Long], 1.0, "aa", 1L))
      .toDF("k", "v", "code", "fk"))
    val u = Quality.checkExpectations(twoNulls, Seq(Unique(Seq("k"))))
      .as[(Int, String, Long, Long, Boolean)].collect().head
    assert(u._4 === 2L) // dup of key 3 + dup of the NULL group
  }

  test("guards: empty battery and duplicate names fail loud") {
    intercept[IllegalArgumentException] {
      Quality.checkExpectations(tbl, Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Quality.checkExpectations(tbl,
        Seq(NotNull("k"), NotNull("k")))
    }
  }
}
