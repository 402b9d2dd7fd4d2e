package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  private def frame = Seq(
    (1L, Some("en"), Some(10L)),
    (2L, Some("de"), Some(20L)),
    (3L, None, Some(20L)),
    (4L, Some("en"), None)
  ).toDF("id", "lang", "n")

  test("profile: per-column nulls, distincts, min/max as strings") {
    val out = Profiling.profile(frame)
      .as[(String, Long, Long, Long, Option[String], Option[String])]
      .collect().map(r => r._1 -> r).toMap
    assert(out("id") === (("id", 4L, 0L, 4L, Some("1"), Some("4"))))
    assert(out("lang") === (("lang", 4L, 1L, 2L, Some("de"), Some("en"))))
    assert(out("n") === (("n", 4L, 1L, 2L, Some("10"), Some("20"))))
  }

  test("profile: column subset, approx mode, bad column fails") {
    val sub = Profiling.profile(frame, Seq("lang"))
    assert(sub.count() === 1L)
    // approx distinct is exact at tiny cardinalities
    val approx = Profiling.profile(frame, approxDistinct = true)
      .select("col_name", "n_distinct").as[(String, Long)].collect().toMap
    assert(approx("id") === 4L && approx("lang") === 2L)
    intercept[IllegalArgumentException] {
      Profiling.profile(frame, Seq("nope"))
    }
    intercept[IllegalArgumentException] {
      Profiling.profile(frame.limit(0).drop("id", "lang", "n"))
    }
  }
}
