package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin returns exactly the plain-join result") {
    // 90% of the fact rows share one hot key
    val fact = spark.range(2000)
      .select(when(col("id") % 10 =!= 0, lit(7)).otherwise(col("id") % 5)
        .as("k"), col("id").as("v"))
    val dim = Seq((0L, "a"), (1L, "b"), (2L, "c"), (3L, "d"), (4L, "e"),
      (7L, "hot")).toDF("k", "name")
    val expected = fact.join(dim, "k").agg(count(lit(1)), sum("v")).head()
    val got = SkewJoin.saltedJoin(fact, dim, "k", salt = 8)
      .agg(count(lit(1)), sum("v")).head()
    assert(got === expected)
  }

  test("adaptiveSaltedJoin == plain inner join, row for row") {
    // one hot key (90% of rows), a few light keys, plus null keys the
    // inner join must drop
    val fact = spark.range(2000)
      .select(when(col("id") % 10 =!= 0, lit(7)).otherwise(col("id") % 5)
        .as("k"), col("id").as("v"))
      .unionByName(Seq((Option.empty[Long], 99999L)).toDF("k", "v"))
    val dim = Seq((0L, "a"), (1L, "b"), (2L, "c"), (3L, "d"), (4L, "e"),
      (7L, "hot")).toDF("k", "name")
    val expected = fact.join(dim, "k")
      .as[(Long, Long, String)].collect().sorted.toSeq
    val got = SkewJoin.adaptiveSaltedJoin(fact, dim, "k",
        minHeavyCount = 100, salt = 8)
      .as[(Long, Long, String)].collect().sorted.toSeq
    assert(got === expected)
    // threshold above every count → pure light path, still exact
    val allLight = SkewJoin.adaptiveSaltedJoin(fact, dim, "k",
        minHeavyCount = 100000, salt = 8)
      .as[(Long, Long, String)].collect().sorted.toSeq
    assert(allLight === expected)
    // empty skewed side → plain-join fallback, no sketch NPE
    assert(SkewJoin.adaptiveSaltedJoin(fact.limit(0), dim, "k",
      minHeavyCount = 10).count() === 0L)
  }

  test("heavyHitters surfaces the hot key first") {
    val fact = spark.range(1000)
      .select(when(col("id") % 4 =!= 0, lit(42)).otherwise(col("id")).as("k"))
    val top = SkewJoin.heavyHitters(fact, col("k"), 3).collect()
    assert(top.head.getLong(0) === 42L)
    assert(top.head.getLong(1) === 750L)
  }
}
