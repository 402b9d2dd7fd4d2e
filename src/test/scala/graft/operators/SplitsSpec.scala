package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SplitsSpec extends SparkSpec {
  import spark.implicits._

  private val weights = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  test("assignment is disjoint, exhaustive, and ratio-faithful") {
    val df = spark.range(10000).toDF("id")
    val assigned = Splits.assign(df, "id", weights)
    val counts = assigned.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet === Set("train", "val", "test"))
    assert(counts.values.sum === 10000L) // exhaustive + disjoint
    assert(math.abs(counts("train") - 8000L) < 400, s"train=${counts("train")}")
    assert(math.abs(counts("val") - 1000L) < 200)
    assert(math.abs(counts("test") - 1000L) < 200)
  }

  test("assignment is a pure function of (id, salt): stable across runs and partitioning") {
    val df = spark.range(2000).toDF("id")
    val a = Splits.assign(df, "id", weights).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Splits.assign(df.repartition(13), "id", weights).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a === b)
    // a different salt reshuffles
    val c = Splits.assign(df, "id", weights, salt = 7L).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a !== c)
  }

  test("growing the corpus never moves an existing id between splits") {
    val small = Splits.assign(spark.range(1000).toDF("id"), "id", weights)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val big = Splits.assign(spark.range(5000).toDF("id"), "id", weights)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    small.foreach { case (id, s) => assert(big(id) === s) }
  }

  test("only() selects exactly one split") {
    val df = spark.range(3000).toDF("id")
    val train = Splits.only(df, "id", weights, "train").count()
    val other = Splits.assign(df, "id", weights)
      .filter(col("split") =!= "train").count()
    assert(train + other === 3000L)
  }

  test("assignLeakageSafe: near-dup groups share a split; singletons match assign()") {
    import org.apache.spark.sql.functions.{concat_ws, expr}
    // distinct md5-derived docs (no accidental shingle overlap) + exact
    // copies of every 5th doc under offset ids
    val docs = spark.range(200).toDF("doc_id")
      .withColumn("text", concat_ws(" ",
        expr("transform(sequence(1, 30), i -> substr(md5(concat(cast(doc_id as string), ':', cast(i as string))), 1, 8))")))
    val plants = docs.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 1000L).as("doc_id"), col("text"))
    val assigned = Splits.assignLeakageSafe(docs.unionAll(plants),
      "doc_id", "text", weights)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    // every dup pair co-assigned
    (0L until 200L by 5).foreach { id =>
      assert(assigned(id) === assigned(id + 1000L), s"pair $id split apart") }
    // docs outside any dup group get exactly the plain assign() split
    val plain = Splits.assign(docs, "doc_id", weights)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    (0L until 200L).filter(_ % 5 != 0).foreach { id =>
      assert(assigned(id) === plain(id)) }
  }

  test("kFold: every row assigned, folds stable, k respected") {
    import spark.implicits._
    val df = (1L to 1000L).toDF("id")
    val folded = Splits.kFold(df, "id", k = 5)
    val counts = folded.groupBy("fold").count()
      .as[(Long, Long)].collect().toMap
    assert(counts.keySet === Set(0L, 1L, 2L, 3L, 4L))
    assert(counts.values.sum === 1000L)
    // roughly balanced (md5-uniform): no fold below 100 of 200 expected
    assert(counts.values.forall(_ > 100L))
    // stability: ids keep their fold when the corpus doubles
    val wider = Splits.kFold((1L to 2000L).toDF("id"), "id", k = 5)
      .filter($"id" <= 1000L).as[(Long, Long)].collect().toMap
    val orig = folded.as[(Long, Long)].collect().toMap
    assert(wider === orig)
    intercept[IllegalArgumentException] { Splits.kFold(df, "id", k = 1) }
  }
}
