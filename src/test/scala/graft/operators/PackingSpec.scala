package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("packSequences: contiguous offsets in hash order, straddling allowed") {
    val df = Seq((1L, 3L), (2L, 5L), (3L, 4L), (4L, 2L)).toDF("id", "cost")
    val out = Packing.packSequences(df, "id", "cost", seqLen = 6, seed = 7L)
      .select("id", "cost", "seq_id", "seq_pos")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap

    // reconstruct the expected order from the same hash
    val order = Seq((1L, 3L), (2L, 5L), (3L, 4L), (4L, 2L))
      .sortBy { case (id, _) =>
        (java.security.MessageDigest.getInstance("MD5")
          .digest(s"7:$id".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString, id)
      }
    var start = 0L
    order.foreach { case (id, cost) =>
      assert(out(id) === ((start / 6, start % 6)), s"id=$id start=$start")
      start += cost
    }
  }

  test("packSequences: assignment is invariant to chunkChars") {
    val df = spark.range(0, 1000)
      .select(col("id"), (col("id") % 37 + 1).as("cost"))
    val a = Packing.packSequences(df, "id", "cost", 128, chunkChars = 1)
      .select("id", "seq_id", "seq_pos")
    val b = Packing.packSequences(df, "id", "cost", 128, chunkChars = 4)
      .select("id", "seq_id", "seq_pos")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("packSequences matches a single global-order window reference") {
    val df = spark.range(0, 500)
      .select(col("id"), (col("id") % 11).as("cost")) // includes cost-0 rows
    val out = Packing.packSequences(df, "id", "cost", 64)
      .select("id", "seq_id", "seq_pos")
    val h = md5(concat(lit("42:"), col("id").cast("string")))
    val w = Window.orderBy(h.asc, col("id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val ref = df
      .withColumn("start", coalesce(sum(col("cost").cast("long")).over(w), lit(0L)))
      .select(col("id"), expr("start div 64L").as("seq_id"),
        (col("start") % 64).as("seq_pos"))
    assert(out.exceptAll(ref).isEmpty && ref.exceptAll(out).isEmpty)
  }

  test("batchByLength: fixed batches within length buckets, chunking-invariant") {
    val df = spark.range(0, 2000)
      .select(col("id"), (col("id") % 300 + 1).as("cost"))
    val out = Packing.batchByLength(df, "id", "cost",
      bucketWidth = 64, batchSize = 8, chunkChars = 1)

    // every batch holds rows of one length bucket; full batches have 8
    val sizes = out.groupBy("length_bucket", "batch_id").count()
    val byBucket = sizes.groupBy("length_bucket")
      .agg(max("count").as("mx"), count(lit(1)).as("nb"),
        sum(when(col("count") === 8, 1L).otherwise(0L)).as("full"))
      .collect()
    byBucket.foreach { r =>
      assert(r.getAs[Long]("mx") <= 8)
      // at most one partial batch per bucket (the tail)
      assert(r.getAs[Long]("nb") - r.getAs[Long]("full") <= 1)
    }
    // cost range inside a batch stays within the bucket width
    val spread = out.groupBy("length_bucket", "batch_id")
      .agg((max("cost") - min("cost")).as("d"))
      .agg(max("d")).head().getLong(0)
    assert(spread < 64)

    // assignment is invariant to the chunking knob
    val b = Packing.batchByLength(df, "id", "cost", 64, 8, chunkChars = 3)
      .select("id", "length_bucket", "batch_id", "batch_pos")
    val a = out.select("id", "length_bucket", "batch_id", "batch_pos")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("packSequencesBy: curriculum order, exact parity with a global window") {
    val df = spark.range(0, 800).select(col("id"),
      (col("id") % 13 + 1).as("cost"),
      (col("id") * 37 % 100).as("difficulty")) // many ties
    val out = Packing.packSequencesBy(df, "id", "cost", 64,
        priorityValue = col("difficulty"), chunks = 16)
      .select("id", "seq_id", "seq_pos")
    val w = Window.orderBy(col("difficulty").cast("double").asc, col("id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val ref = df
      .withColumn("start", coalesce(sum(col("cost").cast("long")).over(w), lit(0L)))
      .select(col("id"), expr("start div 64L").as("seq_id"),
        (col("start") % 64).as("seq_pos"))
    assert(out.exceptAll(ref).isEmpty && ref.exceptAll(out).isEmpty)
    // and the order really is curriculum: sequence index grows with difficulty
    val joined = Packing.packSequencesBy(df, "id", "cost", 64,
        col("difficulty"), chunks = 16)
    val corr = joined.agg(org.apache.spark.sql.functions.corr(
      col("difficulty").cast("double"), col("seq_id").cast("double"))).head().getDouble(0)
    assert(corr > 0.95)
  }

  test("edge cases: empty input and single-bucket batching don't crash") {
    val empty = spark.range(0).select(col("id"), lit(1L).as("cost"))
    assert(Packing.packSequences(empty, "id", "cost", 10).count() === 0L)
    assert(Packing.batchByLength(empty, "id", "cost", 10, 4).count() === 0L)
    // one giant length bucket still batches correctly via the chunked path
    val one = spark.range(0, 100).select(col("id"), lit(5L).as("cost"))
    val out = Packing.batchByLength(one, "id", "cost",
      bucketWidth = 1000000L, batchSize = 1)
    assert(out.select("batch_id").distinct().count() === 100L)
  }

  test("batchByLength resolves awkward cost-column names (spaces/dots)") {
    // a raw-spliced SQL fragment would fail to parse "token count" or
    // resolve "a.b" as a struct access; col() handles both
    val df = spark.range(0, 20).select(col("id"),
      (col("id") * 10).as("token count"))
    val out = Packing.batchByLength(df, "id", "token count",
      bucketWidth = 50L, batchSize = 4)
    assert(out.count() === 20L)
    assert(out.select("length_bucket").distinct().count() === 4L)
  }

  test("packSequences rejects reserved column names") {
    val df = Seq((1L, 2L)).toDF("id", "__cost")
    intercept[IllegalArgumentException] {
      Packing.packSequences(df, "id", "__cost", 10)
    }
  }
}
