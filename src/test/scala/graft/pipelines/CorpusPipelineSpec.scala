package graft.pipelines

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{Dedup, TextAnalysis}

class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  // distinct md5-derived docs (no accidental shingle overlap), some long
  // enough to pass the token gate, plus exact copies and URL variants
  private def corpus() = {
    val base = spark.range(100).toDF("doc_id")
      .withColumn("text", concat_ws(" ",
        expr("transform(sequence(1, 30), " +
          "i -> substr(md5(concat(cast(doc_id as string), ':', cast(i as string))), 1, 8))")))
      .withColumn("url", concat(lit("https://site"),
        expr("doc_id div 2").cast("string"), lit(".com/p"),
        when(col("doc_id") % 2 === 1, "?utm_source=x").otherwise("")))
    base
  }

  test("all stages off is the identity plan") {
    val df = corpus()
    val out = CorpusPipeline.prepare(df, CorpusPrepConfig(
      exactDedup = false, minQuality = None, tokenRange = None))
    assert(out.exceptAll(df).isEmpty && df.exceptAll(out).isEmpty)
  }

  test("default config equals the inline exact-dedup + quality composition") {
    val df = corpus().select("doc_id", "text")
    val facade = CorpusPipeline.prepare(df, CorpusPrepConfig())
    val inline = {
      val d = Dedup.exactScalable(df, "text", "doc_id")
      TextAnalysis.withQuality(d, "text")
        .filter(col("quality_score") >= 0.5 && col("q_tokens").between(5, 10000))
        .select("doc_id", "text")
    }
    assert(facade.exceptAll(inline).isEmpty && inline.exceptAll(facade).isEmpty)
  }

  test("target-share mixing stage runs and keeps the input schema") {
    val df = corpus().select("doc_id", "text")
      .withColumn("source",
        concat(lit("s"), (col("doc_id") % 2).cast("string")))
    val out = CorpusPipeline.prepare(df, CorpusPrepConfig(
      exactDedup = false, minQuality = None, tokenRange = None,
      targetShares = Some(("source", Map("s0" -> 0.7, "s1" -> 0.3)))))
    assert(out.columns.toSeq === df.columns.toSeq)
    val bySrc = out.groupBy("source").count().as[(String, Long)].collect().toMap
    // binding source keeps everything; the other downsamples
    assert(bySrc.values.sum < 100L && bySrc.getOrElse("s0", 0L) > 0L)
  }

  test("eval-set decontamination drops near-copies of eval docs") {
    val df = corpus().select("doc_id", "text")
    // the eval set is a near-copy of docs 10 and 20 (disjoint id space)
    val eval = df.filter(col("doc_id").isin(10L, 20L))
      .select((col("doc_id") + 5000L).as("doc_id"),
        concat(col("text"), lit(" zq")).as("text"))
    val out = CorpusPipeline.prepare(df, CorpusPrepConfig(
        exactDedup = false, minQuality = None, tokenRange = None),
      evalSets = Seq(eval))
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(!ids.contains(10L) && !ids.contains(20L))
    assert(ids.size === 98)
  }

  test("url dedup + near-dup + split compose in the canonical order") {
    // every doc pair (2k, 2k+1) shares a canonical URL → odd ids drop in
    // stage 1 BEFORE sketching; a planted near-dup of doc 0 survives URL
    // dedup (distinct url) but drops in the near-dup stage
    val df = corpus()
    val plant = df.filter(col("doc_id") === 0)
      .select((col("doc_id") + 1000L).as("doc_id"),
        concat(col("text"), lit(" zq")).as("text"),
        lit("https://elsewhere.com/q").as("url"))
    val out = CorpusPipeline.prepare(df.unionByName(plant),
      CorpusPrepConfig(urlCol = Some("url"), exactDedup = true,
        minQuality = None, tokenRange = None,
        nearDupThreshold = Some(0.7),
        splitWeights = Some(Seq("train" -> 0.9, "test" -> 0.1))))
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(ids === (0L until 100L by 2).toSet, s"got $ids")
    assert(out.columns.contains("split"))
    val splits = out.select("split").distinct().as[String].collect().toSet
    assert(splits.subsetOf(Set("train", "test")) && splits.nonEmpty)
  }
}
