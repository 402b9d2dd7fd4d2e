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

  test("normalize stage equals inline normalizeText; NFC variants now " +
      "collapse under exact dedup") {
    // two docs identical up to NFC form + whitespace noise: only with
    // the normalize stage on do they dedup to one survivor
    val df = Seq(
      (1L, "cafe\u0301 one two three four five"),   // decomposed
      (2L, "café  one two three\tfour five"),
      (3L, "all-whitespace doc below"),
      (4L, " \t ")
    ).toDF("doc_id", "text")
    val facade = CorpusPipeline.prepare(df, CorpusPrepConfig(
      normalizeText = true, minQuality = None, tokenRange = None))
    val inline = {
      val n = df.withColumn("text", TextAnalysis.normalizeText(col("text")))
        .filter(length(col("text")) > 0)
      val keep = Dedup.exactScalable(n, "text", "doc_id")
        .select(col("doc_id").as("__k"))
      n.join(keep, col("doc_id") === col("__k"), "left_semi")
        .select("doc_id", "text")
    }
    assert(facade.exceptAll(inline).isEmpty && inline.exceptAll(facade).isEmpty)
    val ids = facade.select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids === Seq(1L, 3L)) // 2 deduped into 1; 4 normalized empty
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

  test("blocklist stage equals inline bloomAntiJoin; schema preserved") {
    val df = corpus() // keeps the url column — the C4 bad-URL cut shape
    val block = Seq("https://site3.com/p", "https://site7.com/p").toDF("bad_url")
    val facade = CorpusPipeline.prepare(df, CorpusPrepConfig(
      exactDedup = false, minQuality = None, tokenRange = None,
      blocklist = Some((block, "url", "bad_url"))))
    val inline = graft.operators.Sketches.bloomAntiJoin(df, block, "url", "bad_url")
    assert(facade.columns.toSeq === df.columns.toSeq)
    assert(facade.exceptAll(inline).isEmpty && inline.exceptAll(facade).isEmpty)
    // the blocked urls are gone, everything else survives
    assert(facade.filter(col("url").isin("https://site3.com/p",
      "https://site7.com/p")).isEmpty)
    assert(facade.count() === df.count() - 2)
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

  test("boilerplate stage equals inline stripBoilerplate; all-boilerplate docs drop") {
    val df = (0L until 10L).map { i =>
      val body = s"unique line $i alpha\nunique line $i beta"
      val t =
        if (i == 9L) "subscribe to our newsletter"
        else if (i < 6) s"subscribe to our newsletter\n$body"
        else body
      (i, t)
    }.toDF("doc_id", "text")
    val facade = CorpusPipeline.prepare(df, CorpusPrepConfig(
      exactDedup = false, minQuality = None, tokenRange = None,
      boilerplateMinDocFreq = Some(3)))
    val inline = TextAnalysis.stripBoilerplate(df, "doc_id", "text", 3)
      .filter(length(trim(col("text"))) > 0)
    assert(facade.exceptAll(inline).isEmpty && inline.exceptAll(facade).isEmpty)
    // doc 9 was ONLY the censored line → emptied → dropped
    assert(!facade.select("doc_id").as[Long].collect().contains(9L))
  }

  test("span and chunk dedup stages equal their inline compositions") {
    // doc 50 is a full copy of doc 0 (all chunks lose → doc drops);
    // doc 51 embeds a 6-token run of doc 1 inside novel text
    val base = (0L until 50L).map { i =>
      (i, (1 to 24).map(k => s"w${i}x$k").mkString(" "))
    }
    val spanRun = base(1)._2.split(" ").take(6).mkString(" ")
    val df = (base ++ Seq((50L, base(0)._2), (51L, s"zz aa $spanRun qq rr")))
      .toDF("doc_id", "text")
    val off = CorpusPrepConfig(exactDedup = false, minQuality = None,
      tokenRange = None)

    val facadeChunk = CorpusPipeline.prepare(df,
      off.copy(chunkDedupTokens = Some(8)))
    val inlineChunk = Dedup.dedupChunks(df, "doc_id", "text", 8)
      .select(col("doc_id"), col("clean_text").as("text"))
      .filter(length(trim(col("text"))) > 0)
    assert(facadeChunk.exceptAll(inlineChunk).isEmpty &&
      inlineChunk.exceptAll(facadeChunk).isEmpty)
    assert(!facadeChunk.select("doc_id").as[Long].collect().contains(50L))

    val facadeSpan = CorpusPipeline.prepare(df,
      off.copy(spanDedupTokens = Some(6)))
    val inlineSpan = Dedup.removeRepeatedSpans(df, "doc_id", "text", 6)
      .select(col("doc_id"), col("clean_text").as("text"))
      .filter(length(trim(col("text"))) > 0)
    assert(facadeSpan.exceptAll(inlineSpan).isEmpty &&
      inlineSpan.exceptAll(facadeSpan).isEmpty)
    // the stolen run is cut from doc 51, the novel frame survives
    val d51 = facadeSpan.filter(col("doc_id") === 51L)
      .select("text").as[String].collect()
    assert(d51.toSeq === Seq("zz aa qq rr"))
  }

  test("exact n-gram decontamination catches partial containment LSH misses") {
    val df = corpus().select("doc_id", "text")
    // the eval doc embeds an 8-token RUN of doc 30 inside unrelated
    // text: whole-doc Jaccard is far below the LSH threshold, so only
    // the exact-n-gram pass can flag doc 30
    val run = df.filter(col("doc_id") === 30L)
      .select("text").as[String].head().split(" ").slice(5, 13).mkString(" ")
    val eval = Seq((9000L,
      s"alpha beta gamma $run delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val off = CorpusPrepConfig(exactDedup = false, minQuality = None,
      tokenRange = None)
    val lshOnly = CorpusPipeline.prepare(df, off, evalSets = Seq(eval))
      .select("doc_id").as[Long].collect().toSet
    val withNgram = CorpusPipeline.prepare(df,
        off.copy(ngramDecontamination = Some((8, 1))), evalSets = Seq(eval))
      .select("doc_id").as[Long].collect().toSet
    assert(lshOnly.contains(30L), "LSH alone must miss the partial overlap")
    assert(withNgram === lshOnly - 30L)
  }

  test("perplexity stage equals inline perplexityFilter; gibberish drops") {
    import graft.operators.LangModel
    val df = (Seq.tabulate(40)(i => (i.toLong, "the cat sat on the mat today")) :+
      ((99L, "zq xv qqq zz pf mmm ww")))
      .toDF("doc_id", "text")
    val facade = CorpusPipeline.prepare(df, CorpusPrepConfig(
      exactDedup = false, minQuality = None, tokenRange = None,
      maxPerplexity = Some(8.0)))
    val inline = LangModel.perplexityFilter(df, df, "doc_id", "text", 8.0)
    assert(facade.exceptAll(inline).isEmpty && inline.exceptAll(facade).isEmpty)
    assert(!facade.select("doc_id").as[Long].collect().contains(99L))
  }

  test("perplexity stage skips (keeps all) when every surviving text is empty") {
    val df = Seq((1L, ""), (2L, "   "), (3L, "")).toDF("doc_id", "text")
    val out = CorpusPipeline.prepare(df, CorpusPrepConfig(
      exactDedup = false, minQuality = None, tokenRange = None,
      maxPerplexity = Some(8.0)))
    assert(out.select("doc_id").as[Long].collect().toSet === Set(1L, 2L, 3L))
  }

  test("backoff stage equals inline backoffFilter; gibberish drops") {
    import graft.operators.LangModel
    val df = (Seq.tabulate(40)(i => (i.toLong, "the cat sat on the mat today")) :+
      ((99L, "zq xv qqq zz pf mmm ww")))
      .toDF("doc_id", "text")
    val facade = CorpusPipeline.prepare(df, CorpusPrepConfig(
      exactDedup = false, minQuality = None, tokenRange = None,
      maxBackoffCe = Some(0.5)))
    val inline = LangModel.backoffFilter(df, df, "doc_id", "text", 0.5)
    assert(facade.exceptAll(inline).isEmpty && inline.exceptAll(facade).isEmpty)
    assert(!facade.select("doc_id").as[Long].collect().contains(99L))
  }

  test("classifier stage equals inline classifierFilter; off-domain drops") {
    import graft.operators.Classifier
    val tgt = (0 until 20).map(i =>
      (i.toLong, s"quality prose tok${i % 5} curated"))
    val crawl = (0 until 60).map(i =>
      (100L + i, s"spam noise junk${i % 7} listing"))
    val df = (tgt ++ crawl).toDF("doc_id", "text")
    val exemplars = df.filter($"doc_id" < 20)
    val facade = CorpusPipeline.prepare(df, CorpusPrepConfig(
      exactDedup = false, minQuality = None, tokenRange = None,
      classifierTarget = Some((exemplars, 0.0))))
    val inline = Classifier.classifierFilter(df, exemplars, "doc_id",
      "text", 0.0)
    assert(facade.exceptAll(inline).isEmpty && inline.exceptAll(facade).isEmpty)
    assert(facade.select("doc_id").as[Long].collect().toSet ===
      (0L until 20L).toSet)
  }

  test("DSIR stage equals inline selectByImportance; target slice enriches") {
    import graft.operators.DataSelection
    // 10 docs carry the planted 'dup' marker vocabulary; the rest are
    // md5 noise — the importance cut must favor the marked slice
    val df = corpus().withColumn("text",
      when(col("doc_id") < 10,
        concat_ws(" ", lit("dup alpha beta gamma delta"), col("text")))
        .otherwise(col("text")))
      .select("doc_id", "text")
    val target = df.filter(col("text").contains("dup"))
    val facade = CorpusPipeline.prepare(df, CorpusPrepConfig(
      exactDedup = false, minQuality = None, tokenRange = None,
      importanceTarget = Some((target, 12)), seed = 11L))
    val inline = DataSelection.selectByImportance(df, target, "doc_id",
      "text", 12, 11L)
    assert(facade.exceptAll(inline).isEmpty && inline.exceptAll(facade).isEmpty)
    val picked = facade.select("doc_id").as[Long].collect().toSet
    assert(picked.count(_ < 10L) >= 8,
      s"importance cut should be dominated by the target slice: $picked")
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

  test("release gates: a failing audit REFUSES the corpus with " +
      "counters; passing audits are value-neutral") {
    import graft.operators.Quality._
    // 4 docs: lang 'en' has 3 rows / 2 sources, lang 'fr' has ONE row
    // (k = 2 violation) whose source is also unique per class
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again", "en", "s1"),
      (2L, "the quick brown fox leaps over the lazy dog again", "en", "s1"),
      (3L, "the slow brown fox walks under the lazy dog again", "en", "s2"),
      (4L, "le renard brun rapide saute par dessus le chien", "fr", "s3"))
      .toDF("doc_id", "text", "lang", "source")
    val noContent = CorpusPrepConfig(exactDedup = false,
      minQuality = None, tokenRange = None)
    // k-anonymity refusal: the 'fr' class has 1 < 2 rows
    val e1 = intercept[IllegalStateException] {
      CorpusPipeline.prepare(df, noContent.copy(
        releaseKAnonymity = Some((Seq("lang"), 2L))))
    }
    assert(e1.getMessage.contains("k-anonymity") &&
      e1.getMessage.contains("1 of 2 classes"), e1.getMessage)
    // l-diversity refusal: 'fr' has one distinct source (< 2)
    val e2 = intercept[IllegalStateException] {
      CorpusPipeline.prepare(df, noContent.copy(
        releaseLDiversity = Some((Seq("lang"), "source", 2L))))
    }
    assert(e2.getMessage.contains("l-diversity"), e2.getMessage)
    // t-closeness refusal: 'fr' (one row, source s3) is maximally
    // skewed vs the table's source distribution
    val e2t = intercept[IllegalStateException] {
      CorpusPipeline.prepare(df, noContent.copy(
        releaseTCloseness = Some((Seq("lang"), "source", 0.1))))
    }
    assert(e2t.getMessage.contains("t-closeness"), e2t.getMessage)
    // expectation refusal carries the per-rule counters
    val e3 = intercept[IllegalStateException] {
      CorpusPipeline.prepare(
        df.unionByName(Seq((4L, "dup id", "en", "s1"))
          .toDF("doc_id", "text", "lang", "source")),
        noContent.copy(releaseExpectations =
          Seq(NotNull("doc_id"), Unique(Seq("doc_id")))))
    }
    assert(e3.getMessage.contains("unique(doc_id)=1"), e3.getMessage)
    // passing gates return the frame unchanged (value-neutral)
    val ok = CorpusPipeline.prepare(df, noContent.copy(
      releaseKAnonymity = Some((Seq("lang"), 1L)),
      releaseLDiversity = Some((Seq("lang"), "source", 1L)),
      releaseTCloseness = Some((Seq("lang"), "source", 0.99)),
      releaseExpectations = Seq(NotNull("doc_id"),
        Custom("non_empty", length(col("text")) > 0))))
    assert(ok.exceptAll(df).isEmpty && df.exceptAll(ok).isEmpty)
  }

  test("fairness release gate: four-fifths refusal when the quality " +
      "cut prunes one group disproportionately; passing is neutral") {
    // 'en' docs: real sentences that clear the default quality gate;
    // 'xx' docs: stopword-free noise the gate prunes — selection rates
    // en 1.0 vs xx 0.0, dp_ratio 0.0 < 0.8 -> REFUSE
    val en = (1L to 4L).map(i =>
      (i, "the quick brown fox jumps over the lazy dog once more " + i,
        "en"))
    val xx = (5L to 8L).map(i => (i, "zzz qqq " + i, "xx"))
    val df = (en ++ xx).toDF("doc_id", "text", "lang")
    val e = intercept[IllegalStateException] {
      CorpusPipeline.prepare(df,
        CorpusPrepConfig(releaseFairness = Some(("lang", 0.8))))
    }
    assert(e.getMessage.contains("fairness") &&
      e.getMessage.contains("four-fifths") &&
      e.getMessage.contains("xx"), e.getMessage)
    // with no content gates, every group survives equally: dp_ratio 1
    val ok = CorpusPipeline.prepare(df,
      CorpusPrepConfig(exactDedup = false, minQuality = None,
        tokenRange = None, releaseFairness = Some(("lang", 0.8))))
    assert(ok.count() === 8L)
    // a group column absent from the input fails loud
    intercept[IllegalArgumentException] {
      CorpusPipeline.prepare(df,
        CorpusPrepConfig(releaseFairness = Some(("nope", 0.8))))
    }
  }
}
