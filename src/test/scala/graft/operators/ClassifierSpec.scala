package graft.operators

import graft.SparkSpec

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def r4(x: Double) = math.rint(x * 1e4) / 1e4

  test("NB log-odds match the hand-computed Laplace arithmetic (unigrams)") {
    // pos "cat cat", neg "dog": feats cat:(2,0) dog:(0,1) → V=2,
    // NPos=2, NNeg=1; 1 doc each → prior ln(1/1)=0
    val labeled = Seq((1L, "cat cat", true), (2L, "dog", false))
      .toDF("doc_id", "text", "y")
    val m = Classifier.trainNaiveBayes(labeled, "y", "text", ngramOrder = 1)
    assert(m.vocab === 2.0 && m.nPos === 2.0 && m.nNeg === 1.0)
    assert(m.posDocs === 1L && m.negDocs === 1L && m.priorLogOdds === 0.0)
    val score = Seq((10L, "cat"), (11L, "dog dog"), (12L, ""))
      .toDF("doc_id", "text")
    val got = Classifier.scoreLogOdds(score, m, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2))))
      .toMap
    // "cat": ln((2+1)/(2+2)) − ln((0+1)/(1+2)) = ln(9/4)
    assert(got(10L) === ((1, r4(math.log(9.0 / 4)))))
    // "dog dog": 2 × [ln(1/4) − ln(2/3)] = 2·ln(3/8)
    assert(got(11L) === ((2, r4(2 * math.log(3.0 / 8)))))
    // featureless doc scores the prior exactly
    assert(got(12L) === ((0, 0.0)))
  }

  test("ngramOrder=2 features are unigrams plus word bigrams") {
    val labeled = Seq((1L, "a b", true), (2L, "c", false))
      .toDF("doc_id", "text", "y")
    val m = Classifier.trainNaiveBayes(labeled, "y", "text", ngramOrder = 2)
    val feats = m.features.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(feats === Map("a" -> ((1L, 0L)), "b" -> ((1L, 0L)),
      "a b" -> ((1L, 0L)), "c" -> ((0L, 1L))))
  }

  test("hashed-key mode scores identically to the string-key mode") {
    val labeled = Seq((1L, "alpha beta gamma", true), (2L, "alpha beta", true),
      (3L, "delta epsilon zeta", false), (4L, "delta zeta", false),
      (5L, "", false)).toDF("doc_id", "text", "y")
    val ms = Classifier.trainNaiveBayes(labeled, "y", "text")
    val mh = Classifier.trainNaiveBayes(labeled, "y", "text",
      hashedKeys = true)
    assert(mh.features.columns.toSeq === Seq("feath", "cnt_pos", "cnt_neg"))
    def rows(m: Classifier.NaiveBayesModel) =
      Classifier.scoreLogOdds(labeled, m, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
        .sortBy(_._1).toSeq
    assert(rows(mh) === rows(ms))
  }

  test("a one-class labeling fails loudly instead of scoring +/-Inf") {
    val labeled = Seq((1L, "a", true), (2L, "b", true))
      .toDF("doc_id", "text", "y")
    val ex = intercept[IllegalArgumentException] {
      Classifier.trainNaiveBayes(labeled, "y", "text")
    }
    assert(ex.getMessage.contains("both classes"))
  }

  test("classifierFilter separates a planted two-domain corpus") {
    // 20 target docs over a disjoint vocabulary vs 80 crawl docs —
    // distinct token sets so separation is a property of the training
    // math, not fixture luck (and no repeating-substring cross-matches)
    val tgt = (0 until 20).map(i =>
      (i.toLong, s"quality prose tok${i % 5} curated"))
    val crawl = (0 until 80).map(i =>
      (100L + i, s"spam noise junk${i % 7} listing"))
    val docs = (tgt ++ crawl).toDF("doc_id", "text")
    val target = docs.filter($"doc_id" < 20)
    val kept = Classifier.classifierFilter(docs, target, "doc_id", "text",
      minLogOdds = 0.0).select("doc_id").as[Long].collect().toSet
    assert(kept === (0L until 20L).toSet)
  }
}
