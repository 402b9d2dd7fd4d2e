package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row

class LangModelSpec extends SparkSpec {
  import spark.implicits._

  // Corpus: "a b a" + "a c". Unigrams a:3 b:1 c:1 → V=3, N=5.
  // Bigrams: (a,b):1, (b,a):1, (a,c):1.
  private def corpus = Seq((1L, "A b a"), (2L, "a C")).toDF("doc_id", "text")

  test("trainBigramLM counts lowercased unigrams and adjacent bigrams") {
    val m = LangModel.trainBigramLM(corpus, "text").collect()
    val uni = m.filter(_.isNullAt(0)).map(r => r.getString(1) -> r.getLong(2)).toMap
    val big = m.filter(!_.isNullAt(0))
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(uni === Map("a" -> 3L, "b" -> 1L, "c" -> 1L))
    assert(big === Map(("a", "b") -> 1L, ("b", "a") -> 1L, ("a", "c") -> 1L))
  }

  test("scorePerplexity matches the hand-computed add-one cross-entropy") {
    val model = LangModel.trainBigramLM(corpus, "text")
    val got = LangModel.scorePerplexity(corpus, model, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getDouble(2), r.getDouble(3)))).toMap
    // doc 1 "a b a": P(a)=(3+1)/(5+3)=1/2; P(b|a)=(1+1)/(3+3)=1/3;
    // P(a|b)=(1+1)/(1+3)=1/2 → ce = -(ln .5 + ln(1/3) + ln .5)/3
    val ce1 = -(math.log(0.5) + math.log(1.0 / 3) + math.log(0.5)) / 3
    // doc 2 "a c": P(a)=1/2; P(c|a)=(1+1)/(3+3)=1/3 → -(ln .5 + ln(1/3))/2
    val ce2 = -(math.log(0.5) + math.log(1.0 / 3)) / 2
    assert(got(1L)._1 === 3)
    assert(got(1L)._2 === math.rint(ce1 * 1e4) / 1e4)
    assert(got(1L)._3 === math.rint(math.exp(ce1) * 1e4) / 1e4)
    assert(got(2L)._1 === 2)
    assert(got(2L)._2 === math.rint(ce2 * 1e4) / 1e4)
  }

  test("unseen tokens back off to the smoothing floor; empty docs score NULL") {
    val model = LangModel.trainBigramLM(corpus, "text")
    val other = Seq((10L, "z z"), (11L, ""), (12L, "   ")).toDF("doc_id", "text")
    val rows = LangModel.scorePerplexity(other, model, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    // "z z": P(z)=(0+1)/(5+3)=1/8; P(z|z)=(0+1)/(0+3)=1/3
    val ce = -(math.log(1.0 / 8) + math.log(1.0 / 3)) / 2
    assert(rows(10L).getDouble(2) === math.rint(ce * 1e4) / 1e4)
    for (id <- Seq(11L, 12L)) {
      assert(rows(id).getInt(1) === 0)
      assert(rows(id).isNullAt(2) && rows(id).isNullAt(3))
    }
  }

  test("an empty training corpus fails loudly, not with infinite probabilities") {
    // V = N = 0 would make every smoothed probability (c+1)/0 = +Inf and
    // every ppl 0 — silently passing any filter; the guard refuses instead
    val empty = Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text")
    val model = LangModel.trainBigramLM(empty, "text")
    val ex = intercept[IllegalArgumentException] {
      LangModel.scorePerplexity(corpus, model, "doc_id", "text")
    }
    assert(ex.getMessage.contains("no unigram rows"))
  }

  test("trainNgramLM counts all orders; stupid backoff matches hand-computed scores") {
    // corpus "a b c" + "a b d": uni a:2 b:2 c:1 d:1 (V=4, N=6);
    // bi "a b":2 "b c":1 "b d":1; tri "a b c":1 "a b d":1
    val docs = Seq((1L, "a b c"), (2L, "a b d")).toDF("doc_id", "text")
    val model = LangModel.trainNgramLM(docs, "text", maxOrder = 3)
    val byOrder = model.collect()
      .groupBy(_.getInt(1)).map { case (k, rs) =>
        k -> rs.map(r => r.getString(0) -> r.getLong(2)).toMap }
    assert(byOrder(1) === Map("a" -> 2L, "b" -> 2L, "c" -> 1L, "d" -> 1L))
    assert(byOrder(2) === Map("a b" -> 2L, "b c" -> 1L, "b d" -> 1L))
    assert(byOrder(3) === Map("a b c" -> 1L, "a b d" -> 1L))

    val score = Seq((10L, "a b c"), (11L, "b c d"), (12L, "z"), (13L, ""))
      .toDF("doc_id", "text")
    val got = LangModel.scoreStupidBackoff(score, model, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    // "a b c": floor(a)=0.3 (start at order 1, no α); "a b" seen → 2/c1(a)=1.0
    // (start at order 2, no α); "a b c" seen → 1/c2("a b")=0.5
    assert(got(10L).getDouble(2) ===
      r4(-(math.log(0.3) + math.log(1.0) + math.log(0.5)) / 3))
    // "b c d": floor(b)=0.3; "b c" seen → 1/c1(b)=0.5; tri "b c d" AND
    // bi "c d" unseen → α²·floor(d)=0.16·0.2
    assert(got(11L).getDouble(2) ===
      r4(-(math.log(0.3) + math.log(0.5) + math.log(0.16 * 0.2)) / 3))
    // "z": OOV single token → Laplace floor 1/10, no α (order 1 is the start)
    assert(got(12L).getDouble(2) === r4(-math.log(0.1)))
    assert(got(13L).getInt(1) === 0 && got(13L).isNullAt(2))
  }

  test("Kneser-Ney matches the hand-computed interpolated arithmetic") {
    // corpus: "a b c", "a b d", "b c" →
    //   uni types V=4 (a,b,c,d); bi types B=3 ("a b":2,"b c":2,"b d":1);
    //   tri types: "a b c":1, "a b d":1
    // derived: N1+("a b"•)=2; cont N1+(•"b c")=1, N1+(•"b d")=1;
    //   N1+(•b•)=2; |{w: N1+(•bw)>0}|=2; N1+(•w): b←"a b", c←"b c",
    //   d←"b d" each 1 → Pc(a)=1/7, Pc(b)=Pc(c)=Pc(d)=2/7
    val docs = Seq((1L, "a b c"), (2L, "a b d"), (3L, "b c"))
      .toDF("doc_id", "text")
    val model = LangModel.trainNgramLM(docs, "text", maxOrder = 3)
    val D = 0.75
    val score = Seq((10L, "a b c"), (11L, "z"), (12L, ""))
      .toDF("doc_id", "text")
    val got = LangModel.scoreKneserNey(score, model, "doc_id", "text",
      discount = D).collect().map(r => r.getLong(0) -> r).toMap
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    // i=1 "a": Pc(a) = (0+1)/(3+4) = 1/7
    val p1 = 1.0 / 7
    // i=2 "b"|a: N1+(•a•)=0 → Pc(b) = 2/7
    val p2 = 2.0 / 7
    // i=3 "c"|"a b": c("a b")=2, N1+("a b"•)=2 →
    //   P(c|b) = max(1−D,0)/N1+(•b•) + D·2/N1+(•b•)·Pc(c)
    //          = 0.25/2 + 0.75·(2/7) = 0.125 + 3/14
    //   P = max(1−D,0)/2 + D·2/2·P(c|b)
    val p2lvl = (1 - D) / 2 + D * 2.0 / 2 * (2.0 / 7)
    val p3 = (1 - D) / 2 + D * 2.0 / 2 * p2lvl
    assert(got(10L).getInt(1) === 3)
    assert(got(10L).getDouble(2) ===
      r4(-(math.log(p1) + math.log(p2) + math.log(p3)) / 3))
    // OOV single token: Pc(z) = 1/7 (add-one continuation floor)
    assert(got(11L).getDouble(2) === r4(-math.log(1.0 / 7)))
    assert(got(12L).getInt(1) === 0 && got(12L).isNullAt(2))
  }

  test("hashed-key Kneser-Ney equals the string-key scores exactly") {
    val docs = Seq((1L, "a b c d"), (2L, "a b d"), (3L, "b c"), (4L, ""),
      (5L, "q z")).toDF("doc_id", "text")
    val model = LangModel.trainNgramLM(docs, "text", maxOrder = 3)
    def rows(hashed: Boolean) =
      LangModel.scoreKneserNey(docs, model, "doc_id", "text",
        hashedKeys = hashed)
        .collect().map(r => (r.getLong(0), r.getInt(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2))))
        .sortBy(_._1).toSeq
    assert(rows(true) === rows(false))
  }

  test("hashed-key backoff scores equal the string-key scores exactly") {
    // hashedKeys ships 8-byte xxhash64 keys through every shuffle; on a
    // collision-free corpus (any test SF) the scores are bit-identical
    val docs = Seq((1L, "a b c d e"), (2L, "a b d"), (3L, "z q"),
      (4L, ""), (5L, "c")).toDF("doc_id", "text")
    val ms = LangModel.trainNgramLM(docs, "text", maxOrder = 3)
    val mh = LangModel.trainNgramLM(docs, "text", maxOrder = 3,
      hashedKeys = true)
    assert(mh.columns.toSeq === Seq("gramh", "n", "cnt"))
    // same count multiset per order — the hash only renames keys
    assert(mh.groupBy("n").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      === ms.groupBy("n").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap)
    def rows(m: org.apache.spark.sql.DataFrame) =
      LangModel.scoreStupidBackoff(docs, m, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getInt(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))).sortBy(_._1).toSeq
    assert(rows(mh) === rows(ms))
  }

  test("hashed-key bigram perplexity equals the string-key scores exactly") {
    val docs = Seq((1L, "a b a c"), (2L, "a c"), (3L, "z z"), (4L, ""))
      .toDF("doc_id", "text")
    val ms = LangModel.trainBigramLM(docs, "text")
    val mh = LangModel.trainBigramLM(docs, "text", hashedKeys = true)
    assert(mh.columns.toSeq === Seq("prevh", "curh", "cnt"))
    def rows(m: org.apache.spark.sql.DataFrame) =
      LangModel.scorePerplexity(docs, m, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getInt(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))
        .sortBy(_._1).toSeq
    assert(rows(mh) === rows(ms))
  }

  test("perplexityFilter keeps low-perplexity and empty docs, drops gibberish") {
    val train = Seq.tabulate(20)(i => (i.toLong, "the cat sat on the mat"))
      .toDF("doc_id", "text")
    val docs = Seq((100L, "the cat sat on the mat"), (101L, "zq xv qqq zz pf"),
      (102L, "")).toDF("doc_id", "text")
    val kept = LangModel.perplexityFilter(docs, train, "doc_id", "text",
      maxPpl = 8.0).select("doc_id").as[Long].collect().toSet
    assert(kept === Set(100L, 102L))
  }
}
