package graft.operators

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("train learns the hand-derived merge sequence with deterministic tie-breaks") {
    // word freqs: low ×5, lowest ×2, newer ×6, wider ×3 — the merge
    // sequence below is derived BY HAND from the Sennrich algorithm with
    // this codebase's tie-break (count desc, pair lexicographic asc):
    //   (e,r)9 → (l,o)7-tie-lex → (lo,w)7 → (e,w)6-tie-lex →
    //   (ew,er)6 → (n,ewer)6 → then the wider/lowest tails
    val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lowest") ++
      Seq.fill(6)("newer") ++ Seq.fill(3)("wider"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val vocab = Bpe.train(docs, "text", numMerges = 100)
    assert(vocab.merges.take(6) === Vector(
      ("e", "r"), ("l", "o"), ("lo", "w"), ("e", "w"), ("ew", "er"),
      ("n", "ewer")))
    // every corpus word collapses, then training stops (no pair repeats)
    assert(vocab.merges.length === 12)
    for (w <- Seq("low", "lowest", "newer", "wider"))
      assert(vocab.encodeWord(w) === Vector(w))
    // unseen word: learned merges apply greedily, the rest stays chars
    assert(vocab.encodeWord("news") === Vector("n", "ew", "s"))
    val counts = Bpe.tokenCounts(docs, "doc_id", "text", vocab)
      .as[(Long, Long)].collect()
    assert(counts.length === 16 && counts.forall(_._2 == 1L))
  }

  test("incremental pair counting learns the identical sequence to a full recount") {
    // a mixed-shape corpus with overlapping-pair words (aaa…), shared
    // stems, and ties — the incremental bookkeeping must reproduce the
    // recount's merge SEQUENCE exactly, not just the final vocab set
    val docs = (0 until 200).map { i =>
      val w = (i % 7) match {
        case 0 => "aaaa"
        case 1 => "banana"
        case 2 => "bandana"
        case 3 => "cabana"
        case 4 => s"tok${i % 13}x"
        case 5 => "aab aab abb"
        case _ => s"pre${i % 5}fix post${i % 3}fix"
      }
      (i.toLong, w)
    }.toDF("doc_id", "text")
    val inc = Bpe.train(docs, "text", numMerges = 64)
    val ref = Bpe.trainRecount(docs, "text", numMerges = 64)
    assert(inc.merges === ref.merges)
  }

  test("encoding applies merges lowest-rank-first; empty and OOV text behave") {
    val vocab = Bpe.Vocab(Vector(("a", "b"), ("ab", "c")))
    assert(vocab.encodeWord("abcabc") === Vector("abc", "abc"))
    assert(vocab.encodeWord("zq") === Vector("z", "q"))
    val docs = Seq((1L, "abc ab zz"), (2L, ""), (3L, "   "))
      .toDF("doc_id", "text")
    val m = Bpe.tokenCounts(docs, "doc_id", "text", vocab)
      .as[(Long, Long)].collect().toMap
    // abc→1, ab→1, zz→2 chars; blank docs count zero
    assert(m === Map(1L -> 4L, 2L -> 0L, 3L -> 0L))
  }
}
