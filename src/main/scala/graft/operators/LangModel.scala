package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.core.LineageCut._

/**
 * N-gram language-model quality scoring (mission extension, SURVEY.md
 * §7.4) — the CCNet/RedPajama-style perplexity filter: train a bigram LM
 * on a (clean) corpus, score each document by its per-token cross-entropy
 * under that model, and drop the tail. A document that the corpus-level
 * model finds "surprising" (high perplexity) is boilerplate, gibberish,
 * non-language, or out-of-domain — exactly the material LLM pipelines
 * filter before training.
 *
 * Model = add-one (Laplace) smoothed bigram LM over whitespace tokens,
 * the same tokenizer as the rest of the text surface (`lower`, `trim`,
 * `split("\\s+")`, empties dropped), so perplexities compose with
 * [[TextAnalysis]] gates:
 *
 *   P(w_1)           = (c(w_1) + 1) / (N + V)
 *   P(w_i | w_{i-1}) = (c(w_{i-1} w_i) + 1) / (c(w_{i-1}) + V)
 *   crossEntropy(d)  = -(1/n_d) * sum ln P    (nats), ppl = exp(ce)
 *
 * Scale shape: everything is map-side array work (`transform`/`slice` on
 * the token array — bigrams are derived WITHOUT a window shuffle) plus
 * hash aggregations keyed by short token strings. Scoring joins the
 * per-doc n-gram frame (doc id + two tokens per row — no document text)
 * against the model on its natural keys; both sides are key-only frames,
 * so the shuffles ship tokens, never bodies. The model itself is
 * O(unique bigrams) — at 100 TB train on a sampled/clean slice (CCNet
 * trains on Wikipedia, not the crawl) so the model side stays small and
 * AQE broadcasts it.
 */
object LangModel {

  /** Lowercased whitespace tokens, empties dropped — the corpus-standard
    * tokenizer ([[TextAnalysis.tokens]] ∘ lower, minus empty strings).
    * Shared with [[Classifier]] so LM gates and classifier cuts compose
    * over the SAME token stream by construction, not by hand-sync. */
  private[operators] def toks(text: Column): Column =
    filter(split(trim(lower(text)), "\\s+"), t => t =!= lit(""))

  /** Null-preserving 8-byte key of a (possibly null) gram string. Plain
    * `xxhash64(null)` returns the seed, which would let a leading
    * position's absent prefix "match" a real gram whose hash happens to
    * equal it AND lose the nullability the backoff `when`-chain reads. */
  private def hkey(c: Column): Column = when(c.isNotNull, xxhash64(c))

  /**
   * Train the bigram model. Returns one DataFrame carrying both orders:
   * unigram rows (`prev IS NULL`, `cur`, `cnt`) and bigram rows
   * (`prev`, `cur`, `cnt`). Laplace constants (V = unigram row count,
   * N = unigram count sum) derive from the unigram rows at scoring time.
   *
   * `hashedKeys = true` is the 100 TB shuffle diet: tokens are keyed by
   * `xxhash64` (columns `prevh`/`curh`, 8 bytes each) from the training
   * aggregation onward, so neither the model agg nor the scoring joins
   * ever ship token strings. A hash collision conflates two tokens'
   * counts — a ~1e-19-probability score perturbation, not a correctness
   * event — and the scorer auto-detects the mode from the schema, so a
   * string model can never silently join against hashed positions. The
   * string mode stays the oracle-parity default.
   */
  def trainBigramLM(docs: DataFrame, textCol: String,
                    hashedKeys: Boolean = false): DataFrame = {
    val base = docs.select(toks(col(textCol)).as("t")).where(size(col("t")) > 0)
    def k(c: Column) = if (hashedKeys) hkey(c) else c
    val (prevName, curName) = if (hashedKeys) ("prevh", "curh") else ("prev", "cur")
    val keyType = if (hashedKeys) "long" else "string"
    val uni = base.select(explode(col("t")).as("tok"))
      .groupBy(k(col("tok")).as(curName)).agg(count(lit(1)).as("cnt"))
      .select(lit(null).cast(keyType).as(prevName), col(curName), col("cnt"))
    val big = base.where(size(col("t")) >= 2)
      .select(explode(bigrams(col("t"))).as("b"))
      .groupBy(k(col("b.prev")).as(prevName), k(col("b.cur")).as(curName))
      .agg(count(lit(1)).as("cnt"))
    uni.unionByName(big)
  }

  /** `[{prev, cur}]` adjacent pairs of a token array with size >= 2 —
    * pure array math, no shuffle, no window. */
  private def bigrams(t: Column): Column =
    transform(sequence(lit(1), size(t) - 1),
      i => struct(element_at(t, i).as("prev"), element_at(t, i + 1).as("cur")))

  /**
   * A model readied for repeated scoring: checkpointed order splits and
   * the Laplace constants, computed ONCE. [[scorePerplexity]] prepares
   * internally for one-shot use; callers that score many frames against
   * one frozen model (the streaming gate, DSIR's two scoring passes over
   * batches) prepare up front and reuse.
   */
  final case class PreparedModel private[LangModel] (
      uni: DataFrame, big: DataFrame, vocab: Double, nTotal: Double,
      hashed: Boolean)

  def prepare(model: DataFrame): PreparedModel = {
    // Mode rides the schema (trainBigramLM hashedKeys → prevh/curh), so
    // string-vs-hashed mismatches fail at analysis, never join silently.
    val hashed = model.columns.contains("prevh")
    val (prevName, curName) = if (hashed) ("prevh", "curh") else ("prev", "cur")
    // Reused by the constants collect AND both scoring joins — an eager
    // checkpoint stops the model plan (and everything upstream of the
    // training corpus) re-running once per consumer.
    val m = model.lineageCut()
    val uniModel = m.where(col(prevName).isNull)
      .select(col(curName).as("u_tok"), col("cnt").as("u_cnt"))
    val bigModel = m.where(col(prevName).isNotNull)
      .select(col(prevName).as("b_prev"), col(curName).as("b_cur"),
        col("cnt").as("b_cnt"))
    // Laplace constants: one tiny aggregate over the unigram rows. An
    // EMPTY model must fail loudly here — V = N = 0 would otherwise turn
    // every smoothed probability into (c+1)/0 = +Inf, ce into -Inf, and
    // ppl into 0, silently passing every document through any filter.
    val Array(vocab, nTotal) = uniModel
      .agg(count(lit(1)).cast("double"), sum("u_cnt").cast("double"))
      .collect()(0).toSeq.map(v => Option(v).fold(0.0)(_.asInstanceOf[Double]))
      .toArray
    require(vocab > 0,
      "scorePerplexity: the model has no unigram rows — the training " +
        "corpus was empty or all-whitespace; train on a non-empty slice")
    PreparedModel(uniModel, bigModel, vocab, nTotal, hashed)
  }

  /**
   * Score `docs` under a trained model: per-document add-one-smoothed
   * cross-entropy in nats (`ce`, 4dp) and perplexity (`ppl = exp(ce)`,
   * 4dp), plus `n_tokens`. Empty documents score NULL with `n_tokens` 0.
   * Tokens/bigrams unseen in training back off to the smoothing floor, so
   * scoring a corpus disjoint from the training slice is well-defined.
   */
  def scorePerplexity(docs: DataFrame, model: DataFrame,
                      idCol: String, textCol: String): DataFrame =
    scorePerplexity(docs, prepare(model), idCol, textCol)

  /** [[scorePerplexity]] against a [[PreparedModel]] — no per-call model
    * recompute or constants job; the per-micro-batch path. */
  def scorePerplexity(docs: DataFrame, pm: PreparedModel,
                      idCol: String, textCol: String): DataFrame = {
    val PreparedModel(uniModel, bigModel, vocab, nTotal, _) = pm
    // Position keys match the model's mode: 8-byte hashes against a
    // hashed model (the scoring shuffle ships longs, never tokens).
    def k(c: Column) = if (pm.hashed) hkey(c) else c
    val keyType = if (pm.hashed) "long" else "string"

    val base = docs.select(col(idCol).as("__id"), toks(col(textCol)).as("t"))
      .withColumn("n", size(col("t")))
    // First token: P(w1) = (c(w1)+1)/(N+V); rows carry prev = NULL.
    val first = base.where(col("n") >= 1)
      .select(col("__id"), col("n"), lit(null).cast(keyType).as("prev"),
        k(element_at(col("t"), 1)).as("cur"))
    // Interior bigrams: P(w_i|w_{i-1}) = (c(prev,cur)+1)/(c(prev)+V).
    val inner = base.where(col("n") >= 2)
      .select(col("__id"), col("n"), explode(bigrams(col("t"))).as("b"))
      .select(col("__id"), col("n"),
        k(col("b.prev")).as("prev"), k(col("b.cur")).as("cur"))

    val scored = first.unionByName(inner)
      .join(bigModel, col("prev") === col("b_prev") &&
        col("cur") === col("b_cur"), "left")
      .join(uniModel,
        coalesce(col("prev"), col("cur")) === col("u_tok"), "left")
      .withColumn("lp",
        when(col("prev").isNull,
          log((coalesce(col("u_cnt"), lit(0L)) + 1).cast("double") /
            lit(nTotal + vocab)))
          .otherwise(log((coalesce(col("b_cnt"), lit(0L)) + 1).cast("double") /
            (coalesce(col("u_cnt"), lit(0L)).cast("double") + lit(vocab)))))
      .groupBy("__id")
      .agg(first_value(col("n")).as("n_tokens"),
        (-sum(col("lp")) / first_value(col("n"))).as("ce_raw"))

    docs.select(col(idCol)).join(scored, col(idCol) === col("__id"), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0)).cast("int").as("n_tokens"),
        round(col("ce_raw"), 4).as("ce"),
        round(exp(col("ce_raw")), 4).as("ppl"))
  }

  /**
   * Train an order-1..maxOrder n-gram count model (Brants et al. 2007,
   * "Large Language Models in Machine Translation" — the distributed
   * "stupid backoff" LM built exactly this way at web scale): one row
   * per distinct n-gram, `(gram, n, cnt)` with `gram` the space-joined
   * tokens and `n` its order. Pure map-side gram construction (array
   * slices over the token array) + one hash aggregation per order.
   */
  /** `hashedKeys = true` keys the model by `xxhash64(gram)` (column
    * `gramh`, 8 bytes) so the training aggregation AND the downstream
    * scoring joins never shuffle gram strings — the measured fix for the
    * string-key sort spill at the 1M+ doc tier (SCALING.md). Collisions
    * conflate two grams' counts (~1e-19 per pair): a score perturbation,
    * not a correctness event. String mode stays the oracle default. */
  def trainNgramLM(docs: DataFrame, textCol: String,
                   maxOrder: Int = 3, hashedKeys: Boolean = false): DataFrame = {
    require(maxOrder >= 1 && maxOrder <= 5, s"maxOrder $maxOrder not in 1..5")
    // ONE corpus scan: every order's grams ride one exploded array of
    // (gram, order) structs into a single (gram, n) aggregation — a
    // per-order union would re-scan and re-tokenize the corpus k times
    val allGrams = flatten(array((1 to maxOrder).map { k =>
      val g = transform(grams(col("t"), k),
        gr => struct(gr.as("gram"), lit(k).as("n")))
      // guard: sequence(1, size-(k-1)) DESCENDS for short docs
      when(size(col("t")) >= k, g)
        .otherwise(array().cast(s"array<struct<gram:string,n:int>>"))
    }: _*))
    val keyName = if (hashedKeys) "gramh" else "gram"
    def key(c: Column) = if (hashedKeys) xxhash64(c) else c
    // fan out the tokenized frame before the per-position gram
    // explosion: a single-split corpus scan otherwise pins the whole
    // 1..k-gram build + count map side to ONE task (cutFanout is a
    // no-op at data scale — see LineageCut)
    graft.core.LineageCut.cutFanout(
      docs.select(toks(col(textCol)).as("t")).where(size(col("t")) > 0))
      .select(explode(allGrams).as("g"))
      .groupBy(key(col("g.gram")).as(keyName), col("g.n").as("n"))
      .agg(count(lit(1)).as("cnt"))
      .select(col(keyName), col("n"), col("cnt"))
  }

  /** Space-joined k-grams of a token array with size >= k — map-side.
    * Callers guard size < k (sequence DESCENDS there); shared with
    * [[Classifier]]'s feature construction. */
  private[operators] def grams(t: Column, k: Int): Column =
    transform(sequence(lit(1), size(t) - (k - 1)), i =>
      concat_ws(" ", (0 until k).map(o => element_at(t, i + o)): _*))

  /**
   * Per-document mean negative log stupid-backoff score under a
   * [[trainNgramLM]] trigram model:
   *
   *   S(w_i) = c3(g3)/c2(p3)           if the trigram was seen
   *          = α · c2(g2)/c1(p2)       else if the bigram was seen
   *          = α² · (c1(w)+1)/(N+V)    else (Laplace unigram floor — the
   *                                    one deviation from the paper,
   *                                    which has no OOV mass at all)
   *
   * with leading positions starting at their highest available order.
   * `backoff_ce = -(1/n)·Σ ln S` (4dp); empty docs score NULL. The
   * scoring frame carries only (id, five short gram strings) per token —
   * five key-only equi-joins against the model, same shuffle shape as
   * the bigram scorer.
   */
  def scoreStupidBackoff(docs: DataFrame, model: DataFrame,
                         idCol: String, textCol: String,
                         alpha: Double = 0.4): DataFrame = {
    // Mode rides the model schema (trainNgramLM hashedKeys → `gramh`):
    // against a hashed model every position ships five 8-byte longs
    // instead of five up-to-3-token strings, and a mismatch fails at
    // analysis instead of silently joining across representations.
    val hashed = model.columns.contains("gramh")
    val keyName = if (hashed) "gramh" else "gram"
    val m = model.lineageCut()
    def order(k: Int, gramCol: String, cntName: String) =
      m.where(col("n") === k)
        .select(col(keyName).as(gramCol), col("cnt").as(cntName))
    val Array(vocab, nTotal) = m.where(col("n") === 1)
      .agg(count(lit(1)).cast("double"), sum("cnt").cast("double"))
      .collect()(0).toSeq.map(v => Option(v).fold(0.0)(_.asInstanceOf[Double]))
      .toArray
    require(vocab > 0,
      "scoreStupidBackoff: the model has no unigram rows — the training " +
        "corpus was empty or all-whitespace; train on a non-empty slice")

    // fan out before the per-position explode + five joins: a
    // single-split doc scan otherwise runs that whole pipeline on ONE
    // task (no-op at data scale; per-doc fold order is unchanged — a
    // doc's positions still come from its one row in one partition)
    val base = graft.core.LineageCut.cutFanout(
      docs.select(col(idCol).as("__id"), toks(col(textCol)).as("t")))
      .withColumn("n", size(col("t")))
    // one struct per token position: the ending k-grams and their
    // backoff prefixes, built map-side from the array
    // k(): positions carry the model's key representation from the
    // explode onward (null-preserving — the α when-chain reads g2/g3
    // nullability to know each position's starting order)
    def k(c: Column) = if (hashed) hkey(c) else c
    val pos = base.where(col("n") >= 1)
      .select(col("__id"), col("n"), explode(transform(
        sequence(lit(1), size(col("t"))), i => struct(
          k(element_at(col("t"), i)).as("w1"),
          k(when(i >= 2, concat_ws(" ",
            element_at(col("t"), i - 1), element_at(col("t"), i)))).as("g2"),
          k(when(i >= 3, concat_ws(" ", element_at(col("t"), i - 2),
            element_at(col("t"), i - 1), element_at(col("t"), i)))).as("g3"),
          k(when(i >= 2, element_at(col("t"), i - 1))).as("p2"),
          k(when(i >= 3, concat_ws(" ", element_at(col("t"), i - 2),
            element_at(col("t"), i - 1)))).as("p3")))).as("g"))
      .select(col("__id"), col("n"), col("g.w1"), col("g.g2"), col("g.g3"),
        col("g.p2"), col("g.p3"))

    val scored = pos
      .join(order(3, "m_g3", "c3"), col("g3") === col("m_g3"), "left")
      .join(order(2, "m_g2", "c2"), col("g2") === col("m_g2"), "left")
      .join(order(2, "m_p3", "cp3"), col("p3") === col("m_p3"), "left")
      .join(order(1, "m_w1", "c1"), col("w1") === col("m_w1"), "left")
      .join(order(1, "m_p2", "cp2"), col("p2") === col("m_p2"), "left")
      .withColumn("floor1",
        (coalesce(col("c1"), lit(0L)) + 1).cast("double") /
          lit(nTotal + vocab))
      // α multiplies only on an ACTUAL backoff step: position i starts
      // at its highest available order (g3 null ⇔ i<3, g2 null ⇔ i=1)
      .withColumn("s",
        when(col("c3").isNotNull, col("c3").cast("double") / col("cp3"))
          .when(col("c2").isNotNull,
            when(col("g3").isNotNull, lit(alpha)).otherwise(lit(1.0)) *
              col("c2").cast("double") / col("cp2"))
          .otherwise(
            when(col("g3").isNotNull, lit(alpha * alpha))
              .when(col("g2").isNotNull, lit(alpha)).otherwise(lit(1.0)) *
              col("floor1")))
      .groupBy("__id")
      .agg(first_value(col("n")).as("n_tokens"),
        (-sum(log(col("s"))) / first_value(col("n"))).as("ce_raw"))

    docs.select(col(idCol)).join(scored, col(idCol) === col("__id"), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0)).cast("int").as("n_tokens"),
        round(col("ce_raw"), 4).as("backoff_ce"))
  }

  /**
   * Per-document mean negative log probability under INTERPOLATED
   * KNESER-NEY smoothing (Chen & Goodman 1998, "An Empirical Study of
   * Smoothing Techniques for Language Modeling" — the quality smoothing
   * stupid backoff trades against at web scale; Brants 2007 §1 frames
   * exactly this trade). Works off the same [[trainNgramLM]] trigram
   * model: all continuation-count tables are plain aggregations over
   * the gram TYPE tables, so the whole scorer stays SQL-replicable.
   *
   *   P(w|uv) = max(c(uvw)−D,0)/c(uv) + D·N1+(uv•)/c(uv) · P(w|v)
   *   P(w|v)  = max(N1+(•vw)−D,0)/N1+(•v•)
   *           + D·|{w′: N1+(•vw′)>0}|/N1+(•v•) · Pc(w)
   *   Pc(w)   = (N1+(•w)+1)/(B+V)   [add-one on the continuation
   *             distribution — the one deviation from the paper, which
   *             leaves OOV mass undefined; same role as the backoff
   *             scorer's Laplace floor]
   *
   * with D the absolute discount, N1+ type counts from the trigram/
   * bigram tables, B = bigram types, V = unigram types. Leading
   * positions start at their highest available order; a context that
   * was never CONTINUED (c(uv)>0 but no trigram starts uvw, or
   * N1+(•v•)=0) backs off an order rather than scoring zero.
   * `kn_ce = -(1/n)·Σ ln P` (4dp); empty docs score NULL.
   *
   * Scale shape: the derived tables are aggregations OVER THE MODEL
   * (O(gram types), not corpus size); scoring is the same (id, short
   * key) equi-join frame as the other scorers. `hashedKeys` hashes the
   * join keys to 8 bytes on both sides AFTER the structural
   * prefix/suffix extraction (KN needs gram structure, so the model
   * itself must be string-keyed; the *joins* need not ship strings).
   */
  def scoreKneserNey(docs: DataFrame, model: DataFrame,
                     idCol: String, textCol: String,
                     discount: Double = 0.75,
                     hashedKeys: Boolean = false): DataFrame = {
    require(discount > 0 && discount < 1, s"discount $discount not in (0,1)")
    val m = model.lineageCut()
    def jk(c: Column) = if (hashedKeys) hkey(c) else c
    val g3types = m.where(col("n") === 3).select(col("gram"), col("cnt"))
    val g2types = m.where(col("n") === 2).select(col("gram"), col("cnt"))
    // N1+(uv•): distinct trigram types per 2-token prefix
    val p12 = g3types.groupBy(substring_index(col("gram"), " ", 2).as("k"))
      .agg(count(lit(1)).as("np")).select(jk(col("k")).as("k_np"), col("np"))
    // N1+(•vw): distinct trigram types per 2-token suffix (the
    // continuation count of bigram vw) — keep the string key long
    // enough to derive the two tables below, hash only at the join
    val c23str = g3types
      .groupBy(substring_index(col("gram"), " ", -2).as("k"))
      .agg(count(lit(1)).as("c23")).lineageCut()
    val c23 = c23str.select(jk(col("k")).as("k_c23"), col("c23"))
    // N1+(•v•): trigram types per middle token
    val nmid = g3types
      .groupBy(element_at(split(col("gram"), " "), 2).as("k"))
      .agg(count(lit(1)).as("nm")).select(jk(col("k")).as("k_nm"), col("nm"))
    // |{w′: N1+(•vw′)>0}|: distinct continued-bigram types per v —
    // derived from the suffix table, not the corpus
    val vstart = c23str
      .groupBy(substring_index(col("k"), " ", 1).as("k"))
      .agg(count(lit(1)).as("vs")).select(jk(col("k")).as("k_vs"), col("vs"))
    // N1+(•w): distinct bigram types ending in w
    val contw = g2types
      .groupBy(substring_index(col("gram"), " ", -1).as("k"))
      .agg(count(lit(1)).as("cw")).select(jk(col("k")).as("k_cw"), col("cw"))
    val Array(vocab, btypes) = m
      .agg(count(when(col("n") === 1, 1)).cast("double"),
        count(when(col("n") === 2, 1)).cast("double"))
      .collect()(0).toSeq.map(v => Option(v).fold(0.0)(_.asInstanceOf[Double]))
      .toArray
    require(vocab > 0,
      "scoreKneserNey: the model has no unigram rows — the training " +
        "corpus was empty or all-whitespace; train on a non-empty slice")

    // fanned out for the same single-split reason as the backoff scorer
    val base = graft.core.LineageCut.cutFanout(
      docs.select(col(idCol).as("__id"), toks(col(textCol)).as("t")))
      .withColumn("n", size(col("t")))
    // per-position frame: same shape as the stupid-backoff scorer
    // (w1/g2/g3/p2/p3), with join keys in the model's representation
    val pos = base.where(col("n") >= 1)
      .select(col("__id"), col("n"), explode(transform(
        sequence(lit(1), size(col("t"))), i => struct(
          jk(element_at(col("t"), i)).as("w1"),
          jk(when(i >= 2, concat_ws(" ",
            element_at(col("t"), i - 1), element_at(col("t"), i)))).as("g2"),
          jk(when(i >= 3, concat_ws(" ", element_at(col("t"), i - 2),
            element_at(col("t"), i - 1), element_at(col("t"), i)))).as("g3"),
          jk(when(i >= 2, element_at(col("t"), i - 1))).as("p2"),
          jk(when(i >= 3, concat_ws(" ", element_at(col("t"), i - 2),
            element_at(col("t"), i - 1)))).as("p3")))).as("g"))
      .select(col("__id"), col("n"), col("g.w1"), col("g.g2"), col("g.g3"),
        col("g.p2"), col("g.p3"))

    val d = lit(discount)
    val scored = pos
      .join(m.where(col("n") === 3).select(jk(col("gram")).as("m_g3"),
        col("cnt").as("c3")), col("g3") === col("m_g3"), "left")
      .join(m.where(col("n") === 2).select(jk(col("gram")).as("m_p3"),
        col("cnt").as("cp3")), col("p3") === col("m_p3"), "left")
      .join(p12, col("p3") === col("k_np"), "left")
      .join(c23, col("g2") === col("k_c23"), "left")
      .join(nmid, col("p2") === col("k_nm"), "left")
      .join(vstart, col("p2") === col("k_vs"), "left")
      .join(contw, col("w1") === col("k_cw"), "left")
      // Pc(w): add-one continuation unigram — always > 0
      .withColumn("pc",
        (coalesce(col("cw"), lit(0L)) + 1).cast("double") /
          lit(btypes + vocab))
      // bigram level P(w|v): defined when v was seen as a trigram
      // middle; else the continuation unigram
      .withColumn("p2lvl",
        when(coalesce(col("nm"), lit(0L)) > 0,
          greatest(coalesce(col("c23"), lit(0L)).cast("double") - d,
            lit(0.0)) / col("nm") +
            d * col("vs") / col("nm") * col("pc"))
          .otherwise(col("pc")))
      // trigram level: defined when the context bigram was seen AND
      // continued at least once; else back off to the bigram level
      .withColumn("p",
        when(col("g3").isNull,
          when(col("g2").isNull, col("pc")).otherwise(col("p2lvl")))
          .otherwise(
            when(coalesce(col("cp3"), lit(0L)) > 0 &&
              coalesce(col("np"), lit(0L)) > 0,
              greatest(coalesce(col("c3"), lit(0L)).cast("double") - d,
                lit(0.0)) / col("cp3") +
                d * col("np") / col("cp3") * col("p2lvl"))
              .otherwise(col("p2lvl"))))
      .groupBy("__id")
      .agg(first_value(col("n")).as("n_tokens"),
        (-sum(log(col("p"))) / first_value(col("n"))).as("ce_raw"))

    docs.select(col(idCol)).join(scored, col(idCol) === col("__id"), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0)).cast("int").as("n_tokens"),
        round(col("ce_raw"), 4).as("kn_ce"))
  }

  /**
   * The CCNet-style filter in one call: train on `trainDocs` (pass the
   * clean slice — or the corpus itself for self-perplexity), score
   * `docs`, and keep documents at or below the given perplexity. Empty
   * documents carry no evidence either way and are kept.
   *
   * Trains with hashed keys (scoring rides the model schema): the filter
   * only compares the score against a ceiling, so the 8-byte shuffle
   * diet is free here — same reasoning as [[backoffFilter]]. The
   * string-keyed path stays directly oracled via `text_perplexity`.
   */
  def perplexityFilter(docs: DataFrame, trainDocs: DataFrame,
                       idCol: String, textCol: String,
                       maxPpl: Double): DataFrame = {
    val model = trainBigramLM(trainDocs, textCol, hashedKeys = true)
    val kept = scorePerplexity(docs, model, idCol, textCol)
      .where(col("ppl").isNull || col("ppl") <= maxPpl)
      .select(col(idCol))
    docs.join(kept, Seq(idCol), "left_semi")
  }

  /**
   * [[perplexityFilter]]'s trigram sibling: train a [[trainNgramLM]]
   * model on `trainDocs` (hashed keys — the filter only compares the
   * score against a ceiling, so the 8-byte shuffle diet is free here),
   * score `docs` with stupid backoff, and keep documents at or below
   * `maxBackoffCe` nats. Empty documents carry no evidence and are kept.
   */
  def backoffFilter(docs: DataFrame, trainDocs: DataFrame,
                    idCol: String, textCol: String,
                    maxBackoffCe: Double): DataFrame = {
    val model = trainNgramLM(trainDocs, textCol, maxOrder = 3,
      hashedKeys = true)
    val kept = scoreStupidBackoff(docs, model, idCol, textCol)
      .where(col("backoff_ce").isNull || col("backoff_ce") <= maxBackoffCe)
      .select(col(idCol))
    docs.join(kept, Seq(idCol), "left_semi")
  }
}
