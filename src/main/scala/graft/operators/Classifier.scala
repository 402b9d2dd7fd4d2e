package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.LineageCut._

/**
 * Trained quality classifier (mission extension, SURVEY.md §7.4) — the
 * supervised half of the CCNet/GPT-3 data-quality recipe: alongside the
 * perplexity gate ([[LangModel]]), web-corpus pipelines train a
 * fastText-style linear classifier on "looks like the target domain"
 * vs "random crawl" and keep documents the classifier favors
 * (Joulin et al. 2016, "Bag of Tricks for Efficient Text
 * Classification"; Brown et al. 2020 §A). This is the multinomial
 * Naive-Bayes member of that family — log-linear in bag-of-n-gram
 * features like fastText, with closed-form count-based training, so
 * both training and scoring are pure aggregations + key-only joins
 * (and therefore exactly SQL-replicable):
 *
 *   score(d) = ln P(pos)/P(neg)
 *            + Σ_f [ ln (c(f,pos)+1)/(N_pos+V) − ln (c(f,neg)+1)/(N_neg+V) ]
 *
 * over word n-gram features f of orders 1..ngramOrder (fastText's
 * `wordNgrams`), Laplace-smoothed per class.
 *
 * Scale shape: feature construction is map-side array work over the
 * token array (no window, no shuffle); training is ONE hash aggregation
 * keyed by feature; scoring ships (id, feature) pairs — never document
 * text — through one equi-join against the model. `hashedKeys = true`
 * is fastText's hashing trick made explicit: features are keyed by
 * `xxhash64` (8 bytes) from the training agg onward, so no shuffle
 * ever carries a feature string; a collision merges two features'
 * counts — a score perturbation (~1e-19 per pair), not a correctness
 * event — and the scorer autodetects the mode from the model schema.
 */
object Classifier {

  /** The corpus-standard tokenizer — [[LangModel.toks]] shared directly
    * (one definition), so LM gates and classifier cuts compose over the
    * same token stream by construction. */
  private def toks(text: Column): Column = LangModel.toks(text)

  /** Space-joined k-grams via the shared [[LangModel.grams]] builder
    * (the `when` guards `sequence`'s descent when size < k). */
  private def gramsOfOrder(t: Column, k: Int): Column =
    when(size(t) >= k, LangModel.grams(t, k))
      .otherwise(array().cast("array<string>"))

  /** All features of orders 1..ngramOrder as one flat array. */
  private def allFeatures(t: Column, ngramOrder: Int): Column =
    flatten(array((1 to ngramOrder).map(k => gramsOfOrder(t, k)): _*))

  /**
   * A trained model: per-feature class counts (`feat`|`feath`,
   * `cnt_pos`, `cnt_neg` — lineage-cut so repeated scoring never
   * re-runs training), the Laplace constants, and the class priors.
   */
  final case class NaiveBayesModel private[Classifier] (
      features: DataFrame, vocab: Double, nPos: Double, nNeg: Double,
      posDocs: Long, negDocs: Long, ngramOrder: Int, hashed: Boolean) {
    /** ln P(pos)/P(neg) — the empty-document score. */
    def priorLogOdds: Double = math.log(posDocs.toDouble / negDocs)
  }

  /**
   * Train on a labeled frame (`labelCol` boolean: true = target class;
   * must be NON-NULL — a NULL label counts toward neither class prior,
   * silently skewing ln P(pos)/P(neg), so coalesce upstream). One
   * corpus scan: every order's grams ride one exploded array into a
   * single feature-keyed aggregation with two conditional sums. Both
   * classes must be non-empty — a one-class "model" would score +/-Inf
   * everywhere and silently pass or drop the whole corpus downstream.
   */
  def trainNaiveBayes(docs: DataFrame, labelCol: String, textCol: String,
                      ngramOrder: Int = 2,
                      hashedKeys: Boolean = false): NaiveBayesModel = {
    require(ngramOrder >= 1 && ngramOrder <= 5,
      s"ngramOrder $ngramOrder not in 1..5")
    val keyName = if (hashedKeys) "feath" else "feat"
    def key(c: Column) = if (hashedKeys) xxhash64(c) else c
    val base = docs.select(col(labelCol).as("__y"),
      toks(col(textCol)).as("t"))
    val features = base.where(size(col("t")) > 0)
      .select(col("__y"), explode(allFeatures(col("t"), ngramOrder)).as("f"))
      .groupBy(key(col("f")).as(keyName))
      .agg(sum(when(col("__y"), 1L).otherwise(0L)).as("cnt_pos"),
        sum(when(!col("__y"), 1L).otherwise(0L)).as("cnt_neg"))
      .lineageCut()
    val Array(vocab, nPos, nNeg) = features
      .agg(count(lit(1)).cast("double"),
        sum("cnt_pos").cast("double"), sum("cnt_neg").cast("double"))
      .collect()(0).toSeq.map(v => Option(v).fold(0.0)(_.asInstanceOf[Double]))
      .toArray
    val Array(posDocs, negDocs) = docs
      .agg(sum(when(col(labelCol), 1L).otherwise(0L)),
        sum(when(!col(labelCol), 1L).otherwise(0L)))
      .collect()(0).toSeq.map(v => Option(v).fold(0L)(_.asInstanceOf[Long]))
      .toArray
    require(posDocs > 0 && negDocs > 0,
      s"trainNaiveBayes: both classes must be non-empty " +
        s"(pos=$posDocs, neg=$negDocs) — a one-class model scores " +
        "every document +/-Inf")
    NaiveBayesModel(features, vocab, nPos, nNeg, posDocs, negDocs,
      ngramOrder, hashedKeys)
  }

  /**
   * Score documents: `(idCol, n_feats, logodds)` with `logodds` the NB
   * log-odds (4dp) — positive favors the target class. Documents with
   * no features score the prior log-odds with `n_feats` 0 (no token
   * evidence either way). The scoring frame carries (id, feature key)
   * only; one left equi-join against the model.
   */
  def scoreLogOdds(docs: DataFrame, model: NaiveBayesModel,
                   idCol: String, textCol: String): DataFrame = {
    def key(c: Column) = if (model.hashed) xxhash64(c) else c
    val keyName = if (model.hashed) "feath" else "feat"
    val perFeat = docs
      .select(col(idCol).as("__id"), toks(col(textCol)).as("t"))
      .where(size(col("t")) > 0)
      .select(col("__id"),
        explode(allFeatures(col("t"), model.ngramOrder)).as("f"))
      .select(col("__id"), key(col("f")).as("__k"))
      .join(model.features, col("__k") === col(keyName), "left")
      .withColumn("lr",
        log((coalesce(col("cnt_pos"), lit(0L)) + 1).cast("double") /
          lit(model.nPos + model.vocab)) -
          log((coalesce(col("cnt_neg"), lit(0L)) + 1).cast("double") /
            lit(model.nNeg + model.vocab)))
      .groupBy("__id")
      .agg(count(lit(1)).as("n_feats"), sum("lr").as("slr"))
    docs.select(col(idCol)).join(perFeat, col(idCol) === col("__id"), "left")
      .select(col(idCol),
        coalesce(col("n_feats"), lit(0L)).cast("int").as("n_feats"),
        round(lit(model.priorLogOdds) + coalesce(col("slr"), lit(0.0)), 4)
          .as("logodds"))
  }

  /**
   * The CCNet-style quality cut in one call: label `docs` by membership
   * in `target` (the "looks like this" exemplar set — Wikipedia in
   * CCNet, WebText in GPT-3), train NB on that labeling, and keep
   * documents scoring at or above `minLogOdds`. Featureless documents
   * score the prior, so with a negative-prior corpus (target is a small
   * slice) they are dropped unless `minLogOdds` admits the prior —
   * match the perplexity gate's keep-empty policy by composing on
   * `n_feats > 0` upstream if needed.
   */
  def classifierFilter(docs: DataFrame, target: DataFrame,
                       idCol: String, textCol: String,
                       minLogOdds: Double,
                       ngramOrder: Int = 2,
                       hashedKeys: Boolean = false): DataFrame = {
    val labeled = docs.join(
      target.select(col(idCol)).distinct().withColumn("__pos", lit(true)),
      Seq(idCol), "left")
      .withColumn("__y", coalesce(col("__pos"), lit(false)))
    val model = trainNaiveBayes(labeled, "__y", textCol, ngramOrder,
      hashedKeys)
    val kept = scoreLogOdds(docs, model, idCol, textCol)
      .where(col("logodds") >= minLogOdds)
      .select(col(idCol))
    docs.join(kept, Seq(idCol), "left_semi")
  }
}
