package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over embedding columns (mission extension, SURVEY.md
 * §7.4): brute-force cosine top-k as the exact baseline, LSH-bucketed ANN
 * as the 100 TB scale path.
 *
 * All arithmetic in double (floats widened per element) with left-to-right
 * `aggregate` folds — deterministic and engine-comparable.
 */
object Similarity {

  /** dot(a, b) over array<float/double> columns via zip_with + aggregate
    * (codegen'd higher-order functions, no UDF). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))

  /** Cosine similarity — native codegen'd expression (the zip_with/
    * aggregate composition above is CodegenFallback: interpreted lambdas,
    * ~1000× slower per pair; keep HOF forms for ad-hoc column math only). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.Vectors.cosineSim(a, b)

  /**
   * Exact top-k neighbors for each query vector, brute force.
   * The query set is broadcast (small side); the corpus streams through
   * one pass — no shuffle of the corpus at all; the only shuffle is the
   * per-query top-k (k rows per query per partition after partial rank
   * pruning is not available for windows, so this ranks post-join; for
   * large corpora prefer [[lshTopK]]).
   *
   * Ties break deterministically by corpus id.
   */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     queryIdCol: String = "query_id"): DataFrame = {
    val c = corpus.select(col(idCol).as("nn_id"), col(vecCol).as("cvec"))
    val q = queries.select(col(queryIdCol), col(vecCol).as("qvec"))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("cosine", round(cosine(col("cvec"), col("qvec")), 6))
    val w = Window.partitionBy(queryIdCol)
      .orderBy(col("cosine").desc, col("nn_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col("rank"), col("nn_id"), col("cosine"))
  }

  /**
   * ANN top-k via random-hyperplane LSH: corpus and queries are bucketed
   * by `numPlanes`-bit signatures; each query is probed in its own bucket
   * plus all 1-bit-flip neighbor buckets (multi-probe), then exact cosine
   * ranks the candidates. Recall rises with fewer planes / more probes;
   * cost falls with more planes.
   *
   * At scale: candidate join is an equi-join on the signature — shuffle
   * keys are 64-bit longs, corpus never cross-joins.
   */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              numPlanes: Int = 12, seed: Long = 42,
              idCol: String = "vec_id", vecCol: String = "embedding",
              queryIdCol: String = "query_id"): DataFrame = {
    val sig = (v: Column) => graft.functions.Vectors.hyperplaneSig(v, numPlanes, seed)
    val c = corpus.select(col(idCol).as("nn_id"), col(vecCol).as("cvec"),
      sig(col(vecCol)).as("bucket"))
    // multi-probe: original signature + every 1-bit flip
    val probes = array((0 to numPlanes).map {
      case 0 => sig(col(vecCol))
      case i => sig(col(vecCol)).bitwiseXOR(lit(1L << (i - 1)))
    }: _*)
    val q = queries.select(col(queryIdCol), col(vecCol).as("qvec"),
        explode(probes).as("bucket"))
    val scored = c.join(q, "bucket")
      .withColumn("cosine", round(cosine(col("cvec"), col("qvec")), 6))
      .groupBy(col(queryIdCol), col("nn_id"))
      .agg(max("cosine").as("cosine")) // dedupe multi-probe hits
    val w = Window.partitionBy(queryIdCol)
      .orderBy(col("cosine").desc, col("nn_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col("rank"), col("nn_id"), col("cosine"))
  }

  /**
   * Embedding-cosine near-duplicate pairs above `threshold` (exact,
   * blocked). `blockExpr` bounds the join fan-out (e.g. an LSH bucket or
   * a metadata key); pass `lit(0)` only for small/test corpora.
   */
  def cosinePairs(df: DataFrame, threshold: Double, blockExpr: Column,
                  idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(vecCol).as("vec"),
      blockExpr.as("block"))
    v.as("a").join(v.as("b"),
        col("a.block") === col("b.block") && col("a.id") < col("b.id"))
      .withColumn("cosine", round(cosine(col("a.vec"), col("b.vec")), 6))
      .filter(col("cosine") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("cosine"))
  }

  /** LSH-blocked cosine near-dup pairs — the scale path for
    * embedding dedup: candidates only within (multi-probed) buckets. */
  def lshCosinePairs(df: DataFrame, threshold: Double, numPlanes: Int = 12,
                     seed: Long = 42, idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val sig = graft.functions.Vectors.hyperplaneSig(col(vecCol), numPlanes, seed)
    val probes = array((0 to numPlanes).map {
      case 0 => sig
      case i => sig.bitwiseXOR(lit(1L << (i - 1)))
    }: _*)
    val v = df.select(col(idCol).as("id"), col(vecCol).as("vec"), sig.as("sig0"),
      explode(probes).as("bucket"))
    v.as("a").join(v.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .withColumn("cosine", round(cosine(col("a.vec"), col("b.vec")), 6))
      .filter(col("cosine") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("cosine"))
      .distinct()
  }
}
