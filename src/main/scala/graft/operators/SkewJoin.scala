package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-mitigation utilities for the 100 TB path (SURVEY.md §7.4 scale
 * notes). AQE's skew-join handles most cases at runtime
 * (`spark.sql.adaptive.skewJoin.enabled`, on by default); explicit salting
 * remains necessary when one build-side key is hot enough that even a
 * split shuffle partition can't hold it, or when AQE is unavailable
 * (e.g. inside a DSv2 distribution the engine controls).
 */
object SkewJoin {

  /**
   * Salted inner equi-join: the skewed (large, hot-keyed) side gets a
   * random salt ∈ [0, salt); the small side is replicated `salt` times so
   * every (key, salt) bucket finds its match. One hot key thus spreads
   * over `salt` shuffle partitions instead of one straggler.
   *
   * The salt column uses a deterministic per-row hash (not rand()) so
   * retries/speculation reproduce identical placement — the same
   * determinism argument as the sink's attempt-unique staging.
   */
  def saltedJoin(skewed: DataFrame, small: DataFrame, key: String,
                 salt: Int = 16): DataFrame = {
    require(salt > 1, "salt must be > 1")
    // deterministic salt: hash of the whole row modulo salt
    val salted = skewed.withColumn("__salt",
      pmod(hash(skewed.columns.map(col): _*), lit(salt)))
    val replicated = small
      .withColumn("__salt", explode(array((0 until salt).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Top-N heavy-hitter keys with frequencies — the diagnosis step before
    * choosing salt factors (run on a sample at scale). */
  def heavyHitters(df: DataFrame, key: Column, topN: Int = 20): DataFrame =
    df.groupBy(key.as("key")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("key").asc).limit(topN)

  /**
   * Differentially-salted inner equi-join — the detection step folded
   * in: ONE map-side-combined `count_min_sketch` pass over the skewed
   * side (only the ~KB counter table moves) finds keys with ≥
   * `minHeavyCount` rows, and ONLY those rows take the salt machinery;
   * the light majority joins plain. The sketch is one-sided (never
   * undercounts), so no truly-hot key can sneak into the unsalted
   * branch — a few light keys may get salted needlessly, which costs
   * only their replication factor. The small side is replicated
   * `salt`-fold ONLY for its heavy-key rows, not globally — the
   * full-salting tax [[saltedJoin]] pays on every row.
   *
   * Keys are probed through `xxhash64`, so any key type works; a hash
   * collision can only ADD a key to the salted branch (one-sided again).
   * Null keys never match an inner join and are dropped by both
   * branches, exactly as the plain join would. Exact: the probe
   * partitions the skewed side, so `adaptive == plain inner join`
   * row for row (spec'd).
   *
   * At 100 TB this is the shape AQE's skew-join approximates at
   * runtime — needed explicitly when one key overflows even a split
   * partition, or where AQE can't reach (fixed DSv2 distributions).
   */
  def adaptiveSaltedJoin(skewed: DataFrame, small: DataFrame, key: String,
                         minHeavyCount: Long, salt: Int = 16,
                         eps: Double = 0.0001, confidence: Double = 0.99,
                         seed: Int = 42): DataFrame = {
    require(minHeavyCount > 0, "minHeavyCount must be positive")
    require(salt > 1, "salt must be > 1")
    val sketchRow = skewed
      .agg(count_min_sketch(xxhash64(col(key)), lit(eps), lit(confidence),
        lit(seed)))
      .head()
    if (sketchRow.isNullAt(0)) return skewed.join(small, Seq(key)) // empty side
    val bytes = sketchRow.getAs[Array[Byte]](0)
    def isHeavy(df: DataFrame): Column =
      org.apache.spark.sql.graft.SketchProbeFunctions.cmsGe(
        xxhash64(df(key)), bytes, minHeavyCount)
    val heavy = skewed.filter(isHeavy(skewed))
    val light = skewed.filter(!isHeavy(skewed)) // null keys drop: inner-join semantics
    val smallHeavy = small.filter(isHeavy(small))
    saltedJoin(heavy, smallHeavy, key, salt)
      .unionByName(light.join(small, Seq(key)))
  }
}
