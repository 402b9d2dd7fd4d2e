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
}
