package graft.core

/**
 * Shard-routing model for the offline index builder.
 *
 * Mirrors the reference's routing surface (reference:
 * src/main/java/com/simondata/elasticfreight/index/routing/
 * ElasticsearchRoutingStrategy.java:12-17 — pluggable, versioned,
 * immutable-once-used) re-expressed as an idiomatic Scala trait +
 * case classes instead of Hadoop-Configuration-driven subclasses.
 */
trait RoutingStrategy extends Serializable {
  def numShards: Int
  /** Routing string handed to the index sink for a document id. */
  def routingFor(docId: String): String
  /** Candidate routing values to search for a given id (targeted search). */
  def possibleRoutings(docId: String): Array[String]
  /** Shard index ∈ [0, numShards) for a document id. */
  def shardFor(docId: String): Int
}

/**
 * V5 strategy: shard = floorMod(esMurmur3(docId), numShards); the routing
 * string is the murmur3 hash of the *shard number's decimal string*, a
 * deterministic value that ES 5.x re-hashes back onto that same shard.
 * (reference: ElasticsearchRoutingStrategyV5.java:46-55 builds the
 * shard→routing table; :91-95 getRoutingHash; :105-113
 * getPossibleRoutingHashes — a 1-element candidate set.)
 *
 * DO-NOT-CHANGE note from the reference applies: once indexes exist, the
 * mapping is frozen; evolve by adding a new versioned strategy.
 */
final case class RoutingStrategyV5(numShards: Int) extends RoutingStrategy {
  require(numShards > 0, s"numShards must be positive, got $numShards")

  /** shard index → routing string (murmur3 of the shard's decimal form).
    * Built eagerly and deterministically; tiny (numShards entries) so it
    * ships inside task closures for free. */
  val shardToRouting: Map[Int, String] =
    (0 until numShards).map(s => s -> EsMurmur3.hash(s.toString).toString).toMap

  override def shardFor(docId: String): Int = EsMurmur3.shard(docId, numShards)

  override def routingFor(docId: String): String = shardToRouting(shardFor(docId))

  override def possibleRoutings(docId: String): Array[String] =
    Array(shardToRouting(shardFor(docId)))
}

/**
 * Per-index shard-count topology with a default
 * (reference: src/main/java/com/simondata/elasticfreight/ShardConfig.java:13-38).
 */
final case class ShardConfig(defaultShards: Int = 5,
                             perIndex: Map[String, Int] = Map.empty)
    extends Serializable {
  def shardsFor(index: String): Int = perIndex.getOrElse(index, defaultShards)
}

/**
 * The typed envelope a document travels in — replaces the reference's
 * string-packed `index|docId|json` Text values
 * (reference: src/main/java/com/simondata/example/IndexingMapperImpl.java:55-57,
 * BaseESReducer.java:274-282) with real columns so Tungsten handles layout
 * and no split/re-join is ever needed.
 */
final case class IndexableDoc(index: String, docId: String, routing: String,
                              shard: Int, json: String)

/** One sink output line per populated shard
  * (reference: BaseESReducer.java:317-319 `index|snapshotUUID|indexId`). */
final case class ManifestEntry(index: String, shard: Int, snapshotUuid: String,
                               indexId: String, docCount: Long)
