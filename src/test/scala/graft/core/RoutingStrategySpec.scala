package graft.core

import org.scalatest.funsuite.AnyFunSuite

/**
 * Verbatim port of the reference's only test class (reference:
 * src/test/java/com/simondata/elasticfreight/ElasticsearchRoutingStrategyV5Test.java)
 * — same fixed UUID fixtures, same four invariants at numShards ∈ {1, 5, 10}.
 */
class RoutingStrategySpec extends AnyFunSuite {

  val orgIds: Seq[String] = Seq(
    "ed1121bf-5e61-4ac5-ad99-c24f8c4f79db",
    "b8864a7e-98d9-4bef-af1e-54c8bea7ae40",
    "decccc4f-2c96-4f4c-890f-eb1433ff4c90",
    "1650943b-b125-41cf-9729-3bd3e164da16",
    "005a22cc-afbb-4bbe-97e9-6f1447293ed7",
    "e29469e1-02a1-4d63-91ef-40affca740a8",
    "400cdb2f-7573-444e-9612-e218ff1c8387",
    "aec66b84-6c34-466b-8991-031cba01241b",
    "53adf13e-ce20-4112-9809-6aa29c60dfa5",
    "f7f8ff19-81bf-49b1-a896-e996674d5a1f",
    "2eb8db9f-d3ae-4d9a-ac78-55cb792e0d2d",
    "3b984743-49bd-47d9-b38f-da3f822db03a",
    "b68edfd1-305f-4d31-9443-605ba05eb5cc",
    "0c8ce21d-3bb5-4dab-9531-1e2f3320259e",
    "254f6bec-8b3d-48d2-976a-ba4a3517558b",
  )

  val convIds: Seq[String] = Seq(
    "0a3fe8fa-0291-4a28-87c7-2eeeda2295cd",
    "38b261be-23c4-4fe6-846c-f06231ddf82f",
    "3e4602bb-9c72-4174-b29f-b72dee356716",
    "3ff398ac-b832-4085-9ba3-0d2756c03f21",
    "8773bd12-3fdc-452f-b440-60bee40fadfc",
    "a0f20cbe-19a4-4aff-833d-c0919d6cfe73",
    "de48d484-23ce-4e0d-b465-de91b2f6ad72",
    "be57d96e-7ee8-4bba-bc35-15e347b69bed",
    "7cb1b182-b64a-4815-bc61-87714dbd0431",
    "8b9bbfbc-34dc-45f4-8dee-d82a44fc9995",
    "60ecef71-0a30-4798-aae7-63f6c1df0cf0",
    "64d0431b-bb68-4045-8fff-5ae2ed4eed51",
    "2e8df74f-3536-4044-aa13-1c1b273ab29f",
  )

  private def oneRoutingPerOrg(numShards: Int): Unit = {
    val strategy = RoutingStrategyV5(numShards)
    orgIds.foreach { orgId =>
      val routings = convIds.map(_ => strategy.routingFor(orgId)).toSet
      assert(routings.size === 1, s"org $orgId spread over ${routings.size} routings")
      val possible = strategy.possibleRoutings(orgId)
      assert(possible.length === 1)
      possible.foreach(p => assert(routings.contains(p)))
    }
  }

  test("org on 10-shard index: one routing hash per org")(oneRoutingPerOrg(10))
  test("org on 5-shard index: one routing hash per org")(oneRoutingPerOrg(5))

  test("single-shard index: all orgs share one routing hash") {
    val strategy = RoutingStrategyV5(1)
    val routings =
      (for (o <- orgIds; _ <- convIds) yield strategy.routingFor(o)).toSet
    assert(routings.size === 1)
  }

  test("15 orgs over 5 shards cover all 5 shards") {
    val strategy = RoutingStrategyV5(5)
    val routings = orgIds.map(strategy.routingFor).toSet
    assert(routings.size === 5)
  }

  test("routing string is the hash of the shard's decimal form") {
    val strategy = RoutingStrategyV5(5)
    orgIds.foreach { o =>
      val shard = strategy.shardFor(o)
      assert(strategy.routingFor(o) === EsMurmur3.hash(shard.toString).toString)
    }
  }

  test("ShardConfig per-index override with default") {
    val cfg = ShardConfig(defaultShards = 5, perIndex = Map("big" -> 64))
    assert(cfg.shardsFor("big") === 64)
    assert(cfg.shardsFor("anything-else") === 5)
  }
}
