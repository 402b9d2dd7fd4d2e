package graft.operators

import graft.SparkSpec

/** First-touch funnel: pinned against hand-traced chains, including the
  * cases that distinguish the convention — strictly-after ordering,
  * window anchoring at the FIRST stage-1 event, and out-of-order
  * events that must not count. */
class FunnelSpec extends SparkSpec {

  import spark.implicits._

  test("firstTouch: hand-traced chains, window anchored at first touch") {
    val ev = Seq(
      // u1 completes all three: view@10, click@20, buy@30
      (1L, "view", 10L), (1L, "click", 20L), (1L, "buy", 30L),
      // u2: click BEFORE the first view never counts; no click after
      (2L, "click", 5L), (2L, "view", 10L),
      // u3: completes view+click; buy lands outside the window from t1
      (3L, "view", 10L), (3L, "click", 15L), (3L, "buy", 200L),
      // u4: second view would fit the window, but t1 anchors at the
      // FIRST view — click at 25 fits (t1=10, window 100), buy missing
      (4L, "view", 10L), (4L, "view", 90L), (4L, "click", 25L),
      // u5: never views
      (5L, "click", 10L), (5L, "buy", 20L)
    ).toDF("user_id", "event_type", "ts")
    val got = Funnel.firstTouch(ev, "user_id", "event_type", "ts",
        Seq("view", "click", "buy"), windowNs = 100L)
      .as[(Int, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got === Seq((1, "view", 4L), (2, "click", 3L), (3, "buy", 1L)))
  }

  test("firstTouch: strictly-after chaining and guards") {
    // simultaneous view+click: click at the SAME ts as view is not
    // strictly after, a later one is
    val ev = Seq((1L, "view", 10L), (1L, "click", 10L), (1L, "click", 11L),
      (2L, "view", 10L), (2L, "click", 10L))
      .toDF("user_id", "event_type", "ts")
    val got = Funnel.firstTouch(ev, "user_id", "event_type", "ts",
        Seq("view", "click"), windowNs = 50L)
      .as[(Int, String, Long)].collect()
      .map { case (s, _, u) => s -> u }.toMap
    assert(got === Map(1 -> 2L, 2 -> 1L))
    intercept[IllegalArgumentException] {
      Funnel.firstTouch(ev, "user_id", "event_type", "ts",
        Seq("view", "view"), 10L)
    }
    intercept[IllegalArgumentException] {
      Funnel.firstTouch(ev, "user_id", "event_type", "ts", Seq("view"), 0L)
    }
  }
}
