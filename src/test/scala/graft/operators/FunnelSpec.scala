package graft.operators

import graft.SparkTestBase

class FunnelSpec extends SparkTestBase {
  import spark.implicits._

  private val stages = Seq("view", "click", "buy")
  private def run(rows: Seq[(Long, Long, String)]) =
    Funnel.stageTimes(rows.toDF("u", "ms", "et"), "u", "ms", "et", stages, windowMs = 100L)
      .as[(Long, Long, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("strict ordering, window boundaries, first-touch anchoring") {
    val out = run(Seq(
      // u1: clean conversion; click at the exact window edge counts (<=)
      (1L, 10L, "view"), (1L, 110L, "click"), (1L, 150L, "buy"),
      // u2: click at the SAME ms as the view is not strictly after
      (2L, 10L, "view"), (2L, 10L, "click"),
      // u3: click one past the window edge
      (3L, 10L, "view"), (3L, 111L, "click"),
      // u4: click BEFORE the first view never counts
      (4L, 5L, "click"), (4L, 10L, "view"),
      // u5: first-touch — the first view's window has no click; the
      // later view is not re-anchored
      (5L, 10L, "view"), (5L, 500L, "view"), (5L, 550L, "click"),
      // u6: no view at all → no row
      (6L, 10L, "click"), (6L, 20L, "buy"),
      // u7: multiple qualifying clicks → FIRST one anchors the buy window
      (7L, 10L, "view"), (7L, 20L, "click"), (7L, 90L, "click"), (7L, 121L, "buy")
    ))
    assert(out(1L) == ((10L, Some(110L), Some(150L))))
    assert(out(2L) == ((10L, None, None)))
    assert(out(3L) == ((10L, None, None)))
    assert(out(4L) == ((10L, None, None)))
    assert(out(5L) == ((10L, None, None)))
    assert(!out.contains(6L))
    // buy at 121 is outside click@20's window (20+100=120) — drop-out
    assert(out(7L) == ((10L, Some(20L), None)))
  }

  test("counts are monotone and ignore drop-outs") {
    val counts = Funnel.counts(Seq(
        (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "buy"),
        (2L, 10L, "view"), (2L, 20L, "click"),
        (3L, 10L, "view")
      ).toDF("u", "ms", "et"), "u", "ms", "et", stages, windowMs = 100L)
      .as[(Long, Long, Long)].head()
    assert(counts == ((3L, 2L, 1L)))
  }

  test("reserved names and degenerate stage lists are rejected") {
    val df = Seq((1L, 10L, "view")).toDF("u", "ms", "et")
    intercept[IllegalArgumentException] {
      Funnel.stageTimes(df, "u", "ms", "et", Seq("view"), 100L)
    }
    intercept[IllegalArgumentException] {
      Funnel.stageTimes(df, "u", "ms", "et", Seq("view", "view"), 100L)
    }
    intercept[IllegalArgumentException] {
      Funnel.stageTimes(df.withColumnRenamed("ms", "t1"), "u", "t1", "et", stages, 100L)
    }
  }
}
