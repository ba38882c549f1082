package graft.operators

import graft.SparkTestBase

class WindowDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def run(rows: Seq[(Long, String, Long, Long)], windowMs: Long) =
    WindowDedup.dupStats(rows.toDF("u", "t", "ms", "id"),
        "u", "t", "ms", "id", windowMs)
      .select("t", "n_events", "n_dups", "dup_ppm")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap

  test("an event within the window of its same-key predecessor is a dup") {
    val got = run(Seq((1L, "a", 0L, 1L), (1L, "a", 500L, 2L)), 1000L)
    assert(got("a") == (("a", 2L, 1L, 500000L)))
  }

  test("the window boundary is inclusive; one past it is clean") {
    assert(run(Seq((1L, "a", 0L, 1L), (1L, "a", 1000L, 2L)), 1000L)("a")._3 == 1L)
    assert(run(Seq((1L, "a", 0L, 1L), (1L, "a", 1001L, 2L)), 1000L)("a")._3 == 0L)
  }

  test("chains count per-predecessor: three events 1s apart = two dups") {
    val got = run(Seq((1L, "a", 0L, 1L), (1L, "a", 1000L, 2L),
      (1L, "a", 2000L, 3L)), 1000L)
    assert(got("a")._3 == 2L)
  }

  test("different users or types never shadow each other") {
    val got = run(Seq(
      (1L, "a", 0L, 1L), (2L, "a", 100L, 2L),   // other user
      (1L, "b", 150L, 3L)), 1000L)               // other type
    assert(got("a")._3 == 0L && got("b")._3 == 0L)
  }

  test("equal timestamps tie-break on the id column and still flag") {
    val got = run(Seq((1L, "a", 0L, 2L), (1L, "a", 0L, 1L)), 1000L)
    assert(got("a") == (("a", 2L, 1L, 500000L)))
  }
}
