package graft.operators

import graft.SparkTestBase

class SessionPathsSpec extends SparkTestBase {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, Long, Long, String)], k: Int,
      topK: Int) =
    SessionPaths.topPaths(rows.toDF("u", "day", "ts", "tie", "et"),
        "u", "day", "ts", "tie", "et", k, topK)
      .as[(String, Long)].collect().toSeq

  test("prefix is ordered by (ts, tie), truncated at k") {
    val rows = Seq(
      (1L, 0L, 30L, 1L, "c"), (1L, 0L, 10L, 2L, "a"), (1L, 0L, 20L, 3L, "b"),
      (1L, 0L, 40L, 4L, "d"))
    assert(run(rows, 3, 10) == Seq(("a>b>c", 1L)))
  }

  test("timestamp ties break on the tie column") {
    val rows = Seq((1L, 0L, 10L, 2L, "b"), (1L, 0L, 10L, 1L, "a"))
    assert(run(rows, 2, 10) == Seq(("a>b", 1L)))
  }

  test("groups shorter than k keep their full path") {
    val rows = Seq((1L, 0L, 1L, 1L, "x"))
    assert(run(rows, 3, 10) == Seq(("x", 1L)))
  }

  test("counts aggregate across entity-days; order n desc then path") {
    val rows = Seq(
      (1L, 0L, 1L, 1L, "a"), (1L, 0L, 2L, 2L, "b"),
      (2L, 0L, 1L, 3L, "a"), (2L, 0L, 2L, 4L, "b"),
      (1L, 1L, 1L, 5L, "z"))
    assert(run(rows, 2, 10) == Seq(("a>b", 2L), ("z", 1L)))
  }

  test("same user on different days forms separate paths") {
    val rows = Seq((1L, 0L, 1L, 1L, "a"), (1L, 1L, 1L, 2L, "a"))
    assert(run(rows, 1, 10) == Seq(("a", 2L)))
  }

  test("topK truncates deterministically on the (n, path) order") {
    val rows = Seq(
      (1L, 0L, 1L, 1L, "b"), (2L, 0L, 1L, 2L, "a"), (3L, 0L, 1L, 3L, "c"))
    assert(run(rows, 1, 2) == Seq(("a", 1L), ("b", 1L)))
  }
}
