package graft.operators

import graft.SparkTestBase

class Scd2Spec extends SparkTestBase {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, Long, String)]) =
    Scd2.build(rows.toDF("k", "tie", "ms", "v"), "k", "ms", "v", "tie")
      .as[(Long, String, Long, Option[Long], Long, Boolean)]
      .collect().sortBy(r => (r._1, r._3)).toSeq

  test("runs collapse to intervals; last interval is open and current") {
    val out = run(Seq(
      (1L, 0L, 10L, "a"), (1L, 1L, 20L, "a"), (1L, 2L, 30L, "b"),
      (1L, 3L, 40L, "a"),
      (2L, 4L, 5L, "x")
    ))
    assert(out == Seq(
      (1L, "a", 10L, Some(30L), 2L, false),
      (1L, "b", 30L, Some(40L), 1L, false),
      (1L, "a", 40L, None, 1L, true),
      (2L, "x", 5L, None, 1L, true)
    ))
  }

  test("adjacent intervals tile the key's timeline exactly") {
    val out = run(Seq(
      (7L, 0L, 1L, "a"), (7L, 1L, 2L, "b"), (7L, 2L, 3L, "c"), (7L, 3L, 4L, "b")
    ))
    // every valid_to equals the next interval's valid_from
    out.sliding(2).foreach {
      case Seq(prev, next) => assert(prev._4.contains(next._3))
      case _               =>
    }
    assert(out.last._4.isEmpty && out.last._6)
    assert(out.map(_._2) == Seq("a", "b", "c", "b"))
  }

  test("same-ms events break ties on the tiebreak column") {
    val out = run(Seq((1L, 2L, 10L, "b"), (1L, 1L, 10L, "a")))
    // tie=1 ("a") sorts first, so "a" opens and "b" closes it at ms=10
    assert(out.map(r => (r._2, r._3, r._4)) ==
      Seq(("a", 10L, Some(10L)), ("b", 10L, None)))
  }

  test("null values form runs under null-safe comparison") {
    val df = Seq(
      (1L, 0L, 10L, Some("a")), (1L, 1L, 20L, None),
      (1L, 2L, 30L, None), (1L, 3L, 40L, "a".some)
    ).map(t => (t._1, t._2, t._3, t._4.orNull)).toDF("k", "tie", "ms", "v")
    val out = Scd2.build(df, "k", "ms", "v", "tie")
      .as[(Long, Option[String], Long, Option[Long], Long, Boolean)]
      .collect().sortBy(_._3).toSeq
    assert(out.map(r => (r._2, r._5)) ==
      Seq((Some("a"), 1L), (None, 2L), (Some("a"), 1L)))
  }

  private implicit class SomeOps(s: String) { def some: Option[String] = Some(s) }
}
