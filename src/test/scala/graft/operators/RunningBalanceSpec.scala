package graft.operators

import graft.SparkTestBase

class RunningBalanceSpec extends SparkTestBase {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, Long)]) =
    RunningBalance.floored(rows.toDF("k", "ord", "delta"), "k",
        Seq("ord"), "delta")
      .as[(Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap

  private def serial(deltas: Seq[Long]): (Long, Long, Long) = {
    var b = 0L; var mx = 0L; var hits = 0L
    deltas.foreach { d =>
      val raw = b + d
      b = math.max(0L, raw)
      if (raw < 0) hits += 1
      mx = math.max(mx, b)
    }
    (b, mx, hits)
  }

  test("clamp engages exactly when the raw balance would go negative") {
    // +5, -8 (clamped to 0), +3 → final 3, max 5, one floor hit
    val got = run(Seq((1L, 1L, 5L), (1L, 2L, -8L), (1L, 3L, 3L)))
    assert(got(1L) == ((3L, 5L, 1L)))
  }

  test("never-negative sequences match a plain running sum") {
    val got = run(Seq((1L, 1L, 2L), (1L, 2L, 3L), (1L, 3L, -1L)))
    assert(got(1L) == ((4L, 5L, 0L)))
  }

  test("a withdrawal landing exactly on zero is not a floor hit") {
    // +5, -5 → balance 0 but raw never went negative
    val got = run(Seq((1L, 1L, 5L), (1L, 2L, -5L)))
    assert(got(1L) == ((0L, 5L, 0L)))
  }

  test("keys are independent") {
    val got = run(Seq((1L, 1L, -3L), (2L, 1L, 7L)))
    assert(got(1L) == ((0L, 0L, 1L)) && got(2L) == ((7L, 7L, 0L)))
  }

  test("NULL order keys sort first, deterministically, on any partitioning") {
    // A NULL ord row must be treated as the FIRST step of the process
    // (asc_nulls_first) — the cross-engine pin for the q145 oracle.
    // deltas in pinned order: -3 (null ord: clamp), +5, -1 → final 4
    val rows = Seq((1L, Option.empty[Long], -3L),
      (1L, Some(1L), 5L), (1L, Some(2L), -1L))
    val df = rows.toDF("k", "ord", "delta").repartition(8)
    val got = RunningBalance.floored(df, "k", Seq("ord"), "delta")
      .as[(Long, Long, Long, Long)].collect().head
    assert((got._2, got._3, got._4) == ((4L, 5L, 1L)))
  }

  test("matches the serial fold on a mixed sweep, any partitioning") {
    val deltas = (0 until 300).map(i => ((i * 17) % 23).toLong - 11L)
    val rows = deltas.zipWithIndex.map { case (d, i) => (1L, i.toLong, d) }
    val expect = serial(deltas)
    assert(run(rows)(1L) == expect)
    val spread = RunningBalance.floored(
        rows.toDF("k", "ord", "delta").repartition(16), "k", Seq("ord"), "delta")
      .as[(Long, Long, Long, Long)].collect().head
    assert((spread._2, spread._3, spread._4) == expect)
  }
}
