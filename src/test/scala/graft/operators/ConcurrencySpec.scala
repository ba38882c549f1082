package graft.operators

import graft.SparkTestBase

class ConcurrencySpec extends SparkTestBase {
  import spark.implicits._

  private val M = 60000L // one minute in ms

  private def run(iv: Seq[(Long, Long)]) =
    Concurrency.dailyPeak(iv.toDF("sms", "ems"), "sms", "ems")
      .as[(Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap

  test("overlapping intervals stack; peak minute is the earliest max") {
    // minutes [0,10) [5,15) [5,8): concurrency hits 3 at minute 5
    val got = run(Seq((0L, 10 * M), (5 * M, 15 * M), (5 * M, 8 * M)))
    assert(got(0L) == ((3L, 5L)))
  }

  test("disjoint intervals never stack") {
    val got = run(Seq((0L, 5 * M), (10 * M, 15 * M)))
    assert(got(0L) == ((1L, 0L)))
  }

  test("a partial trailing minute still counts as active in it") {
    // [0ms, 90s): active minutes 0 and 1; a second interval starting
    // at minute 1 overlaps it there
    val got = run(Seq((0L, 90000L), (M, 2 * M)))
    assert(got(0L) == ((2L, 1L)))
  }

  test("cross-midnight intervals are clamped to their start day") {
    // starts 23:59 day 0, ends 00:30 day 1: counted only in day 0
    val s = 1439 * M
    val got = run(Seq((s, s + 31 * M)))
    assert(got == Map(0L -> ((1L, 1439L))))
  }

  test("per-day peaks are independent") {
    val day1 = 1440 * M
    val got = run(Seq((0L, 5 * M), (0L, 5 * M), (day1, day1 + 5 * M)))
    assert(got(0L) == ((2L, 0L)) && got(1L) == ((1L, 0L)))
  }

  test("matches a serial sweep on a dense random-ish layout") {
    val iv = (0 until 200).map { i =>
      val s = ((i * 37) % 400).toLong * M
      (s, s + ((i % 13) + 1).toLong * M)
    }
    // serial per-minute occupancy
    val occ = Array.fill(1440)(0L)
    iv.foreach { case (s, e) =>
      ((s / M) until math.min((e + M - 1) / M, 1440L)).foreach(m =>
        occ(m.toInt) += 1)
    }
    val peak = occ.max
    val minute = occ.indexWhere(_ == peak).toLong
    assert(run(iv)(0L) == ((peak, minute)))
  }
}
