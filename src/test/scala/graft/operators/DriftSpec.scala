package graft.operators

import graft.SparkTestBase

class DriftSpec extends SparkTestBase {
  import spark.implicits._

  test("identical samples show zero drift in every bin") {
    val rows = (1L to 500L).map(i => i % 7).toDF("bin")
    val got = Drift.frequencyDrift(rows, rows, "bin")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(got.length == 7)
    assert(got.forall(r => r._6 == 0L && r._7 == 0L))
    assert(got.forall(r => r._2 == r._3))
  }

  test("a planted shift is flagged with exact ppm arithmetic") {
    val a = (1L to 1000L).map(i => if (i <= 100) 1L else 2L).toDF("bin")
    val b = (1L to 1000L).map(i => if (i <= 300) 1L else 2L).toDF("bin")
    val got = Drift.frequencyDrift(a, b, "bin", thresholdPpm = 5000L)
      .as[(Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    // bin 1: 100/1000 = 100000 ppm vs 300/1000 = 300000 ppm
    assert(got(1L) == ((1L, 100L, 300L, 100000L, 300000L, -200000L, 1L)))
    assert(got(2L) == ((2L, 900L, 700L, 900000L, 700000L, 200000L, 1L)))
  }

  test("bins present in only one sample get zero counts, not dropped rows") {
    val a = Seq(1L, 1L, 2L).toDF("bin")
    val b = Seq(2L, 3L).toDF("bin")
    val got = Drift.frequencyDrift(a, b, "bin")
      .as[(Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(1L -> ((2L, 0L)), 2L -> ((1L, 1L)), 3L -> ((0L, 1L))))
  }
}
