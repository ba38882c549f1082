package graft.operators

import graft.SparkTestBase

class RetentionAnomalySpec extends SparkTestBase {
  import spark.implicits._

  test("retention matrix: cohorts by first-event period, offsets by elapsed gap") {
    val wk = Retention.WeekMs
    // offsets are whole periods SINCE THE FIRST EVENT (rolling), not
    // calendar-bucket differences: u1 first at 100wk+5, so the event at
    // 101wk+1 is offset 0 (< one full week later) and 103wk is offset 2.
    val ev = Seq(
      (1L, 100 * wk + 5), (1L, 100 * wk + 9), (1L, 101 * wk + 1), (1L, 103 * wk),
      (2L, 101 * wk + 2), (2L, 101 * wk + 3)
    ).toDF("u", "ms")
    val got = Retention.matrix(ev, "u", "ms")
      .orderBy($"cohort_week", $"week_offset")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((100L, 0L, 1L), (100L, 2L, 1L), (101L, 0L, 1L)))
  }

  test("z-outliers flags exactly the planted spike, with exact-integer stats") {
    val rows = (1 to 99).map(i => (i.toLong, "a", 10.0 + (i % 3) * 0.001)) :+ (100L, "a", 500.0)
    val got = Anomaly.zOutliers(rows.toDF("id", "g", "v"), Seq("g"), "id", "v")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got.map(_._2) == Seq(100L))
    assert(got.head._3 == 500000L) // integerized metric
    assert(got.head._4 > 9.0) // ~sqrt(n) for a single huge spike
  }

  test("z-outliers: single-row groups never divide by zero") {
    val got = Anomaly.zOutliers(Seq((1L, "solo", 5.0)).toDF("id", "g", "v"),
      Seq("g"), "id", "v")
    assert(got.count() == 0)
  }
}
