package graft.operators

import graft.SparkTestBase

class CohortValueSpec extends SparkTestBase {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, Long)]) =
    CohortValue.curves(rows.toDF("u", "day", "vc"), "u", "day", "vc")
      .select("cohort_day", "age", "n_active", "value_units", "cum_value")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> ((t._3, t._4, t._5))).toMap

  test("cohort is the first activity day; age counts from it") {
    val rows = Seq((1L, 10L, 5L), (1L, 12L, 3L))
    val got = run(rows)
    assert(got((10L, 0L)) == ((1L, 5L, 5L)))
    assert(got((10L, 2L)) == ((1L, 3L, 8L)))
  }

  test("cumulative value runs per cohort, skipping absent ages") {
    val rows = Seq((1L, 0L, 2L), (1L, 5L, 4L), (1L, 9L, 6L))
    val got = run(rows)
    assert(got((0L, 5L))._3 == 6L && got((0L, 9L))._3 == 12L)
  }

  test("same-age activity from distinct users counts each once") {
    val rows = Seq((1L, 0L, 1L), (2L, 0L, 1L), (1L, 0L, 1L))
    val got = run(rows)
    assert(got((0L, 0L)) == ((2L, 3L, 3L)))
  }

  test("cohorts are independent") {
    val rows = Seq((1L, 0L, 10L), (2L, 3L, 20L), (2L, 4L, 5L))
    val got = run(rows)
    assert(got((0L, 0L)) == ((1L, 10L, 10L)))
    assert(got((3L, 0L)) == ((1L, 20L, 20L)))
    assert(got((3L, 1L)) == ((1L, 5L, 25L)))
  }

  test("negative deltas (refunds) flow through the running total") {
    val rows = Seq((1L, 0L, 10L), (1L, 1L, -4L))
    assert(run(rows)((0L, 1L)) == ((1L, -4L, 6L)))
  }
}
