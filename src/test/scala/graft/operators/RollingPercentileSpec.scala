package graft.operators

import graft.SparkTestBase

class RollingPercentileSpec extends SparkTestBase {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, Long)], window: Int, p: Int) =
    RollingPercentile.trailingExact(rows.toDF("b", "v", "id"),
        "b", "v", "id", window, p)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap

  test("window=1 degenerates to a per-bucket exact percentile") {
    // bucket 0: values 1..5 → p50 rank = floor(.5*4)+1 = 3 → value 3
    val rows = (1L to 5L).map(v => (0L, v, v))
    assert(run(rows, 1, 50)(0L) == ((0L, 5L, 3L)))
  }

  test("trailing frame includes exactly the last `window` buckets") {
    val rows = Seq((0L, 10L, 1L), (1L, 20L, 2L), (2L, 30L, 3L))
    val got = run(rows, 2, 100) // p100 = max of the frame
    assert(got(0L) == ((0L, 1L, 10L)))
    assert(got(1L) == ((1L, 2L, 20L)))
    assert(got(2L) == ((2L, 2L, 30L))) // bucket 0 aged out
  }

  test("rank picks floor(p·(n−1))+1 — the q104 convention, no interpolation") {
    // n=4, p95 → rank floor(.95*3)+1 = 3
    val rows = Seq((0L, 1L, 1L), (0L, 2L, 2L), (0L, 3L, 3L), (0L, 4L, 4L))
    assert(run(rows, 1, 95)(0L)._3 == 3L)
  }

  test("value ties resolve by the tie column but yield the same value") {
    val rows = Seq((0L, 5L, 2L), (0L, 5L, 1L), (0L, 7L, 3L))
    assert(run(rows, 1, 50)(0L)._3 == 5L)
  }

  test("gaps in the bucket spine still see older in-range buckets") {
    // buckets 0 and 5 with window 7: bucket 5's frame includes bucket 0
    val rows = Seq((0L, 1L, 1L), (5L, 9L, 2L))
    val got = run(rows, 7, 0) // p0 = min
    assert(got(5L) == ((5L, 2L, 1L)))
  }
}
