package graft.operators

import graft.SparkTestBase

class ResampleSpec extends SparkTestBase {
  import spark.implicits._

  test("gaps fill forward; leading gaps take the empty value; flags are exact") {
    val obs = Seq(("a", 2L, 10L), ("a", 5L, 20L), ("b", 1L, 7L))
      .toDF("g", "t", "v")
    val got = Resample.fillForward(obs, "g", "t", "v", lo = 1L, hi = 6L)
      .as[(String, Long, Long, Long)].collect().toSet
    val want = Set(
      ("a", 1L, -1L, 0L), ("a", 2L, 10L, 1L), ("a", 3L, 10L, 0L),
      ("a", 4L, 10L, 0L), ("a", 5L, 20L, 1L), ("a", 6L, 20L, 0L),
      ("b", 1L, 7L, 1L), ("b", 2L, 7L, 0L), ("b", 3L, 7L, 0L),
      ("b", 4L, 7L, 0L), ("b", 5L, 7L, 0L), ("b", 6L, 7L, 0L))
    assert(got == want)
  }

  test("dense series passes through unchanged") {
    val obs = (1L to 5L).map(t => ("g", t, t * 100L)).toDF("g", "t", "v")
    val got = Resample.fillForward(obs, "g", "t", "v", 1L, 5L)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == (1L to 5L).map(t => ("g", t, t * 100L, 1L)).toSet)
  }
}
