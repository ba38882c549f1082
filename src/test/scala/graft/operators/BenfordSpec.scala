package graft.operators

import graft.SparkTestBase

class BenfordSpec extends SparkTestBase {
  import spark.implicits._

  private def run(values: Seq[Double]) =
    Benford.firstDigit(values.toDF("v"), "v")
      .select("digit", "n", "obs_ppm", "expected_ppm", "dev_ppm")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> t).toMap

  test("leading digit comes from the integral part") {
    val got = run(Seq(1.9, 19.4, 190.0, 2.5, 930000.1))
    assert(got(1L)._2 == 3L && got(2L)._2 == 1L && got(9L)._2 == 1L)
  }

  test("values below 1 are excluded") {
    val got = run(Seq(0.9, 0.0001, 1.0, 5.0))
    assert(got.values.map(_._2).sum == 2L)
  }

  test("ppm math is exact truncating-integer arithmetic") {
    // 3 values: two lead with 1, one with 9 → 666666 / 333333 ppm
    val got = run(Seq(1.0, 12.0, 9.0))
    assert(got(1L)._3 == 666666L && got(9L)._3 == 333333L)
    assert(got(1L)._4 == 301030L && got(1L)._5 == 666666L - 301030L)
    assert(got(9L)._4 == 45757L && got(9L)._5 == 333333L - 45757L)
  }

  test("expected ppm table covers all nine digits") {
    val got = run((1 to 9).map(_.toDouble))
    assert(got.keySet == (1L to 9L).toSet)
    assert(got.values.map(_._4).sum == 301030L + 176091L + 124939L +
      96910L + 79181L + 66947L + 57992L + 51153L + 45757L)
  }
}
