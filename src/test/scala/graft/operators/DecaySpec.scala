package graft.operators

import graft.SparkTestBase

class DecaySpec extends SparkTestBase {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long)], halfLife: Long, maxK: Int) =
    Decay.decayedCounts(rows.toDF("g", "age", "vu"), "g", "age", "vu",
        halfLife, maxK)
      .select("g", "n", "decayed_units", "dec_value_units", "decayed")
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  test("weights halve exactly every half-life step") {
    // maxK=4 → fresh weight 16 units; ages 0,6,7,14 at halfLife=7
    // → k = 0,0,1,2 → units 16,16,8,4
    val got = run(Seq(("a", 0L, 1L), ("a", 6L, 1L), ("a", 7L, 1L),
      ("a", 14L, 1L)), halfLife = 7L, maxK = 4)
    assert(got("a") == ((4L, 16L + 16L + 8L + 4L, 44L, 44.0 / 16.0)))
  }

  test("ages beyond maxK half-lives saturate at one unit, never zero") {
    val got = run(Seq(("a", 1000L, 3L)), halfLife = 7L, maxK = 4)
    assert(got("a") == ((1L, 1L, 3L, 1.0 / 16.0)))
  }

  test("value units scale with the same dyadic weight") {
    // age 7, halfLife 7, maxK 2 → weight 2 units; value 5 → 10
    val got = run(Seq(("a", 7L, 5L)), halfLife = 7L, maxK = 2)
    assert(got("a") == ((1L, 2L, 10L, 0.5)))
  }

  test("groups aggregate independently") {
    val got = run(Seq(("a", 0L, 1L), ("b", 7L, 1L)), halfLife = 7L, maxK = 1)
    assert(got("a") == ((1L, 2L, 2L, 1.0)) && got("b") == ((1L, 1L, 1L, 0.5)))
  }

  test("decayed counter equals the per-row closed form on a sweep") {
    val rows = (0 until 100).map(i => ("g", i.toLong, (i % 7).toLong))
    val maxK = 16
    val expUnits = rows.map { case (_, age, _) =>
      1L << (maxK - math.min(age / 3, maxK.toLong)).toInt }.sum
    val expVal = rows.map { case (_, age, v) =>
      v * (1L << (maxK - math.min(age / 3, maxK.toLong)).toInt) }.sum
    val got = run(rows, halfLife = 3L, maxK = maxK)
    assert(got("g") == ((100L, expUnits, expVal, expUnits / 65536.0)))
  }
}
