package graft.operators

import graft.SparkTestBase

class ConcentrationSpec extends SparkTestBase {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long)], k: Int) =
    Concentration.hhi(rows.toDF("g", "h", "v"), "g", "h", "v", k)
      .select("g", "n_holders", "total", "hhi_ppm2", "crk_ppm")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> t).toMap

  test("a monopoly has HHI = 1e12 ppm² and CR-1 = 1e6 ppm") {
    val got = run(Seq(("a", 1L, 100L)), k = 1)
    assert(got("a") == (("a", 1L, 100L, 1000000L * 1000000L, 1000000L)))
  }

  test("equal split: HHI = n·(1e6/n)², shares truncate exactly") {
    // 4 holders × 25 → each 250000 ppm → HHI 4·250000² = 2.5e11
    val rows = (1L to 4L).map(h => ("a", h, 25L))
    val got = run(rows, k = 2)
    assert(got("a")._4 == 4L * 250000L * 250000L)
    assert(got("a")._5 == 500000L)
  }

  test("truncating ppm matches integer division, never rounds up") {
    // 3 holders of 1 each: share = 333333 ppm (not 333334)
    val rows = (1L to 3L).map(h => ("a", h, 1L))
    val got = run(rows, k = 3)
    assert(got("a")._4 == 3L * 333333L * 333333L && got("a")._5 == 999999L)
  }

  test("rows pre-aggregate per holder before shares") {
    // holder 1 appears twice: 30+70 = 100 of 200 total → 500000 ppm
    val rows = Seq(("a", 1L, 30L), ("a", 1L, 70L), ("a", 2L, 100L))
    val got = run(rows, k = 1)
    assert(got("a")._2 == 2L && got("a")._5 == 500000L)
  }

  test("CR-k ties break on the holder key, deterministically") {
    // equal values: top-2 = holders 1,2 by key order
    val rows = (1L to 4L).map(h => ("a", h, 10L))
    assert(run(rows, k = 2)("a")._5 == 500000L)
  }

  test("zero-total groups are dropped; groups are independent") {
    val got = run(Seq(("a", 1L, 0L), ("b", 1L, 5L)), k = 1)
    assert(got.keySet == Set("b"))
  }

  // ---- paretoK ----

  private def runPareto(rows: Seq[(String, Long, Long)], tn: Int, td: Int) =
    Concentration.paretoK(rows.toDF("g", "h", "v"), "g", "h", "v", tn, td)
      .select("g", "n_holders", "total", "pareto_k")
      .as[(String, Long, Long, Long)].collect()
      .map(t => t._1 -> t).toMap

  test("pareto point: one dominant holder covers the threshold alone") {
    val rows = Seq(("a", 1L, 80L), ("a", 2L, 10L), ("a", 3L, 10L))
    assert(runPareto(rows, 8, 10)("a") == (("a", 3L, 100L, 1L)))
  }

  test("pareto point accumulates until the bar is reached, inclusive") {
    // 4 × 25: exactly 80% needs... 3 holders (75% < 80% ≤ 100%... 4×25:
    // running 25/50/75/100 → first ≥80 is rank 4
    val rows = (1L to 4L).map(h => ("a", h, 25L))
    assert(runPareto(rows, 8, 10)("a")._4 == 4L)
    // threshold exactly met at a prefix: 50% with 2×25 of 100 → rank 2
    assert(runPareto(rows, 1, 2)("a")._4 == 2L)
  }

  test("pareto ties on value resolve by holder key") {
    val rows = Seq(("a", 2L, 50L), ("a", 1L, 50L))
    assert(runPareto(rows, 1, 2)("a")._4 == 1L)
  }
}
