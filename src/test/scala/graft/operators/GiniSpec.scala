package graft.operators

import graft.SparkTestBase

class GiniSpec extends SparkTestBase {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long)]) =
    Gini.concentration(rows.toDF("g", "v", "tie"), "g", "v", "tie")
      .select("g", "n", "sum_v", "gini_num", "gini_den", "gini")
      .as[(String, Long, Long, Long, Long, Option[Double])].collect()
      .map(t => t._1 -> t).toMap

  private def serial(vs: Seq[Long]): (Long, Long) = {
    val sorted = vs.sorted
    val n = sorted.size.toLong
    val rw = sorted.zipWithIndex.map { case (v, i) =>
      BigInt(i + 1) * v }.sum
    val sv = sorted.sum
    ((BigInt(2) * rw - BigInt(n + 1) * sv).toLong, (BigInt(n) * sv).toLong)
  }

  test("perfect equality gives gini (n-... ) exactly the rank formula") {
    // equal values: G = (2·Σr·v − (n+1)·n·v) / (n·n·v) = 0
    val got = run((1 to 5).map(i => ("a", 10L, i.toLong)))
    assert(got("a")._4 == 0L && got("a")._6.contains(0.0))
  }

  test("total concentration approaches (n-1)/n") {
    // one holder of everything: num = 2·n·v − (n+1)·v = (n−1)·v
    val rows = ("a", 100L, 0L) +: (1 to 4).map(i => ("a", 0L, i.toLong))
    val got = run(rows)
    assert(got("a")._4 == 4L * 100L && got("a")._5 == 5L * 100L)
    assert(got("a")._6.contains(0.8))
  }

  test("matches the exact serial formula on a mixed distribution") {
    val vs = (0 until 100).map(i => ((i * 31) % 57).toLong)
    val rows = vs.zipWithIndex.map { case (v, i) => ("a", v, i.toLong) }
    val (num, den) = serial(vs)
    val got = run(rows)("a")
    assert((got._4, got._5) == ((num, den)))
  }

  test("tie order between equal values cannot change the statistic") {
    val a = run(Seq(("a", 5L, 1L), ("a", 5L, 2L), ("a", 1L, 3L)))("a")
    val b = run(Seq(("a", 5L, 2L), ("a", 5L, 1L), ("a", 1L, 3L)))("a")
    assert(a._4 == b._4 && a._5 == b._5)
  }

  test("all-zero mass yields null gini, zero denominator") {
    val got = run(Seq(("a", 0L, 1L), ("a", 0L, 2L)))
    assert(got("a")._5 == 0L && got("a")._6.isEmpty)
  }

  test("groups are independent") {
    val got = run(Seq(("a", 1L, 1L), ("b", 9L, 1L), ("b", 1L, 2L)))
    assert(got.keySet == Set("a", "b"))
    assert(got("a")._2 == 1L && got("b")._2 == 2L)
  }
}
