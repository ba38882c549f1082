package graft.operators

import graft.SparkTestBase

class CorrelateSpec extends SparkTestBase {
  import spark.implicits._

  private def run(rows: Seq[(String, String, Long)]) =
    Correlate.pairwisePearson(rows.toDF("bk", "sr", "v"), "bk", "sr", "v")
      .as[(String, String, Long, Option[Double])].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap

  test("perfect linear, anti-linear, and flat series") {
    val out = run(Seq(
      ("b1", "up", 1L), ("b2", "up", 2L), ("b3", "up", 3L),
      ("b1", "dn", 9L), ("b2", "dn", 6L), ("b3", "dn", 3L),
      ("b1", "flat", 5L), ("b2", "flat", 5L), ("b3", "flat", 5L)
    ))
    assert(out(("dn", "up")) == ((3L, Some(-1.0))))
    // zero variance → undefined r, not a crash or ±inf
    assert(out(("flat", "up")) == ((3L, None)))
    assert(out(("dn", "flat")) == ((3L, None)))
  }

  test("matches a serial Pearson on an arbitrary pair") {
    val xs = Seq(3L, 1L, 4L, 1L, 5L, 9L, 2L, 6L)
    val ys = Seq(2L, 7L, 1L, 8L, 2L, 8L, 1L, 8L)
    val rows = xs.zipWithIndex.map { case (x, i) => (s"b$i", "x", x) } ++
      ys.zipWithIndex.map { case (y, i) => (s"b$i", "y", y) }
    val n = xs.size.toLong
    val (sx, sy) = (xs.sum, ys.sum)
    val (sxx, syy) = (xs.map(v => v * v).sum, ys.map(v => v * v).sum)
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val expect = BigDecimal((n * sxy - sx * sy).toDouble /
      (math.sqrt((n * sxx - sx * sx).toDouble) * math.sqrt((n * syy - sy * sy).toDouble)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(run(rows)(("x", "y")) == ((n, Some(expect))))
  }

  test("correlates only over buckets present in both series") {
    val out = run(Seq(
      ("b1", "a", 1L), ("b2", "a", 2L), ("b3", "a", 3L), ("b4", "a", 0L),
      ("b1", "b", 2L), ("b2", "b", 4L), ("b3", "b", 6L) // b4 missing
    ))
    assert(out(("a", "b")) == ((3L, Some(1.0))))
  }
}
