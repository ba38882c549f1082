package graft.operators

import graft.SparkTestBase

class AutocorrSpec extends SparkTestBase {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long)], lags: Seq[Long]) =
    Autocorr.lagK(rows.toDF("s", "b", "v"), "s", "b", "v", lags)
      .as[(String, Long, Long, Option[Double])].collect()
      .map(t => (t._1, t._2) -> ((t._3, t._4))).toMap

  private def serialR(pairs: Seq[(Long, Long)]): Option[Double] = {
    val n = pairs.size.toLong
    val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
    val sxx = pairs.map(p => p._1 * p._1).sum
    val syy = pairs.map(p => p._2 * p._2).sum
    val sxy = pairs.map(p => p._1 * p._2).sum
    val den = math.sqrt((n * sxx - sx * sx).toDouble) *
      math.sqrt((n * syy - sy * sy).toDouble)
    if (den == 0.0) None
    else Some(BigDecimal((n * sxy - sx * sy).toDouble / den)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("a perfectly persistent series autocorrelates at r = 1") {
    // strictly increasing linear series: lag-1 pairs are collinear
    val rows = (0L to 10L).map(d => ("a", d, 5 * d + 3))
    val got = run(rows, Seq(1L))
    assert(got(("a", 1L))._1 == 10L && got(("a", 1L))._2.contains(1.0))
  }

  test("an alternating series anticorrelates at lag 1, correlates at lag 2") {
    val rows = (0L to 9L).map(d => ("a", d, if (d % 2 == 0) 10L else 0L))
    val got = run(rows, Seq(1L, 2L))
    assert(got(("a", 1L))._2.contains(-1.0))
    assert(got(("a", 2L))._2.contains(1.0))
  }

  test("matches the exact serial formula on a mixed series") {
    val vs = (0 until 40).map(i => ((i * 13) % 17).toLong)
    val rows = vs.zipWithIndex.map { case (v, d) => ("a", d.toLong, v) }
    val pairs = (0 until 39).map(d => (vs(d), vs(d + 1)))
    val got = run(rows, Seq(1L))(("a", 1L))
    assert(got._1 == 39L && got._2 == serialR(pairs))
  }

  test("gaps in the bucket axis drop pairs, not the series") {
    // buckets 0,1,3: only (0,1) pairs at lag 1
    val rows = Seq(("a", 0L, 1L), ("a", 1L, 2L), ("a", 3L, 9L))
    assert(run(rows, Seq(1L))(("a", 1L))._1 == 1L)
  }

  test("constant series has undefined (null) autocorrelation") {
    val rows = (0L to 5L).map(d => ("a", d, 7L))
    assert(run(rows, Seq(1L))(("a", 1L))._2.isEmpty)
  }

  test("series are independent") {
    val rows = (0L to 5L).map(d => ("a", d, d)) ++
      (0L to 5L).map(d => ("b", d, 5L - d))
    val got = run(rows, Seq(1L))
    assert(got(("a", 1L))._2.contains(1.0) && got(("b", 1L))._2.contains(1.0))
  }
}
