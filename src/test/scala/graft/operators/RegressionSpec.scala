package graft.operators

import graft.SparkTestBase

class RegressionSpec extends SparkTestBase {
  import spark.implicits._

  test("sufficient stats and slope equal the serial twin; perfect line recovered") {
    // y = 3x + 7 exactly: slope_milli must be exactly 3000
    val line = (1L to 100L).map(x => ("line", x, 3 * x + 7))
    val rng = new scala.util.Random(3)
    val noisy = (1L to 200L).map(_ => ("noisy",
      rng.nextInt(50).toLong, rng.nextInt(1000).toLong - 500))
    val rows = line ++ noisy
    val got = Regression.olsStats(rows.toDF("g", "x", "y"), Seq("g"), "x", "y")
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    for ((g, rs) <- rows.groupBy(_._1)) {
      val n = rs.size.toLong
      val sx = rs.map(_._2).sum; val sy = rs.map(_._3).sum
      val sxy = rs.map(r => r._2 * r._3).sum
      val sxx = rs.map(r => r._2 * r._2).sum
      val num = n * sxy - sx * sy; val den = n * sxx - sx * sx
      val (_, gn, gsx, gsy, gsxy, gsxx, gnum, gden, gmilli) = got(g)
      assert((gn, gsx, gsy, gsxy, gsxx, gnum, gden) ==
        ((n, sx, sy, sxy, sxx, num, den)))
      assert(gmilli.contains(1000 * num / den)) // Long / truncates, as spec'd
    }
    assert(got("line")._9.contains(3000L))
  }

  test("constant x yields a null slope, not a division error") {
    val rows = Seq(("g", 5L, 1L), ("g", 5L, 9L)).toDF("g", "x", "y")
    val out = Regression.olsStats(rows, Seq("g"), "x", "y")
      .select("slope_milli").as[Option[Long]].head()
    assert(out.isEmpty)
  }

  test("negative non-integral slope truncates toward zero (DuckDB integer // semantics)") {
    val rows = Seq(("g", 0L, 1L), ("g", 1L, 0L), ("g", 3L, 0L))
    val got = Regression.olsStats(rows.toDF("g", "x", "y"), Seq("g"), "x", "y")
      .select("slope_num", "slope_den", "slope_milli")
      .as[(Long, Long, Option[Long])].head()
    assert(got._3.contains(1000 * got._1 / got._2))
    assert(1000 * got._1 % got._2 != 0 && got._1 < 0) // non-integral negative case
  }
}
