package graft.operators

import graft.SparkTestBase

class RollingAggSpec extends SparkTestBase {
  import spark.implicits._

  test("trailing sums/means equal the serial twin incl. the warm-up edge") {
    val rng = new scala.util.Random(37)
    val rows = for (g <- 1 to 4; t <- 1 to 40)
      yield (s"g$g", t.toLong, rng.nextInt(200).toLong - 100)
    val got = RollingAgg.trailing(rows.toDF("g", "t", "v"), "g", "t", "v", k = 7)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._4, r._5, r._6))).toMap
    for ((g, rs) <- rows.groupBy(_._1); sorted = rs.sortBy(_._2);
         i <- sorted.indices) {
      val win = sorted.slice(math.max(0, i - 6), i + 1)
      val s = win.map(_._3).sum; val n = win.size.toLong
      assert(got((g, sorted(i)._2)) == ((s, n, s / n)),
        s"group $g t=${sorted(i)._2}")
    }
  }

  test("negative sums truncate toward zero like DuckDB integer //") {
    val rows = Seq(("g", 1L, -5L), ("g", 2L, -2L))
    val got = RollingAgg.trailing(rows.toDF("g", "t", "v"), "g", "t", "v", 7)
      .select("mov_avg").as[Long].collect().toSet
    assert(got == Set(-5L, -3L)) // (-7) div 2 = -3 (truncate), not -4 (floor)
  }
}
