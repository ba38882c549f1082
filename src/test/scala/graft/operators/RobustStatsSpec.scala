package graft.operators

import graft.SparkTestBase

class RobustStatsSpec extends SparkTestBase {
  import spark.implicits._

  private def serial(rows: Seq[(String, Long, Long)], zmax: Long) =
    rows.groupBy(_._1).map { case (g, rs) =>
      val sorted = rs.sortBy(r => (r._3, r._2))
      val med = sorted((sorted.length - 1) / 2)._3
      val devs = rs.map(r => (math.abs(r._3 - med), r._3, r._2)).sortBy(identity)
      val mad = devs((devs.length - 1) / 2)._1
      val out = rs.count(r => math.abs(r._3 - med) > zmax * mad)
      g -> ((rs.length.toLong, med, mad, out.toLong))
    }

  test("median/MAD/outlier counts equal the serial twin on random groups") {
    val rng = new scala.util.Random(23)
    val rows = (1L to 600L).map(i => (s"g${i % 4}", i, rng.nextInt(500).toLong))
    val got = RobustStats.medianMadOutliers(rows.toDF("g", "id", "v"), "g", "v", "id", zmax = 2L)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got == serial(rows, 2L).toMap)
  }

  test("outliers move mean-based stats but leave median/MAD fixed") {
    val base = (1L to 99L).map(i => ("g", i, 100L))
    val spiked = base :+ (("g", 100L, 1000000L))
    val out = RobustStats.medianMadOutliers(spiked.toDF("g", "id", "v"), "g", "v", "id", 5L)
      .as[(String, Long, Long, Long, Long)].head()
    // median stays at the bulk value, MAD 0, the single spike flagged
    assert(out == (("g", 100L, 100L, 0L, 1L)))
  }

  test("even group sizes take the LOWER median deterministically") {
    val rows = Seq(("g", 1L, 10L), ("g", 2L, 20L), ("g", 3L, 30L), ("g", 4L, 40L))
    val out = RobustStats.medianMadOutliers(rows.toDF("g", "id", "v"), "g", "v", "id", 5L)
      .select("med").as[Long].head()
    assert(out == 20L)
  }
}
