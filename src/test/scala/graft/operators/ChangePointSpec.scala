package graft.operators

import graft.SparkTestBase

class ChangePointSpec extends SparkTestBase {
  import spark.implicits._

  test("a planted level shift is detected with the exact serial CUSUM") {
    // 20 buckets at 100, then 20 at 200: reference = lower median (100),
    // so the CUSUM climbs through the shifted half and peaks at its end
    val rows = (1L to 20L).map(d => ("s", d, 100L)) ++
      (21L to 40L).map(d => ("s", d, 200L))
    val got = ChangePoint.cusumPeak(rows.toDF("g", "d", "v"), "g", "d", "v")
      .as[(String, Long, Long, Long, Long)].head()
    val med = 100L // lower median of 20x100, 20x200
    val cus = rows.map(_._3 - med).scanLeft(0L)(_ + _).tail
    val peakIdx = cus.zipWithIndex.maxBy { case (c, i) => (math.abs(c), -i) }._2
    assert(got == (("s", med, peakIdx + 1L, cus(peakIdx), 40L)))
  }

  test("matches the serial twin on random multi-series data") {
    val rng = new scala.util.Random(59)
    val rows = for (g <- 1 to 4; d <- 1 to 50)
      yield (s"g$g", d.toLong, rng.nextInt(1000).toLong)
    val got = ChangePoint.cusumPeak(rows.toDF("g", "d", "v"), "g", "d", "v")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val want = rows.groupBy(_._1).map { case (g, rs) =>
      val byDay = rs.sortBy(_._2)
      val med = rs.map(r => (r._3, r._2)).sorted.apply((rs.size - 1) / 2)._1
      val cus = byDay.map(_._3 - med).scanLeft(0L)(_ + _).tail
      val pk = cus.zipWithIndex.maxBy { case (c, i) => (math.abs(c), -i) }._2
      g -> ((med, byDay(pk)._2, cus(pk), rs.size.toLong))
    }
    assert(got == want)
  }
}
