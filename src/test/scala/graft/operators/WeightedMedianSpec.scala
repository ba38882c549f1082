package graft.operators

import graft.SparkTestBase

class WeightedMedianSpec extends SparkTestBase {
  import spark.implicits._

  private def serial(rows: Seq[(String, Long, Long, Long)]) =
    rows.filter(_._3 > 0).groupBy(_._1).map { case (g, rs) =>
      val sorted = rs.sortBy(r => (r._2, r._4))
      val tot = sorted.map(_._3).sum
      val cum = sorted.scanLeft(0L)(_ + _._3).tail
      val idx = cum.indexWhere(_ * 2 >= tot)
      g -> ((sorted(idx)._2, tot))
    }

  test("weighted median equals the serial twin on random data") {
    val rng = new scala.util.Random(53)
    val rows = (1L to 900L).map(i =>
      (s"g${i % 5}", rng.nextInt(1000).toLong, rng.nextInt(9).toLong, i))
    val got = WeightedMedian.weightedMedian(
        rows.toDF("g", "v", "w", "id"), "g", "v", "w", "id")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == serial(rows))
  }

  test("a heavy row pulls the median to itself; equal weights reduce to lower median") {
    val heavy = Seq(("h", 1L, 1L, 1L), ("h", 2L, 1L, 2L), ("h", 100L, 10L, 3L))
    val gotH = WeightedMedian.weightedMedian(
        heavy.toDF("g", "v", "w", "id"), "g", "v", "w", "id")
      .as[(String, Long, Long)].head()
    assert(gotH == (("h", 100L, 12L)))
    val flat = Seq(("f", 10L, 1L, 1L), ("f", 20L, 1L, 2L),
      ("f", 30L, 1L, 3L), ("f", 40L, 1L, 4L))
    val gotF = WeightedMedian.weightedMedian(
        flat.toDF("g", "v", "w", "id"), "g", "v", "w", "id")
      .as[(String, Long, Long)].head()
    assert(gotF == (("f", 20L, 4L))) // lower median at 2*cumw == totw
  }
}
