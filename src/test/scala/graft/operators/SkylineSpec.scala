package graft.operators

import graft.SparkTestBase

class SkylineSpec extends SparkTestBase {
  import spark.implicits._

  private def serial(pts: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] =
    pts.filterNot { p =>
      pts.exists(q => q._2 <= p._2 && q._3 >= p._3 &&
        (q._2 < p._2 || q._3 > p._3))
    }.toSet

  test("skyline equals the quadratic serial twin on random points") {
    val rng = new scala.util.Random(17)
    val pts = (1L to 2000L).map(i =>
      (i, rng.nextInt(500).toLong, rng.nextInt(500).toLong))
    val got = Skyline.pareto2d(pts.toDF("id", "x", "y").repartition(16), "x", "y")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == serial(pts))
  }

  test("coincident points are all kept; dominated ties are dropped") {
    val pts = Seq((1L, 10L, 10L), (2L, 10L, 10L), // frontier duplicates
      (3L, 10L, 5L), // same x, lower y -> dominated
      (4L, 5L, 10L), // cheaper at same y -> dominates 1,2? x<, y= -> strict
      (5L, 20L, 20L))
    val got = Skyline.pareto2d(pts.toDF("id", "x", "y"), "x", "y")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == serial(pts))
    assert(got == Set((4L, 5L, 10L), (5L, 20L, 20L)))
  }

  test("anti-chain input (all frontier) passes through whole") {
    // under (min x, max y) an anti-chain needs y increasing with x
    val pts = (1L to 50L).map(i => (i, i, 100L + i))
    val got = Skyline.pareto2d(pts.toDF("id", "x", "y").repartition(7), "x", "y")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == pts.toSet)
  }
}
