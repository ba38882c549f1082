package graft.operators

import graft.SparkTestBase

class RankFusionSpec extends SparkTestBase {
  import spark.implicits._

  test("fuses ranks reciprocally; single-source ids still score") {
    val a = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("id", "rank")
    val b = Seq((20L, 1L), (40L, 2L)).toDF("id", "rank")
    val out = RankFusion.rrf(Seq(a, b), "id", "rank", k0 = 60, topK = 10)
      .as[(Long, Double, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(20L) == ((r6(1.0 / 62 + 1.0 / 61), 2L))) // both sources
    assert(out(10L) == ((r6(1.0 / 61), 1L)))
    assert(out(40L) == ((r6(1.0 / 62), 1L)))
    assert(out(30L) == ((r6(1.0 / 63), 1L)))
    // double-source id outranks every single-source one here
    val top = RankFusion.rrf(Seq(a, b), "id", "rank").as[(Long, Double, Long)].head()
    assert(top._1 == 20L)
  }

  test("topK truncates after fusion, ties break on id") {
    val a = (1L to 9L).map(i => (i, i)).toDF("id", "rank")
    val b = (1L to 9L).map(i => (i + 100L, i)).toDF("id", "rank") // same ranks, disjoint ids
    val out = RankFusion.rrf(Seq(a, b), "id", "rank", k0 = 60, topK = 4)
      .as[(Long, Double, Long)].collect().map(_._1).toSeq
    // rank-1 ids from both sources tie → lower id first
    assert(out == Seq(1L, 101L, 2L, 102L))
  }
}
