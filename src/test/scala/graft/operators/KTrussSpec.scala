package graft.operators

import graft.SparkTestBase

class KTrussSpec extends SparkTestBase {
  import spark.implicits._

  // K4 on {1,2,3,4} plus a pendant path 4-5-6: every K4 edge has
  // support 2, the pendant edges have 0 — a 3-truss (support ≥ 1)
  // keeps the K4 after one round; a 4-truss (support ≥ 2) keeps it too.
  private val k4PlusTail = (for {
    a <- 1 to 4; b <- (a + 1) to 4
  } yield (a.toLong, b.toLong)) ++ Seq((4L, 5L), (5L, 6L))

  test("peel keeps exactly the K4 and reports per-round sizes") {
    val e = k4PlusTail.toDF("s", "d")
    val got = KTruss.peelCounts(e, "s", "d", k = 4, rounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 8L, 1L -> 6L, 2L -> 6L))
  }

  test("a triangle survives k=3 forever; k=5 erases it") {
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("s", "d")
    assert(KTruss.peelCounts(tri, "s", "d", 3, 3)
      .as[(Long, Long)].collect().toMap == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
    assert(KTruss.peelCounts(tri, "s", "d", 5, 1)
      .as[(Long, Long)].collect().toMap == Map(0L -> 3L, 1L -> 0L))
  }

  test("duplicate/reversed/self-loop edges are normalized before round 0") {
    val e = Seq((1L, 2L), (2L, 1L), (1L, 1L), (2L, 3L), (1L, 3L), (3L, 1L))
      .toDF("s", "d")
    val got = KTruss.peelCounts(e, "s", "d", 3, 1)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 3L, 1L -> 3L))
  }

  test("rejects k < 3") {
    intercept[IllegalArgumentException] {
      KTruss.peelCounts(Seq((1L, 2L)).toDF("s", "d"), "s", "d", 2, 1)
    }
  }

  test("bitmap distinct equals count(distinct) per group and merged") {
    import org.apache.spark.sql.functions._
    // ids straddle multiple 32k-bit bitmap buckets on purpose
    val df = (1 to 500).map(i => (s"g${i % 3}", (i * 777L) % 90000L))
      .toDF("g", "id")
    val parts = BitmapDistinct.partials(df, Seq("g"), col("id"))
    val per = BitmapDistinct.countPartials(parts, Seq("g"), "n")
      .as[(String, Long)].collect().toMap
    val want = df.groupBy($"g").agg(countDistinct($"id").as("n"))
      .as[(String, Long)].collect().toMap
    assert(per == want)
    val all = BitmapDistinct.countPartials(
      BitmapDistinct.merge(parts, Seq.empty), Seq.empty, "n")
      .as[Long].collect().head
    assert(all == df.select($"id").distinct().count())
  }
}
