package graft.operators

import graft.SparkTestBase

class KCoreSpec extends SparkTestBase {
  import spark.implicits._

  private def serialCore(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
    var e = edges.map(p => if (p._1 < p._2) p else p.swap)
      .filter(p => p._1 != p._2).distinct
    var stable = false
    while (!stable) {
      val deg = e.flatMap(p => Seq(p._1, p._2)).groupBy(identity)
        .map { case (n, xs) => n -> xs.size }
      val kept = e.filter(p => deg(p._1) >= k && deg(p._2) >= k)
      stable = kept.size == e.size
      e = kept
    }
    e.flatMap(p => Seq(p._1, p._2)).groupBy(identity)
      .map { case (n, xs) => n -> xs.size.toLong }
  }

  private def run(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] =
    KCore.core(edges.toDF("src", "dst"), "src", "dst", k)
      .as[(Long, Long)].collect().toMap

  test("2-core peels a pendant chain off a triangle") {
    // triangle 1-2-3 plus tail 3-4-5: 2-core = the triangle only
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    assert(run(edges, 2) == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("cascading peel: removing one node drags down the next round") {
    // 4-clique + vertex 5 attached to 3 clique nodes + vertex 6 to 5&1:
    // 3-core drops 6 first, then 5 survives (deg 3)… recompute serially
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (5L, 1L), (5L, 2L), (5L, 3L), (6L, 5L), (6L, 1L))
    assert(run(edges, 3) == serialCore(edges, 3))
  }

  test("random graph matches the serial peeler at several k") {
    val rng = new scala.util.Random(135L)
    val edges = (1 to 600).map(_ =>
      (rng.nextInt(60).toLong, rng.nextInt(60).toLong))
    for (k <- Seq(2, 5, 9, 40)) {
      assert(run(edges, k) == serialCore(edges, k), s"k=$k")
    }
  }

  test("everything peels away to an empty core when k exceeds max degree") {
    assert(run(Seq((1L, 2L), (2L, 3L)), 5).isEmpty)
  }

  test("superseded per-round checkpoint blocks are released, not accumulated") {
    // a long pendant chain off a triangle peels ONE edge per round:
    // ~28 rounds, each localCheckpoint-ing the survivor frame. Without
    // the Lineage release every round's blocks stay persisted until
    // GC (the 8 GB OOM at 30× scale); with it the persistent-RDD set
    // stays bounded by a small constant.
    val chain = (3L to 30L).sliding(2).map(p => (p(0), p(1))).toSeq
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L)) ++ chain
    val before = spark.sparkContext.getPersistentRDDs.keySet
    assert(run(edges, 2) == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.size <= 3,
      s"per-round checkpoint blocks leaked: ${leaked.size} persistent " +
        "RDDs left behind by one KCore.core call (expected <= 3: the " +
        "final round's frame survives, intermediates must not)")
  }
}
