package graft.operators

import graft.SparkTestBase

class HierarchySpec extends SparkTestBase {
  import spark.implicits._

  private def flat(edges: Seq[(Long, Long)]): Map[Long, (Long, Long)] =
    Hierarchy.flatten(edges.toDF("node", "parent"), "node", "parent")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap

  test("multi-root forest resolves root and exact depth") {
    // tree A: 1 <- 2 <- 4 <- 5 ; 1 <- 3   tree B: 10 <- 11
    val edges = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 2L), (5L, 4L),
      (10L, 10L), (11L, 10L))
    assert(flat(edges) == Map(
      1L -> (1L, 0L), 2L -> (1L, 1L), 3L -> (1L, 1L), 4L -> (1L, 2L),
      5L -> (1L, 3L), 10L -> (10L, 0L), 11L -> (10L, 1L)))
  }

  test("a deep chain resolves in logarithmic rounds") {
    // chain 0 <- 1 <- 2 <- ... <- 300: depth 300 must fit in 40
    // doubling rounds (needs ~9) — a per-level loop would need 300
    val edges = (1L to 300L).map(i => (i, i - 1)) :+ (0L, 0L)
    val got = flat(edges)
    assert(got(300L) == (0L, 300L) && got(157L) == (0L, 157L) && got(0L) == (0L, 0L))
  }

  test("null parent means root") {
    val edges = Seq((1L, None), (2L, Some(1L))).toDF("node", "parent")
    val got = Hierarchy.flatten(edges, "node", "parent")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 1L, 0L), (2L, 1L, 1L)))
  }

  test("cycles and dangling parents fail loudly") {
    intercept[IllegalArgumentException] {
      Hierarchy.flatten(Seq((1L, 2L), (2L, 1L)).toDF("node", "parent"),
        "node", "parent", maxRounds = 5).collect()
    }
    intercept[IllegalArgumentException] {
      flat(Seq((1L, 1L), (2L, 99L)))
    }
  }
}
