package graft.operators

import scala.util.Random

import graft.SparkTestBase

class ConnectedComponentsSpec extends SparkTestBase {
  import spark.implicits._

  private def ccLabels(edges: Seq[(Long, Long)], maxRounds: Int = 50): Map[Long, Long] =
    ConnectedComponents.labels(edges.toDF("s", "d"), "s", "d", maxRounds)
      .as[(Long, Long)].collect().toMap

  /** Serial union-find reference. */
  private def reference(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // roots are not guaranteed minimal by rank-less union; normalize per component
    val groups = nodes.groupBy(find)
    groups.flatMap { case (_, ns) => val m = ns.min; ns.map(_ -> m) }.toMap
  }

  test("chain collapses to one min-labeled cluster") {
    val got = ccLabels(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("disjoint components, duplicate/reversed/self edges") {
    val got = ccLabels(Seq((2L, 1L), (1L, 2L), (2L, 2L), (7L, 9L), (9L, 7L), (5L, 5L)))
    // pure self-loop node 5 contributes no edge, hence no label row
    assert(got == Map(1L -> 1L, 2L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("matches serial union-find on random graphs") {
    val rnd = new Random(7)
    for (trial <- 0 until 3) {
      val n = 60 + trial * 40
      val edges = Seq.fill(n)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter(e => e._1 != e._2)
      assert(ccLabels(edges) == reference(edges), s"trial $trial")
    }
  }

  test("long chain converges in O(log^2 n) rounds, far under diameter") {
    // a 200-node path has diameter 199; label propagation would need
    // ~199 rounds — the star algorithm must do it in the 50-round cap
    val edges = (0L until 199L).map(i => (i, i + 1))
    val got = ccLabels(edges)
    assert(got.size == 200 && got.values.forall(_ == 0L))
  }

  test("non-long id types (strings) cluster by lexicographic min") {
    val got = ConnectedComponents.labels(
        Seq(("b", "c"), ("a", "b"), ("x", "y")).toDF("s", "d"), "s", "d")
      .as[(String, String)].collect().toMap
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a", "x" -> "x", "y" -> "x"))
  }
}
