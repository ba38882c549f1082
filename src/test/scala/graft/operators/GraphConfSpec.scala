package graft.operators

import graft.SparkTestBase

/** The shuffled fallback path of the broadcast-budgeted graph
  * operators: with the budget forced to 0 every round/probe runs as a
  * shuffle join, and results must be identical to the broadcast path.
  */
class GraphConfSpec extends SparkTestBase {
  import spark.implicits._

  // two triangles sharing node 3, plus a pendant chain
  private def edges = Seq(
    (1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (3L, 5L),
    (5L, 6L), (6L, 7L)).toDF("s", "d")

  private def withBudget[A](edgeBudget: Long)(body: => A): A = {
    spark.conf.set(GraphConf.BroadcastMaxEdgesKey, edgeBudget.toString)
    try body finally spark.conf.unset(GraphConf.BroadcastMaxEdgesKey)
  }

  test("default budget reads 5M and the conf key overrides it") {
    assert(GraphConf.broadcastMaxEdges(edges) == 5000000L)
    withBudget(123L) {
      assert(GraphConf.broadcastMaxEdges(edges) == 123L)
    }
  }

  test("KCore shuffled fallback (budget 0) matches the broadcast path") {
    def run() = KCore.core(edges, "s", "d", k = 2)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val bc = run()
    val shuffled = withBudget(0L)(run())
    assert(bc == shuffled)
    // sanity: the 2-core is the two fused triangles
    assert(bc.map(_._1) == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("Triangles shuffled fallback (budget 0) matches the broadcast path") {
    def tri() = Triangles.count(edges, "s", "d")
      .as[(Long, Long, Long)].collect().head
    def coef() = Triangles.clusteringCoefficient(edges, "s", "d")
      .orderBy($"node").collect().map(_.toSeq).toSeq
    val (bcT, bcC) = (tri(), coef())
    val (shT, shC) = withBudget(0L)((tri(), coef()))
    assert(bcT == shT)
    assert(bcC == shC)
    assert(bcT == ((7L, 8L, 2L))) // 7 nodes, 8 edges, 2 triangles
  }
}
