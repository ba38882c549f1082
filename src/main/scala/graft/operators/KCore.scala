package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition membership: iteratively peel nodes of degree
  * < k until the remaining subgraph is stable — the standard
  * "dense cohesive subgraph" extractor (spam/bot rings, co-purchase
  * cores, collaboration cliques) and the graph-robustness complement
  * of [[Triangles]]' local view.
  *
  * Peeling is a monotone fixpoint: each round recomputes degrees (one
  * union + hash-agg on node ids) and keeps edges whose BOTH endpoints
  * meet the bar (two joins on node ids). Rounds beyond the fixpoint
  * are no-ops, so "run until stable" and "run R ≥ fixpoint rounds"
  * agree — which is what lets a non-recursive SQL oracle unroll a
  * fixed R and still match. Round count is bounded by the peeling
  * depth (typically ≪ 10 on heavy-tailed graphs; `maxRounds` guards
  * pathological chains). Same per-round lineage-truncation discipline
  * as [[ConnectedComponents]]: `truncate` fires every round or the
  * plan grows geometrically.
  */
object KCore {

  // Edge budget under which the per-round surviving-degree frame
  // (|V|-bounded, ~16 B/node) is broadcast — session-configurable via
  // GraphConf (spark.graft.graph.broadcastMaxEdges). Above it the
  // round degrades to two shuffle joins on uniform node keys.

  /** (node, core_deg) for every node of the k-core (its degree WITHIN
    * the core, ≥ k by construction). Direction/duplicate edges are
    * ignored; self-loops dropped. Empty result when no core survives.
    */
  def core(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      k: Int,
      maxRounds: Int = 40,
      truncate: DataFrame => DataFrame = _.localCheckpoint(true)): DataFrame = {
    require(k >= 1, "k must be >= 1")
    var e = truncate(edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct())

    def degrees(cur: DataFrame): DataFrame =
      cur.select(col("a").as("node")).union(cur.select(col("b")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))

    var prev = -1L
    var cur = e.count()
    var round = 0
    var cached: DataFrame = null
    while (cur != prev && round < maxRounds) {
      // the surviving-degree frame is |V|-bounded and SHRINKS as rounds
      // peel; under the edge budget broadcast it to both endpoint
      // filters so the edge frame never shuffles inside the loop.
      // Persisted per round: the two broadcast builds would otherwise
      // each re-run the degree aggregation (the Triangles lesson).
      val dAll = degrees(e).filter(col("deg") >= k).persist()
      val d = if (cur <= GraphConf.broadcastMaxEdges(e)) broadcast(dAll) else dAll
      val joined = e
        .join(d.select(col("node").as("a")), "a")
        .join(d.select(col("node").as("b")), "b")
        .select(col("a"), col("b"))
      // eager-truncate only every other round (the LabelProp lesson):
      // off rounds persist instead — the count() below materializes the
      // cache, lineage grows by ONE broadcast-join layer, and the next
      // truncation resets it. Halves the full-frame materializations.
      e = if (round % 2 == 1) truncate(joined) else joined.persist()
      prev = cur
      cur = e.count()
      dAll.unpersist()
      if (cached != null) { cached.unpersist(); cached = null }
      if (round % 2 == 0) cached = e
      round += 1
    }
    if (cached != null) {
      // keep the final frame usable by the caller: truncate before
      // releasing the cache it was built on
      e = truncate(e)
      cached.unpersist()
    }
    require(cur == prev, s"k-core did not stabilize in $maxRounds rounds")
    degrees(e).select(col("node"), col("deg").as("core_deg"))
  }
}
