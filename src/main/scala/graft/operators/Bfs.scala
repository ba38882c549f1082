package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Bounded-hop BFS: minimum hop distance from a seed set to every
  * node reachable within `maxHops` undirected hops — blast-radius /
  * neighborhood-expansion queries (which parts co-occur within 2
  * purchases of a recalled part; which users sit within 3 edges of a
  * banned ring). The bounded form is the scalable one: unbounded
  * reachability is [[ConnectedComponents]]; a fixed hop budget keeps
  * the frontier-join count deterministic, which also lets a
  * non-recursive SQL oracle unroll the exact same `maxHops` rounds.
  *
  * Classic frontier expansion: visited holds min-hop labels, the
  * frontier is only the NEWLY reached nodes (so each round's join
  * touches the growing wave, never the full visited set), and each
  * round is one equi-join frontier⋈edges + an anti-join against
  * visited + a min-dedup. Per-round lineage truncation keeps the plan
  * flat, same discipline as [[KCore]]/[[ConnectedComponents]]. A
  * frontier that goes empty short-circuits the remaining rounds.
  *
  * Per-round exchanges: the frontier and visited frames are
  * checkpointed LogicalRDDs with NO size statistics, so without an
  * explicit hint the planner shuffle-joins the cached adjacency
  * against them — re-exchanging the FULL edge set every hop (measured
  * 22.5 MB/hop on the sf0.1 co-purchase graph). Both probe sides are
  * therefore broadcast under the [[GraphConf]] budget (their exact
  * row counts are free to take — the frames are materialized); above
  * the budget the joins degrade to the shuffle form, the only option
  * when the wave itself is beyond executor memory.
  */
object Bfs {

  /** (node, hop) for every node within `maxHops` of `seeds` (hop 0 =
    * seed itself; seeds absent from the edge set still appear at hop
    * 0). Edges are undirected; duplicates/self-loops ignored.
    *
    * `distinctCanonicalEdges = true` asserts the input is already a
    * DISTINCT canonical (a < b) edge set — what [[Edges.coOccurrence]]
    * emits — so the symmetrized union is distinct by construction and
    * the 2|E|-row dedup exchange is skipped (same contract as
    * [[LabelProp.propagate]]'s flag). Do NOT pass it for raw edge
    * frames.
    */
  def hops(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      seeds: DataFrame,
      seedCol: String,
      maxHops: Int,
      distinctCanonicalEdges: Boolean = false,
      truncate: DataFrame => DataFrame = _.localCheckpoint(true)): DataFrame = {
    require(maxHops >= 0, "maxHops must be >= 0")
    // symmetric adjacency once: frontier joins probe a single table
    val fwd = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
    val sym = fwd.union(fwd.select(col("v").as("u"), col("u").as("v")))
    val adj = (if (distinctCanonicalEdges) sym
               else sym.filter(col("u") =!= col("v")).distinct())
      .persist(StorageLevel.MEMORY_AND_DISK)
    val budget = GraphConf.broadcastMaxEdges(edges)

    var visited = truncate(
      seeds.select(col(seedCol).as("node")).distinct()
        .withColumn("hop", lit(0L)))
    var frontier = visited
    var hop = 0L
    while (hop < maxHops && !frontier.isEmpty) {
      hop += 1
      // counts are cheap scans of materialized checkpoint RDDs — they
      // buy the broadcast decision the stats-less plans can't make
      val fSel = frontier.select(col("node").as("u"))
      val probe = if (frontier.count() <= budget) broadcast(fSel) else fSel
      val vSel = visited.select("node")
      val vSide = if (visited.count() <= budget) broadcast(vSel) else vSel
      val next = probe
        .join(adj, "u").select(col("v").as("node")).distinct()
        .join(vSide, Seq("node"), "left_anti")
        .withColumn("hop", lit(hop))
      val prevFrontier = frontier
      val prevVisited = visited
      frontier = truncate(next)
      visited = truncate(visited.union(frontier))
      // free superseded checkpoint blocks (localCheckpoint persists
      // each round's frame until explicitly released — see Lineage)
      Lineage.releaseSuperseded(prevVisited, visited)
      if (prevFrontier ne prevVisited) Lineage.releaseSuperseded(prevFrontier, visited)
    }
    adj.unpersist()
    visited
  }
}
