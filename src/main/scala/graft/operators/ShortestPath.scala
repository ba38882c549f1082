package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-hop single-source-set weighted shortest paths (distributed
  * Bellman-Ford): `rounds` synchronous relaxations of integer edge
  * weights from a seed set. After round k every node holds the exact
  * minimum-weight path cost over paths of ≤ k edges — deterministic,
  * integer-exact, and unrollable as a SQL oracle round for round.
  *
  * Each relaxation is one equi-join of the current distance frame
  * against the symmetric weighted adjacency (uniform node keys) plus a
  * min-aggregation — O(|E|) per round like [[Bfs]], with the same
  * lineage-truncation discipline. Unlike BFS's frontier optimization,
  * Bellman-Ford must re-relax every labeled node each round (a longer
  * path found later may still be cheaper), so the join carries the
  * full distance frame; the hop bound keeps that cost deterministic.
  */
object ShortestPath {

  /** (node, dist) minimum path weight from any seed within `rounds`
    * edges; unreachable-within-budget nodes are absent. Edges are
    * undirected with per-edge integer weight `wCol` (parallel edges
    * collapse to their minimum weight).
    */
  def boundedBellmanFord(edges: DataFrame, srcCol: String, dstCol: String,
      wCol: String, seeds: DataFrame, seedCol: String, rounds: Int,
      truncate: DataFrame => DataFrame = _.localCheckpoint(true)): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    // canonicalize BEFORE the min-groupBy: grouping (least, greatest)
    // halves the aggregation shuffle vs symmetrize-then-group, and the
    // mirror union after the agg is exchange-free. Identical adjacency:
    // min over both directions either way.
    val fwd = edges.select(col(srcCol).as("u"), col(dstCol).as("v"),
        col(wCol).cast("long").as("w"))
      .filter(col("u") =!= col("v"))
    val canon = fwd
      .select(least(col("u"), col("v")).as("u"),
        greatest(col("u"), col("v")).as("v"), col("w"))
      .groupBy(col("u"), col("v")).agg(min(col("w")).as("w"))
    val adj = canon
      .union(canon.select(col("v").as("u"), col("u").as("v"), col("w")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var dist = truncate(
      seeds.select(col(seedCol).as("node")).distinct()
        .withColumn("dist", lit(0L)))
    val budget = GraphConf.broadcastMaxEdges(edges)
    for (_ <- 1 to rounds) {
      // the distance frame is a checkpointed LogicalRDD with NO size
      // stats, so without the hint the planner re-exchanges the FULL
      // cached adjacency by u every round (measured 35 MB/round on the
      // sf0.1 line-pair graph). |dist| ≤ |V|: broadcast under the
      // GraphConf budget (exact count is a cheap scan of the
      // materialized RDD); above it, degrade to the shuffle join.
      val dSel = dist.withColumnRenamed("node", "u")
      val probe = if (dist.count() <= budget) broadcast(dSel) else dSel
      val relaxed = probe
        .join(adj, "u")
        .select(col("v").as("node"), (col("dist") + col("w")).as("dist"))
      val next = dist.union(relaxed)
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
      val prevDist = dist
      dist = truncate(next)
      // free the superseded round's checkpoint blocks (see Lineage)
      Lineage.releaseSuperseded(prevDist, dist)
    }
    adj.unpersist()
    dist
  }
}
