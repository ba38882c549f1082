package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS hubs & authorities (Kleinberg) on a directed graph, kept in
  * exact integers: no per-round normalization — scores after k rounds
  * are the raw path-count sums (h₀ = 1; a ← Σ_in h; h ← Σ_out a),
  * which is the same ranking the normalized iteration produces (L¹
  * normalization is a positive scalar per round) but bit-exact on any
  * engine and unrollable as a SQL oracle. Growth is bounded by
  * (max degree)^(2k) — k=2 on integer-64 is safe for any graph whose
  * squared-degree sum fits, which a 100 TB bipartite purchase graph
  * does after the usual key-space projection; beyond that, swap to
  * DECIMAL(38,0) sums (the q134 convention).
  *
  * Per half-round: one equi-join of the edge list against the current
  * score frame (the score side is |V|-bounded and broadcast-eligible)
  * + one sum aggregation on uniform node keys. Like [[PageRank]],
  * rounds are a constant and lineage is truncated per round.
  */
object Hits {

  /** (node, hub, auth) after `rounds` full h→a→h updates. Nodes with
    * no outgoing edges have hub 0; no incoming, auth 0 (both appear if
    * they touch any edge).
    */
  def scores(edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int,
      truncate: DataFrame => DataFrame = _.localCheckpoint(true)): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    // the edge set is cached TWICE, hash-partitioned on each half-
    // round's join key (u for the hub→auth pass, v for auth→hub): every
    // half-round join then satisfies its distribution from the cache
    // and only the node-scale score frame moves. The dedup runs
    // partition-local on the by-`u` layout (HashPartitioning(u)
    // satisfies the (u, v) clustering); the by-`v` copy re-reads the
    // first cache, not the source. No per-round broadcasts or count
    // gates — see [[Bfs]] for why the round-11 broadcast machinery was
    // removed; the score sides carry SHUFFLE_HASH hints because their
    // stats-less plans (chained aggs / checkpoints) otherwise plan
    // SortMergeJoin, re-sorting the cached edge frame each half-round.
    val eU = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
      .repartition(col("u")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val eV = eU.repartition(col("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sh: DataFrame => DataFrame = _.hint("shuffle_hash")
    // Intermediate frames are NOT zero-filled against the node set: a
    // node missing from a score frame contributes exactly the 0 the
    // zero-filled row would — only the final output needs the fill.
    // Round 1's authority pass is algebraic (h0 = 1 everywhere makes
    // a1 = in-degree: one aggregation, no join — and exchange-free on
    // the by-`v` layout). Together with every-other-round truncation
    // this is the LabelProp constant-factor lesson applied to HITS.
    var auths = eV.groupBy(col("v").as("node")).agg(count(lit(1)).as("a"))
    var hubs = eV.join(sh(auths.withColumnRenamed("node", "v")), "v")
      .groupBy(col("u").as("node")).agg(sum(col("a")).as("h"))
    for (r <- 2 to rounds) {
      if (r % 2 == 0) hubs = truncate(hubs)
      val a = eU.join(sh(hubs.withColumnRenamed("node", "u")), "u")
        .groupBy(col("v").as("node")).agg(sum(col("h")).as("a"))
      auths = a
      hubs = eV.join(sh(a.withColumnRenamed("node", "v")), "v")
        .groupBy(col("u").as("node")).agg(sum(col("a")).as("h"))
    }
    val nodes = eU.select(col("u").as("node"))
      .union(eU.select(col("v"))).distinct()
    val out = nodes
      .join(sh(hubs), Seq("node"), "left")
      .join(sh(auths), Seq("node"), "left")
      .select(col("node"), coalesce(col("h"), lit(0L)).as("hub"),
        coalesce(col("a"), lit(0L)).as("auth"))
    eU.unpersist(); eV.unpersist()
    out
  }
}
