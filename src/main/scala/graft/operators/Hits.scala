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
    val e = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // score frames are |V|-bounded (≤ 2|E| entries, ~16 B each): under
    // the graph broadcast budget, broadcast them into every half-round
    // join so the edge frame never shuffles or sorts — the planner
    // can't see this (chained agg stats are unknown ⇒ SortMergeJoin of
    // the edge side each half-round); above the budget the joins
    // degrade to the old shuffle form (the only option when |V| rows
    // exceed executor memory).
    val bc: DataFrame => DataFrame =
      if (e.count() <= GraphConf.broadcastMaxEdges(e)) broadcast _ else identity _
    // Intermediate frames are NOT zero-filled against the node set: a
    // node missing from a score frame contributes exactly the 0 the
    // zero-filled row would — only the final output needs the fill.
    // Round 1's authority pass is algebraic (h0 = 1 everywhere makes
    // a1 = in-degree: one aggregation, no join). Together with
    // every-other-round truncation this is the LabelProp constant-
    // factor lesson applied to HITS.
    var auths = e.groupBy(col("v").as("node")).agg(count(lit(1)).as("a"))
    var hubs = e.join(bc(auths.withColumnRenamed("node", "v")), "v")
      .groupBy(col("u").as("node")).agg(sum(col("a")).as("h"))
    for (r <- 2 to rounds) {
      if (r % 2 == 0) hubs = truncate(hubs)
      val a = e.join(bc(hubs.withColumnRenamed("node", "u")), "u")
        .groupBy(col("v").as("node")).agg(sum(col("h")).as("a"))
      auths = a
      hubs = e.join(bc(a.withColumnRenamed("node", "v")), "v")
        .groupBy(col("u").as("node")).agg(sum(col("a")).as("h"))
    }
    val nodes = e.select(col("u").as("node"))
      .union(e.select(col("v"))).distinct()
    val out = nodes
      .join(bc(hubs), Seq("node"), "left")
      .join(bc(auths), Seq("node"), "left")
      .select(col("node"), coalesce(col("h"), lit(0L)).as("hub"),
        coalesce(col("a"), lit(0L)).as("auth"))
    e.unpersist()
    out
  }
}
