package graft.operators

import org.apache.spark.sql.DataFrame

/** Broadcast budgets for the iterative graph operators ([[KCore]]'s
  * per-round surviving-degree frame, [[Triangles]]' adjacency-array
  * frame). The node/adjacency payloads are ~16 B/entry, so an edge
  * budget is also a memory envelope: the 5M-edge default keeps the
  * broadcast under ~100 MB — safe for ordinary executor sizing. Above
  * the budget every operator degrades gracefully to shuffle joins on
  * uniform node keys (the only option when the frame is beyond
  * executor memory); below it the iterative rounds run exchange-free.
  *
  * Tune per session with
  * `spark.conf.set("spark.graft.graph.broadcastMaxEdges", n)` — e.g.
  * raise it on high-memory executors to keep a 20M-edge graph's rounds
  * broadcast, or set 0 to force the shuffle path (spec-exercised).
  */
object GraphConf {

  val BroadcastMaxEdgesKey = "spark.graft.graph.broadcastMaxEdges"

  val DefaultBroadcastMaxEdges = 5000000L

  def broadcastMaxEdges(df: DataFrame): Long =
    df.sparkSession.conf
      .get(BroadcastMaxEdgesKey, DefaultBroadcastMaxEdges.toString).toLong
}
