package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2D skyline (Pareto frontier): the rows not strictly dominated under
  * (minimize x, maximize y) — the "cheapest part at every size class"
  * query. q dominates p iff q.x <= p.x, q.y >= p.y and at least one is
  * strict; coincident points dominate neither and are all kept.
  *
  * Scale shape — the classic two-phase distributed skyline:
  *
  *   1. LOCAL phase: each input partition computes its own skyline with
  *      a pid-partitioned sort-sweep (running max-y windows). Dominance
  *      is transitive, so a locally-dominated row is also globally
  *      dominated — the local pass can only drop losers, never a
  *      frontier point. On typical data this collapses each partition
  *      to O(log n) candidates before any exchange.
  *   2. GLOBAL phase: the same sweep over the surviving candidates.
  *      This window is unpartitioned BY DESIGN — its input is the
  *      union of per-partition frontiers, which is at most a small
  *      multiple of the final answer (the worst case — all points on
  *      an anti-chain — means the ANSWER itself is the full set).
  *
  * The sweep test avoids any pairwise join: p is dominated iff
  * max(y over x < p.x) >= p.y  (strict via x)  OR
  * max(y over x = p.x) >  p.y  (strict via y),
  * two codegen'd window aggregates instead of an O(n²) dominance join.
  */
object Skyline {

  def pareto2d(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val local = sweep(df, xCol, yCol, Some(col("__pid")))
    sweep(local, xCol, yCol, None)
  }

  private def sweep(df: DataFrame, xCol: String, yCol: String,
      pid: Option[org.apache.spark.sql.Column]): DataFrame = {
    val in = pid match {
      case Some(_) => df.withColumn("__pid", spark_partition_id())
      case None => df
    }
    val parts = pid.toSeq
    val wLt = Window.partitionBy(parts: _*).orderBy(col(xCol))
      .rangeBetween(Window.unboundedPreceding, -1)
    val wEq = Window.partitionBy(parts :+ col(xCol): _*)
    val m1 = max(col(yCol)).over(wLt)
    val m2 = max(col(yCol)).over(wEq)
    in.withColumn("__dom",
        (coalesce(m1 >= col(yCol), lit(false))) || (m2 > col(yCol)))
      .filter(!col("__dom"))
      .drop("__dom", "__pid")
  }
}
