package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Top entry paths: the most common opening event-type sequences
  * (first `k` events per entity-day), the product-analytics "how do
  * sessions start" readout that funnels (q60) and transition matrices
  * (q74) don't directly answer.
  *
  * Shape: ONE entity-day hash-agg builds each group's ordered prefix —
  * `collect_list(struct(ts, tie, type))` + row-local `array_sort` +
  * `slice` — bounded by events-per-entity-day, never a window over raw
  * rows; then a path hash-agg whose cardinality is ≤ |types|^k (tiny);
  * top-k via sort on that bounded frame. The (ts, tiebreak) pair must
  * be a total order so the prefix is deterministic under any
  * partitioning.
  */
object SessionPaths {

  /** Output: path (types joined with '>'), n groups opening with it,
    * ordered n desc then path asc, limited to `topK`.
    */
  def topPaths(df: DataFrame, entityCol: String, dayCol: String,
      tsCol: String, tieCol: String, typeCol: String,
      k: Int, topK: Int): DataFrame = {
    val prefix: Column = array_join(
      slice(transform(
        array_sort(collect_list(struct(col(tsCol), col(tieCol), col(typeCol)))),
        x => x(typeCol)), 1, k), ">")
    df.groupBy(col(entityCol), col(dayCol))
      .agg(prefix.as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(topK)
  }
}
