package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval union per key: merge overlapping-or-touching [start, end)
  * intervals into maximal covered islands — "when was this user/host
  * covered at all", the coverage complement of gap sessionization
  * (q49 cuts on silence ≥ gap; this unions declared spans).
  *
  * Gaps-and-islands on a single key partitioning: an interval opens a
  * new island exactly when its start exceeds the running max end of
  * everything before it (running max, not lag — an early long span
  * must absorb later short ones); the island id is the running sum of
  * those opens, and one aggregation collapses each island. All
  * integer, window runs per key — no global ordering anywhere.
  */
object Intervals {

  /** (key, island_start, island_end, n_merged) per maximal island.
    * Intervals are half-open; touching (`start == prior end`) merges.
    * `tieCol` totalizes the order for identical starts.
    */
  def merge(
      df: DataFrame,
      keyCol: String,
      startCol: String,
      endCol: String,
      tieCol: String): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(startCol), col(tieCol))
    val prevMaxEnd = max(col(endCol))
      .over(byKey.rowsBetween(Window.unboundedPreceding, -1))
    df
      .withColumn("__open",
        when(prevMaxEnd.isNull || col(startCol) > prevMaxEnd, 1L).otherwise(0L))
      .withColumn("__island", sum(col("__open"))
        .over(byKey.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("__island"))
      .agg(
        min(col(startCol)).as("island_start"),
        max(col(endCol)).as("island_end"),
        count(lit(1)).as("n_merged"))
      .drop("__island")
  }
}
