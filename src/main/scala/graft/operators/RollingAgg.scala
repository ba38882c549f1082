package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trailing moving-window aggregates over a per-group bucketed series:
  * moving sum, count and truncated integer mean of the last k
  * OBSERVATIONS (rows, not calendar buckets — compose with
  * [[Resample.fillForward]] first when calendar semantics are wanted
  * on a gapped series).
  *
  * Scale shape: a single `rowsBetween(-(k-1), 0)` window PARTITIONED BY
  * THE GROUP — each partition's frame is bounded by that group's series
  * length, nothing global; one exchange keyed on the group. The mean is
  * `sum div n` (truncating integer division, = DuckDB's integer `//`),
  * keeping the output exact across engines.
  */
object RollingAgg {

  /** Output: groupCol, bucketCol, valueCol, mov_sum, mov_n, mov_avg
    * over the trailing `k` observations (including the current one).
    */
  def trailing(df: DataFrame, groupCol: String, bucketCol: String,
      valueCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(bucketCol))
      .rowsBetween(-(k - 1L), Window.currentRow)
    df.select(col(groupCol), col(bucketCol), col(valueCol))
      .withColumn("mov_sum", sum(col(valueCol)).over(w))
      .withColumn("mov_n", count(lit(1)).over(w))
      .withColumn("mov_avg", expr("mov_sum div mov_n"))
  }
}
