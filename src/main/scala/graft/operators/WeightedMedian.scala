package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group weighted (lower) median: the smallest value whose
  * cumulative weight reaches half the group's total — the
  * volume-weighted "typical price" a plain median misses when row
  * weights vary by orders of magnitude.
  *
  * Deterministic convention: rows sort on (value, tiebreak); the
  * selected row is the first with 2·cumw ≥ totw. All integer
  * arithmetic — the ≥-half test is the cross-multiplied form, no
  * division anywhere.
  *
  * Scale shape: one group-partitioned running-sum window over the
  * sorted group plus a group total (window aggregate over the same
  * partitioning — no extra exchange), then a min_by per group. One
  * exchange keyed on the group.
  */
object WeightedMedian {

  /** Output: groupCol, w_median (value at the weighted lower median),
    * tot_w. Rows with nonpositive weight are ignored.
    */
  def weightedMedian(df: DataFrame, groupCol: String, valueCol: String,
      weightCol: String, tieCol: String): DataFrame = {
    val pos = df.filter(col(weightCol) > 0L)
    val wRun = Window.partitionBy(col(groupCol))
      .orderBy(col(valueCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col(groupCol))
    pos
      .withColumn("__cumw", sum(col(weightCol)).over(wRun))
      .withColumn("__totw", sum(col(weightCol)).over(wAll))
      .filter(col("__cumw") * 2L >= col("__totw"))
      .groupBy(col(groupCol))
      .agg(min_by(col(valueCol), struct(col(valueCol), col(tieCol))).as("w_median"),
        max(col("__totw")).as("tot_w"))
  }
}
