package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling with gap fill: densify a per-group bucketed
  * series onto a complete [lo, hi] bucket calendar and carry the last
  * observation forward (LOCF) across the gaps — what a dashboard needs
  * to chart sparse metric streams as continuous lines, and what a
  * training pipeline needs before windowed feature extraction over
  * regularly-sampled series.
  *
  * Scale shape: the calendar is `explode(sequence(lo, hi))` per DISTINCT
  * group — |groups| · |buckets| rows, generated on executors, never a
  * driver loop. The fill is a `last(ignoreNulls)` running window
  * partitioned BY GROUP (every partition bounded by the calendar length;
  * no global window). One exchange for the group dedup, one for the
  * left join back, one for the window — all keyed on the group.
  */
object Resample {

  /** Densify `(groupCol, bucketCol, valueCol)` rows onto buckets
    * [lo, hi] and LOCF-fill. Output: groupCol, bucketCol, valueCol
    * (filled; `emptyValue` before the first observation), `observed`
    * (1 where the bucket had a real row).
    */
  def fillForward(observed: DataFrame, groupCol: String, bucketCol: String,
      valueCol: String, lo: Long, hi: Long,
      emptyValue: Long = -1L): DataFrame = {
    val cal = observed.select(col(groupCol)).distinct()
      .withColumn(bucketCol, explode(sequence(lit(lo), lit(hi))))
    val joined = cal.join(observed, Seq(groupCol, bucketCol), "left")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(bucketCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined.select(
      col(groupCol), col(bucketCol),
      coalesce(last(col(valueCol), ignoreNulls = true).over(w),
        lit(emptyValue)).as(valueCol),
      when(col(valueCol).isNull, 0L).otherwise(1L).as("observed"))
  }
}
