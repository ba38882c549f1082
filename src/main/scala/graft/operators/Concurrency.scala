package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Peak-concurrency analysis: for interval-shaped activity (sessions,
  * connections, running jobs) the per-day maximum number simultaneously
  * active, and the earliest minute it was reached — the capacity-
  * planning readout behind "how many executors/connections do we
  * actually need".
  *
  * The scalable shape is the classic sweep-line done as relational
  * algebra: each interval emits a +1 delta at its start minute and a
  * −1 at its (exclusive) end minute, deltas PRE-AGGREGATE to one row
  * per touched minute (a map-combinable hash-agg — this is the step
  * that reduces data-scale input to a bounded frame: ≤1440 rows per
  * day survive regardless of input size), and only that bounded frame
  * sees the running-sum window (day-partitioned, so every day scans in
  * parallel). Concurrency changes only at delta minutes, so the max
  * over change points is the true max.
  *
  * Intervals are clamped to their start day (end_excl capped at the
  * day boundary) so every day's frame is self-contained; a cross-
  * midnight tail is attributed to the day it started in. All math is
  * integer minute indexes (epoch-relative), no calendar/tz arithmetic.
  */
object Concurrency {

  /** `startMsCol`/`endMsCol`: epoch-millisecond interval bounds
    * (end > start). Output per epoch day: day, peak (max concurrent),
    * peak_minute (earliest minute-of-day reaching the peak).
    */
  def dailyPeak(df: DataFrame, startMsCol: String, endMsCol: String): DataFrame = {
    val startMin: Column = expr(s"$startMsCol div 60000L")
    // exclusive end: active during minute m iff startMin <= m < endExcl
    val endExcl: Column = expr(s"($endMsCol + 59999L) div 60000L")
    val day: Column = expr(s"($startMsCol div 60000L) div 1440L")
    val spans = df
      .select(day.as("day"), startMin.as("s"),
        least(endExcl, (day + 1) * lit(1440L)).as("e"))
    val deltas = spans.select(col("day"), col("s").as("minute"), lit(1L).as("d"))
      .unionAll(spans.select(col("day"), col("e").as("minute"), lit(-1L).as("d")))
      .groupBy(col("day"), col("minute")).agg(sum(col("d")).as("delta"))
    val run = Window.partitionBy(col("day")).orderBy(col("minute"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val conc = deltas.withColumn("conc", sum(col("delta")).over(run))
    val peak = Window.partitionBy(col("day"))
    conc.withColumn("peak", max(col("conc")).over(peak))
      .filter(col("conc") === col("peak"))
      .groupBy(col("day"))
      .agg(first(col("peak")).as("peak"),
        (min(col("minute")) % 1440L).as("peak_minute"))
  }
}
