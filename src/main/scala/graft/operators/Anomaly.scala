package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group z-score outlier detection — the observability "this task
  * read 40× the stage average" alarm, generalized.
  *
  * Determinism contract: the metric is integerized first
  * (`floor(value·scale)`), group sums and sums-of-squares are then
  * EXACT integer aggregates (order-independent), and the final
  * mean/variance/z arithmetic is a fixed-shape double expression over
  * those exact integers — two engines computing this produce
  * bit-identical doubles, unlike naive avg/stddev whose partial-sum
  * order differs per engine.
  *
  * Scale shape: one group aggregate (map-side partials) broadcast back
  * over the scan; the flagged-outlier output is row-local from there.
  */
object Anomaly {

  /** Rows whose |z| > `threshold` within their group. Output: group
    * cols, id col, the integerized metric `val_m`, `z` (rounded 6).
    */
  def zOutliers(
      df: DataFrame,
      groupCols: Seq[String],
      idCol: String,
      valueCol: String,
      scale: Long = 1000L,
      threshold: Double = 3.0): DataFrame = {
    val gcols = groupCols.map(col)
    val vm = floor(col(valueCol) * scale).cast("long")
    val base = df.select((gcols :+ col(idCol) :+ vm.as("val_m")): _*)
    val stats = base.groupBy(gcols: _*).agg(
      count(lit(1)).as("n"),
      sum(col("val_m")).as("s"),
      sum(col("val_m") * col("val_m")).as("sq"))
    // fixed-shape double math over exact integers; sample variance
    val mean = col("s").cast("double") / col("n").cast("double")
    val varS = (col("sq").cast("double") - col("s").cast("double") * col("s").cast("double") / col("n").cast("double")) /
      (col("n").cast("double") - 1.0)
    val z = (col("val_m").cast("double") - mean) / sqrt(varS)
    base.join(broadcast(stats), groupCols)
      .filter(col("n") > 1 && abs(z) > threshold)
      .select((gcols :+ col(idCol) :+ col("val_m") :+ round(z, 6).as("z")): _*)
  }
}
