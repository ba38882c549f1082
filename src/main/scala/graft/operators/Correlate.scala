package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise Pearson correlation between named series sharing a bucket
  * axis (e.g. per-day metric totals per event type): the dashboard
  * "which metrics move together" matrix.
  *
  * Input is LONG format (bucket, series, value:long). All sufficient
  * statistics (n, Σx, Σy, Σx², Σy², Σxy) are exact BIGINT sums —
  * order-independent, oracle-replayable; the only floating point is
  * the final fixed-shape r = (nΣxy−ΣxΣy) / (√(nΣx²−Σx²)·√(nΣy²−Σy²))
  * + round(6), the q67 convention. Correlation runs over buckets
  * PRESENT IN BOTH series (inner join on the bucket axis).
  *
  * Scale shape: one equi-join on the bucket key, one aggregation on
  * (series_a, series_b) — both frames are AGGREGATES (|buckets|·
  * |series| rows), never raw events; the pair count is |series|²,
  * dashboard-sized. Callers keep values scaled so n·Σxy fits a long
  * (quantize coarser upstream when series values are huge).
  */
object Correlate {

  /** (series_a, series_b, n, r) for every series_a < series_b. */
  def pairwisePearson(
      series: DataFrame,
      bucketCol: String,
      seriesCol: String,
      valueCol: String): DataFrame = {
    val a = series.select(col(bucketCol).as("__bk"),
      col(seriesCol).as("series_a"), col(valueCol).cast("long").as("__x"))
    val b = series.select(col(bucketCol).as("__bk"),
      col(seriesCol).as("series_b"), col(valueCol).cast("long").as("__y"))
    val stats = a.join(b, Seq("__bk"))
      .filter(col("series_a") < col("series_b"))
      .groupBy(col("series_a"), col("series_b"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__y") * col("__y")).as("__syy"),
        sum(col("__x") * col("__y")).as("__sxy"))
    val num = (col("n") * col("__sxy") - col("__sx") * col("__sy")).cast("double")
    val den = sqrt((col("n") * col("__sxx") - col("__sx") * col("__sx")).cast("double")) *
      sqrt((col("n") * col("__syy") - col("__sy") * col("__sy")).cast("double"))
    stats
      .withColumn("r", when(den === 0.0, lit(null)).otherwise(round(num / den, 6)))
      .select(col("series_a"), col("series_b"), col("n"), col("r"))
  }
}
