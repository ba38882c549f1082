package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CUSUM change-point detection per series: cumulative sum of the
  * deviations from the series' own (lower) median, and the bucket
  * where |CUSUM| peaks — the classic "where did this metric shift"
  * diagnostic, exact and integer-only so two engines agree to the bit.
  *
  * Deterministic conventions: the reference level is the rank-selected
  * LOWER median of the per-bucket values (ties on (value, bucket));
  * the reported change point is the peak |CUSUM| with ties broken by
  * the earliest bucket.
  *
  * Scale shape: everything is partitioned by the series key — one
  * rank window for the median, one running-sum window for the CUSUM,
  * one max_by aggregation for the peak. Three series-keyed exchanges,
  * frames bounded by series length, nothing global.
  */
object ChangePoint {

  /** Output per series: seriesCol, med (reference level), cp_bucket
    * (peak-|CUSUM| bucket), cp_cusum (signed CUSUM there), n_buckets.
    */
  def cusumPeak(df: DataFrame, seriesCol: String, bucketCol: String,
      valueCol: String): DataFrame = {
    val wRank = Window.partitionBy(col(seriesCol))
      .orderBy(col(valueCol), col(bucketCol))
    val wAll = Window.partitionBy(col(seriesCol))
    val withMed = df
      .withColumn("__rn", row_number().over(wRank))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__medv",
        when(col("__rn") === expr("(__n - 1) div 2 + 1"), col(valueCol)))
      .withColumn("__med", max(col("__medv")).over(wAll))
    val wRun = Window.partitionBy(col(seriesCol)).orderBy(col(bucketCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withMed
      .withColumn("__cusum", sum(col(valueCol) - col("__med")).over(wRun))
      .groupBy(col(seriesCol))
      .agg(max(col("__med")).as("med"),
        max_by(col(bucketCol),
          struct(abs(col("__cusum")), -col(bucketCol))).as("cp_bucket"),
        max_by(col("__cusum"),
          struct(abs(col("__cusum")), -col(bucketCol))).as("cp_cusum"),
        count(lit(1)).as("n_buckets"))
  }
}
