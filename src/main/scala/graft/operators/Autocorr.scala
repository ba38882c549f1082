package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lag-k autocorrelation per series: does a metric echo itself a day
  * (or week) later — the seasonality/trend screen run before
  * forecasting or anomaly-gating a pipeline metric. Same exactness
  * contract as [[Correlate]]: all sufficient statistics are exact
  * BIGINT sums over the lag-joined pairs; the only floating point is
  * the final fixed-shape Pearson r (IEEE sqrt is correctly rounded,
  * so it reproduces across engines, unlike log/exp) + round(6).
  *
  * Shape: the input is an AGGREGATED series (bucket × series), so the
  * lag self-join and the stats agg run on bounded frames — one equi
  * hash join on (series, bucket+k), one hash-agg. Buckets missing
  * either endpoint simply don't pair (inner join), matching the
  * textbook definition on observed pairs.
  */
object Autocorr {

  /** (series, lag, n, r) — r null when either side is constant. */
  def lagK(series: DataFrame, seriesCol: String, bucketCol: String,
      valueCol: String, lags: Seq[Long]): DataFrame = {
    val base = series.select(col(seriesCol).as("__s"),
      col(bucketCol).cast("long").as("__b"),
      col(valueCol).cast("long").as("__v"))
    val lagged = lags.map { k =>
      val a = base.select(col("__s"), col("__b"), col("__v").as("__x"))
      val b = base.select(col("__s"), (col("__b") - k).as("__b"),
        col("__v").as("__y"))
      a.join(b, Seq("__s", "__b")).withColumn("lag", lit(k))
    }.reduce(_ unionAll _)
    val stats = lagged.groupBy(col("__s"), col("lag"))
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
      .select(col("__s").as(seriesCol), col("lag"), col("n"), col("r"))
  }
}
