package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact trailing-window percentile per time bucket — the dashboard's
  * "p95 over the last 7 days" line, computed on raw rows so it is
  * hash-exact (rank arithmetic, no interpolation): the selected value
  * is the one at row_number `floor(p·(n−1)) + 1` in (value, tie)
  * order, the [[Winsorize]]/equi-depth rank convention.
  *
  * Shape: the bucket spine (distinct buckets — tiny) broadcasts into a
  * range-condition join that replicates each row to the ≤`window`
  * buckets it participates in, then one shuffle on the bucket key
  * sorts each window frame. Replication is bounded by the window
  * length (×7 here), not by data size. This is the exact path; at
  * raw-row volumes where a ×7 replication of a day's data no longer
  * sorts comfortably per bucket, the mergeable-sketch path
  * ([[HistogramSketch]], q88) is the same query with bounded error.
  */
object RollingPercentile {

  /** Per bucket: n_events (rows in the trailing window) and the exact
    * `pNum/100`-percentile of `valueCol` (long) over those rows.
    * Buckets with no preceding data still report over whatever the
    * trailing range holds (they always contain their own rows).
    */
  def trailingExact(df: DataFrame, bucketCol: String, valueCol: String,
      tieCol: String, window: Int, pNum: Int): DataFrame = {
    require(window >= 1 && pNum >= 0 && pNum <= 100, "bad window/percentile")
    val spine = df.select(col(bucketCol).as("__b")).distinct()
    val replicated = df.join(broadcast(spine),
      col(bucketCol).between(col("__b") - (window - 1), col("__b")))
    val frame = Window.partitionBy(col("__b"))
    val ordered = frame.orderBy(col(valueCol), col(tieCol))
    replicated
      .withColumn("__rn", row_number().over(ordered))
      .withColumn("__n", count(lit(1)).over(frame))
      .filter(col("__rn") === expr(s"($pNum * (__n - 1)) div 100 + 1"))
      .select(col("__b").as(bucketCol), col("__n").as("n_events"),
        col(valueCol).as(s"p${pNum}_" + valueCol))
  }
}
