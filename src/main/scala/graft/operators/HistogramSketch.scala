package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable histogram sketch table for range percentile queries —
  * the pre-aggregation that answers "p99 over any date range" without
  * rescanning raw data: store per-part (e.g. per-day) fixed-width bin
  * counts, merge by summing, estimate percentiles from the merged
  * counts. The percentile-side sibling of the per-day HLL cardinality
  * table (q70) — but because bins and estimates are PURE INTEGER math
  * (bin = v div width, estimate = bin midpoint), the whole pipeline
  * is deterministic and an oracle can replay it exactly; the only
  * approximation is the publicly-stated ±width/2 value error.
  *
  * Scale shape: parts are one hash aggregation of raw data, and every
  * later merge touches only (parts × bins) rows — the window cumsum
  * runs on the merged BIN frame (bounded by the value range / width),
  * never on raw rows.
  */
object HistogramSketch {

  /** (partCol, bin, n): the mergeable sketch parts. Binning is FLOOR
    * division — Spark's `div` truncates toward zero, which would make
    * bin 0 double-width around the origin (and disagree with engines
    * whose integer division floors, like DuckDB's `//`), so negatives
    * get the explicit −1 correction.
    */
  def parts(df: DataFrame, partCol: String, valueCol: String, width: Long): DataFrame = {
    require(width > 0, "width must be positive")
    df.select(col(partCol),
        expr(s"($valueCol div ${width}L) + (CASE WHEN $valueCol % ${width}L < 0 THEN -1 ELSE 0 END)")
          .as("bin"))
      .groupBy(col(partCol), col("bin"))
      .agg(count(lit(1)).as("n"))
  }

  /** Merge (pre-filtered) parts and estimate percentiles: (p, est)
    * where est is the midpoint of the bin containing the
    * ceil(p·n/100)-th smallest value — within width/2 of the exact
    * percentile value by construction.
    */
  def quantiles(sketchParts: DataFrame, width: Long, ps: Seq[Int]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 1 && p <= 100), "ps in [1,100]")
    val merged = sketchParts.groupBy(col("bin")).agg(sum(col("n")).as("n"))
    val cum = merged
      .withColumn("cum", sum(col("n")).over(
        Window.orderBy(col("bin")).rowsBetween(Window.unboundedPreceding, 0)))
      .crossJoin(broadcast(merged.agg(sum(col("n")).as("total"))))
    val pFrame = sketchParts.sparkSession.createDataFrame(
      ps.map(p => Tuple1(p))).toDF("p")
    cum.crossJoin(broadcast(pFrame))
      // ceil(p·total/100) with pure integers
      .filter(col("cum") >= expr("(p * total + 99) div 100"))
      .groupBy(col("p"))
      .agg(min(col("bin")).as("__b"))
      .select(col("p"),
        (col("__b") * width + lit(width / 2)).as("est"))
  }
}
