package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact two-sample Kolmogorov–Smirnov distance as a distribution
  * drift gate (train/serve skew, source comparison). The statistic
  *   D = max_x |F_a(x) − F_b(x)|
  * is computed cross-multiplied in integers — |C_a(x)·n_b −
  * C_b(x)·n_a| — so there is no FP division anywhere and both engines
  * agree exactly; the reported ppm is the floor of D·10⁶.
  *
  * Shape: one (group, value) count aggregation over the raw data (the
  * only event-scale shuffle), then cumulative-count windows over the
  * DISTINCT value domain. The domain is quantized (integer cents), so
  * the unpartitioned cumulative window runs over |distinct values|
  * rows — bounded by the value domain, not the data; for an unbounded
  * domain, swap the final window for the two-pass per-partition-offset
  * scheme GlobalRank uses.
  */
object KsTest {

  /** One-row KS comparison of `valueCol` (integer) between the two
    * groups named `a` and `b` in `groupCol`. Output: n_a, n_b, d_num
    * (max |C_a·n_b − C_b·n_a|), at_value (smallest value attaining
    * it), ks_ppm (floor of 10⁶·d_num / (n_a·n_b)).
    */
  def twoSample(df: DataFrame, groupCol: String, valueCol: String,
      a: String, b: String): DataFrame = {
    val counts = df
      .filter(col(groupCol) === a || col(groupCol) === b)
      .groupBy(col(valueCol).cast("long").as("v"))
      .agg(
        sum(when(col(groupCol) === a, 1L).otherwise(0L)).as("na_v"),
        sum(when(col(groupCol) === b, 1L).otherwise(0L)).as("nb_v"))
    val wCum = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counts
      .withColumn("ca", sum(col("na_v")).over(wCum))
      .withColumn("cb", sum(col("nb_v")).over(wCum))
    val tot = cum.agg(max(col("ca")).as("n_a"), max(col("cb")).as("n_b"))
    // cross-multiplied products in DECIMAL(38,0) BEFORE the multiply
    // (Spark int64 wraps silently while DuckDB promotes to HUGEINT, so
    // an int64 product overflow would make the engines silently
    // diverge — the q175/q134 convention). d_num is cast back to
    // BIGINT for the driver's schema compare: exact while the gap fits
    // int64, null (never wrapped) beyond it; ks_ppm ≤ 10⁶ always fits.
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val gaps = cum.crossJoin(broadcast(tot))
      .withColumn("gap", abs(col("ca").cast(dec) * col("n_b") -
        col("cb").cast(dec) * col("n_a")))
    gaps
      .orderBy(col("gap").desc, col("v"))
      .limit(1)
      .select(col("n_a"), col("n_b"), col("gap").cast("long").as("d_num"),
        col("v").as("at_value"),
        expr("CAST((gap * 1000000) div " +
          "(CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)").as("ks_ppm"))
  }
}
