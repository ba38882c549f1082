package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Group-wise ordinary-least-squares fit via EXACT integer sufficient
  * statistics: one algebraic aggregation per group collects
  * (n, Σx, Σy, Σxy, Σx²) — fully map-side-combinable, one exchange,
  * no second pass over the data — and the slope is reported as the
  * exact integer pair
  *
  *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
  *
  * plus a milli-scaled floor quotient for human consumption. Exact
  * integers sidestep the FP-summation-order nondeterminism that makes
  * distributed `regr_slope` drift between engines; the representable
  * range (≈9.2e18 for the cross terms) covers group sizes to ~10⁶ rows
  * of cent-scale measures — beyond that, widen the products to
  * DECIMAL(38,0) (same plan shape).
  */
object Regression {

  /** Per-group OLS stats of integer columns (xCol, yCol). Output:
    * groupCols ++ (n, sx, sy, sxy, sxx, slope_num, slope_den,
    * slope_milli) where slope_milli = trunc(1000·num/den) — truncated
    * toward zero, matching both Spark's `div` and DuckDB's INTEGER `//`
    * (NB: DuckDB floors only for FLOAT `//`; integer `//` truncates) —
    * and null for a degenerate den=0 (constant x).
    */
  def olsStats(df: DataFrame, groupCols: Seq[String], xCol: String,
      yCol: String): DataFrame = {
    val agg = df.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(col(xCol)).cast("long").as("sx"),
      sum(col(yCol)).cast("long").as("sy"),
      sum(col(xCol) * col(yCol)).cast("long").as("sxy"),
      sum(col(xCol) * col(xCol)).cast("long").as("sxx"))
    agg.withColumn("slope_num", col("n") * col("sxy") - col("sx") * col("sy"))
      .withColumn("slope_den", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("slope_milli",
        when(col("slope_den") === 0L, lit(null).cast("long"))
          .otherwise(expr("(1000 * slope_num) div slope_den")))
  }
}
