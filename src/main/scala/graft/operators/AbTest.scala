package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A/B experiment readout with a DETERMINISTIC integer Welch gate:
  * per metric group, both arms' counts/means/variances and a
  * "significant at ~2σ" flag — the experimentation-platform summary,
  * made bit-reproducible across engines by doing every step in
  * integer arithmetic (truncating division, fixed operation order)
  * instead of floats. The gate is
  *
  *   (mean_b − mean_a)² > 4·(var_a/n_a + var_b/n_b)
  *
  * i.e. |Δ| > 2·SE — each term computed with truncating division, so
  * the flag is a well-defined function of the integer sufficient
  * stats, not of summation order. Variances go through DECIMAL(38,0)
  * (DuckDB: HUGEINT) because `sum²` overflows int64 long before the
  * inputs are big; sums themselves must fit int64 (fine to ~10¹⁸
  * value-units — integerize the metric accordingly).
  *
  * Scale shape: ONE conditional-sum hash-agg over the events (both
  * arms in one pass, map-side combinable) + row-local arithmetic.
  * Nothing else.
  */
object AbTest {

  /** `armBCol`: boolean, true = treatment. Output per group:
    * n_a, n_b, mean_a, mean_b, var_a, var_b (population, truncated),
    * diff, significant (1/0; 0 when an arm is empty).
    */
  def welchGate(df: DataFrame, groupCol: String, armBCol: String,
      valueCol: String): DataFrame = {
    def armSum(b: Boolean, e: org.apache.spark.sql.Column) =
      sum(when(if (b) col(armBCol) else !col(armBCol), e).otherwise(0L))
    def varExpr(n: String, s: String, ss: String) = expr(
      s"(CAST($n AS DECIMAL(38,0)) * $ss - CAST($s AS DECIMAL(38,0)) * $s) div " +
        s"(CAST($n AS DECIMAL(38,0)) * nullif($n, 0))")
    df.groupBy(col(groupCol))
      .agg(
        armSum(b = false, lit(1L)).as("n_a"),
        armSum(b = true, lit(1L)).as("n_b"),
        armSum(b = false, col(valueCol)).as("sum_a"),
        armSum(b = true, col(valueCol)).as("sum_b"),
        armSum(b = false, col(valueCol) * col(valueCol)).as("ss_a"),
        armSum(b = true, col(valueCol) * col(valueCol)).as("ss_b"))
      .withColumn("mean_a", expr("sum_a div nullif(n_a, 0)"))
      .withColumn("mean_b", expr("sum_b div nullif(n_b, 0)"))
      .withColumn("var_a", varExpr("n_a", "sum_a", "ss_a"))
      .withColumn("var_b", varExpr("n_b", "sum_b", "ss_b"))
      .withColumn("diff", col("mean_b") - col("mean_a"))
      .withColumn("significant",
        when(col("diff") * col("diff") >
          lit(4L) * (expr("var_a div nullif(n_a, 0)") +
            expr("var_b div nullif(n_b, 0)")), 1L).otherwise(0L))
      .select(col(groupCol), col("n_a"), col("n_b"), col("mean_a"),
        col("mean_b"), col("var_a"), col("var_b"), col("diff"),
        col("significant"))
  }
}
