package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Functional-dependency audit (profiling primitive): for a candidate
  * FD lhs → rhs, how badly does the data violate it? One hash
  * aggregation on the LHS key per candidate — FD *discovery* at scale
  * is just this audit fanned out over candidate pairs, so the unit
  * cost is the thing to get right: a single groupBy + count-distinct,
  * no joins, no windows.
  *
  * Violation metric is row-weighted and integer-exact: viol_ppm =
  * ⌊10⁶ · (rows in LHS groups with >1 distinct RHS) / total rows⌋.
  */
object FdAudit {

  /** One-row audit of `lhs → rhs` in `df`: fd (the given name), n_lhs
    * (distinct LHS values), n_violating_lhs (LHS values with >1
    * distinct RHS), max_rhs (worst per-LHS distinct RHS count),
    * viol_ppm (row-weighted, see above).
    */
  def audit(df: DataFrame, fdName: String, lhs: String, rhs: String): DataFrame =
    df.groupBy(col(lhs))
      .agg(count(lit(1)).as("n"), countDistinct(col(rhs)).as("nd"))
      .agg(
        count(lit(1)).as("n_lhs"),
        sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_violating_lhs"),
        max(col("nd")).as("max_rhs"),
        expr("sum(case when nd > 1 then n else 0 end) * 1000000" +
          " div sum(n)").as("viol_ppm"))
      .select(lit(fdName).as("fd"), col("n_lhs"), col("n_violating_lhs"),
        col("max_rhs"), col("viol_ppm"))
}
