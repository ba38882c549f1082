package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Categorical-independence audit: the full r×c contingency table of
  * two categorical columns with each cell's expected count under
  * independence and its lift — the cross-tab a data-quality gate runs
  * to catch confounded dimensions (e.g. one source feeding only one
  * language) before a corpus mix is trusted. Complements [[Drift]],
  * which chi-squares ONE categorical against a reference distribution;
  * this tests two observed columns against each other.
  *
  * All counts are exact int64; `expected` and `lift` are derived from
  * those integers by a fixed two-step float expression (one multiply,
  * one divide — deterministic IEEE ops on exact inputs, identical in
  * any engine that evaluates the same tree). There is NO cross-cell
  * float total: a summed chi² statistic would depend on summation
  * order, so the operator reports per-cell terms and leaves any global
  * roll-up to the (tiny) result frame.
  *
  * Scale shape: one hash-agg over the rows → |r×c| cells; marginals
  * via windows over the CELL frame (r×c rows, metadata-scale), never
  * over the data. Row/col cardinalities are assumed dashboard-scale
  * (≤ ~10⁵ cells); the heavy input side is one map-combinable pass.
  */
object Independence {

  /** Output per observed cell: rowCol, colCol, obs, row_total,
    * col_total, grand_total, expected = row·col/N, lift = obs/expected
    * (both double, 0-safe: totals are positive for observed cells).
    */
  def crosstab(df: DataFrame, rowCol: String, colCol: String): DataFrame = {
    val cells = df.groupBy(col(rowCol), col(colCol))
      .agg(count(lit(1)).as("obs"))
    val byRow = Window.partitionBy(col(rowCol))
    val byCol = Window.partitionBy(col(colCol))
    val all = Window.partitionBy()
    cells
      .withColumn("row_total", sum(col("obs")).over(byRow))
      .withColumn("col_total", sum(col("obs")).over(byCol))
      .withColumn("grand_total", sum(col("obs")).over(all))
      // fixed evaluation shape: (double(row)*col)/N, then obs/expected —
      // mirrored verbatim in the oracle SQL so both engines run the
      // identical IEEE op sequence on identical integer inputs
      .withColumn("expected",
        col("row_total").cast("double") * col("col_total") / col("grand_total"))
      .withColumn("lift", col("obs").cast("double") / col("expected"))
  }
}
