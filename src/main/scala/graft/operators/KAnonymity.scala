package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** K-anonymity audit over a quasi-identifier column set: how many rows
  * sit in QI-equivalence classes smaller than k — i.e. are
  * re-identifiable by joining the released columns against an external
  * source. The standard privacy gate before publishing a training
  * extract or a metrics table with user-adjacent dimensions.
  *
  * Scale shape: one hash aggregation on the QI tuple (map-side combine
  * collapses each class within partitions first), then one tiny
  * aggregate over the class-size table — class count is bounded by the
  * QI domain product, not the row count. Skewed giant classes are just
  * big counts; they never concentrate rows.
  */
object KAnonymity {

  /** Per-class sizes: one row per distinct QI tuple with `class_size`. */
  def classSizes(df: DataFrame, qiCols: Seq[String]): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    df.groupBy(qiCols.map(col): _*).agg(count(lit(1)).as("class_size"))
  }

  /** One-row audit summary for threshold `k`: total rows/classes, the
    * classes and rows below k, and the smallest/largest class. A
    * release satisfies k-anonymity iff `rows_at_risk` = 0.
    */
  def audit(df: DataFrame, qiCols: Seq[String], k: Long): DataFrame = {
    require(k >= 1, "k must be >= 1")
    classSizes(df, qiCols).agg(
      sum(col("class_size")).as("n_rows"),
      count(lit(1)).as("n_classes"),
      sum(when(col("class_size") < k, 1L).otherwise(0L)).as("classes_at_risk"),
      sum(when(col("class_size") < k, col("class_size")).otherwise(0L))
        .as("rows_at_risk"),
      min(col("class_size")).as("min_class"),
      max(col("class_size")).as("max_class"))
  }
}
