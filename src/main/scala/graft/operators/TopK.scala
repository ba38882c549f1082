package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Top-k rows per group — the engine-side equivalent of the reference
  * dashboards' `terms(field, size: k, order by metric desc)` aggregation
  * (SURVEY §2.2 B11/B12/B15: size 5 / 100).
  *
  * Formulation: `row_number()` over `Window.partitionBy(group).orderBy(...)`
  * then `rank <= k`. Catalyst plans this as one shuffle on the group keys +
  * a per-partition sort; AQE handles skewed groups. Callers MUST pass a
  * total order (include a tie-breaker key) or the result is
  * nondeterministic across runs/cluster layouts.
  */
object TopK {

  /** Keep the top `k` rows of each group, ranked by `order` (pass `desc`
    * columns for "largest first"). Adds `rankCol` (1-based) to the output —
    * keeping it makes downstream assertions and oracle comparison exact.
    */
  def perGroup(
      df: DataFrame,
      groupCols: Seq[Column],
      order: Seq[Column],
      k: Int,
      rankCol: String = "rk"): DataFrame = {
    val w = Window.partitionBy(groupCols: _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= k)
  }

  /** Global top-k (no grouping): a total sort is unnecessary — Spark's
    * `orderBy.limit(k)` plans TakeOrderedAndProject (per-partition heap +
    * driver merge), which is the scale-safe form.
    */
  def global(df: DataFrame, order: Seq[Column], k: Int): DataFrame =
    df.orderBy(order: _*).limit(k)
}
