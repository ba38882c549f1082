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

  /** Nested multi-level terms top-k — OpenSearch's `terms ⊗ terms ⊗ terms`
    * (SURVEY §2.2 B11: top-5 appId ⊗ top-5 jobId ⊗ top-5 stageId ordered
    * by a sub-aggregated metric, reference data-skew.ndjson line 10).
    *
    * `levels` is (keyColumn, k) from outermost to innermost; the metric at
    * each level is `max(metricCol)` over that level's subtree. Each level
    * ranks ONLY within the parent level's surviving buckets (desc metric,
    * asc key tie-break) — child buckets of pruned parents are never
    * ranked, which is the dashboards' nested-bucket semantics and differs
    * from ranking all buckets then filtering.
    *
    * Scale: ONE leaf-granularity aggregation shuffles the fact table;
    * every later step re-aggregates that already-small frame, and
    * survivor joins are broadcast. Output: level keys + `m1..mn` metric
    * columns + `rk1..rkn` rank columns at leaf granularity.
    */
  def nested(df: DataFrame, levels: Seq[(String, Int)], metricCol: String): DataFrame = {
    require(levels.nonEmpty, "need at least one level")
    val leafKeys = levels.map(_._1)
    val leaf = df.groupBy(leafKeys.map(col): _*).agg(max(col(metricCol)).as("__m"))
    var survivors: DataFrame = null
    levels.zipWithIndex.foreach { case ((key, k), i) =>
      val prefix = levels.take(i + 1).map(_._1)
      val agg = leaf.groupBy(prefix.map(col): _*).agg(max(col("__m")).as(s"m${i + 1}"))
      val scoped =
        if (i == 0) agg
        else agg.join(broadcast(survivors), levels.take(i).map(_._1))
      val w = Window
        .partitionBy(levels.take(i).map(c => col(c._1)): _*)
        .orderBy(col(s"m${i + 1}").desc, col(key))
      survivors = scoped
        .withColumn(s"rk${i + 1}", row_number().over(w).cast("long"))
        .filter(col(s"rk${i + 1}") <= k)
    }
    survivors
  }
}
