package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental maintenance of an additive aggregate view (count/sum per
  * key) under a signed changelog — the materialized-view counterpart of
  * [[MergeApply]]'s row-level MERGE.
  *
  * Reference analog: the observability dashboards aggregate task metrics
  * per (app, stage) continuously as new collector batches land
  * (`deployment/infra/resources/lambda/opensearch-bootstrap/resources/templates/spark-task-metrics.json`
  * keyed documents + the dashboards' sum/percentile panels); re-scanning
  * the full history per refresh is exactly what a maintained view avoids.
  *
  * Scale shape: the delta is reduced FIRST with an algebraic signed
  * aggregation (map-side partial combine — a 100 TB day of events
  * collapses to one row per touched key before any exchange), then meets
  * the view in a single full-outer hash join on the key. Work is
  * O(|touched keys| + |view|) with no rescan of history; with a bucketed
  * view layout (`sources/Bucketing`) the view side's exchange vanishes,
  * making the nightly refresh a map-side merge. Keys whose maintained
  * count reaches zero leave the view, so retract-heavy workloads don't
  * accrete tombstone rows.
  */
object IncrementalView {

  /** Merge a signed delta into an additive (count, sum) view.
    *
    * @param view    current state: keyCols ++ (nCol: long, sumCol: long)
    * @param delta   change rows: keyCols ++ (signCol: +1 insert / -1
    *                retract, valueCol: long measure)
    * @return        maintained view with the same schema as `view`;
    *                keys with merged count <= 0 are dropped
    */
  def applyDelta(view: DataFrame, delta: DataFrame, keyCols: Seq[String],
      nCol: String, sumCol: String, signCol: String,
      valueCol: String): DataFrame = {
    val d = delta.groupBy(keyCols.map(col): _*).agg(
      sum(col(signCol)).cast("long").as("__dn"),
      sum(col(signCol) * col(valueCol)).cast("long").as("__dsum"))
    val joined = view.as("v").join(d.as("d"),
      keyCols.map(k => col(s"v.$k") === col(s"d.$k")).reduce(_ && _),
      "full_outer")
    val outKeys: Seq[Column] =
      keyCols.map(k => coalesce(col(s"v.$k"), col(s"d.$k")).as(k))
    val n = (coalesce(col(s"v.$nCol"), lit(0L)) +
      coalesce(col("d.__dn"), lit(0L))).as(nCol)
    val s = (coalesce(col(s"v.$sumCol"), lit(0L)) +
      coalesce(col("d.__dsum"), lit(0L))).as(sumCol)
    joined.select(outKeys ++ Seq(n, s): _*).filter(col(nCol) > 0)
  }

  /** Build the initial view from base rows: exact count/sum per key. */
  def build(base: DataFrame, keyCols: Seq[String], valueCol: String,
      nCol: String, sumCol: String): DataFrame =
    base.groupBy(keyCols.map(col): _*).agg(
      count(lit(1)).as(nCol),
      sum(col(valueCol)).cast("long").as(sumCol))
}
