package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dashboard panel definitions as data: the JSON shape a saved
  * dashboard stores per panel (kuery filter bar + one aggregation),
  * interpreted into a DataFrame plan. This is the porting surface for
  * the reference's exported dashboard ndjson (cf. the saved-search
  * kuery and per-panel agg specs in
  * deployment/.../dashboards/data-skew.ndjson): a user re-creates a
  * panel by handing over its spec, not by rewriting the query.
  *
  * Supported aggs, all normalized to (panel, bucket, n, val) so any
  * panel set unions into one frame:
  *  - date_histogram: fixed interval over a timestamp field; val = sum
  *    of the metric in cents
  *  - terms: top-`size` buckets by count (count desc, key asc)
  *  - stats: one "all" bucket
  *
  * date_histogram panels accept a pipeline agg over the bucket series:
  * cumulative_sum, derivative, moving_avg (trailing 3-bucket truncating
  * mean), serial_diff (configurable "lag", default 1).
  */
object PanelSpec {

  final case class Spec(
      panel: String,
      kuery: Option[String],
      agg: String,
      field: String,
      intervalMs: Long,
      size: Int,
      metric: String,
      pipeline: Option[String],
      lag: Int = 1)

  def parse(json: String): Spec = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmts: Formats = DefaultFormats
    val j = JsonMethods.parse(json)
    Spec(
      (j \ "panel").extract[String],
      (j \ "kuery").extractOpt[String],
      (j \ "agg").extract[String],
      (j \ "field").extract[String],
      (j \ "interval_ms").extractOpt[Long].getOrElse(86400000L),
      (j \ "size").extractOpt[Int].getOrElse(5),
      (j \ "metric").extractOpt[String].getOrElse("value"),
      (j \ "pipeline").extractOpt[String],
      (j \ "lag").extractOpt[Int].getOrElse(1))
  }

  /** Interpret one panel spec over `df`. The kuery filter compiles to a
    * Catalyst predicate (pushdown-eligible); the metric column is
    * integerized at cents so panel values hash-compare cross-engine.
    */
  def run(df: DataFrame, json: String,
      defaultFields: Seq[String] = Seq.empty): DataFrame = {
    val spec = parse(json)
    val base = spec.kuery.fold(df)(kq =>
      df.filter(Kuery.predicate(df, kq, defaultFields)))
    val cents: Column =
      coalesce(sum(floor(col(spec.metric) * 100).cast("long")), lit(0L))
    spec.agg match {
      case "date_histogram" =>
        val hist = base
          .groupBy(expr(s"unix_millis(${spec.field}) div ${spec.intervalMs}")
            .as("bucket_ix"))
          .agg(count(lit(1)).as("n"), cents.as("val"))
        // pipeline aggs run over the BUCKET series (time-bounded — the
        // global window never sees raw rows); ES-style semantics with
        // the first derivative bucket pinned to 0 for hashability
        val w = org.apache.spark.sql.expressions.Window.orderBy(col("bucket_ix"))
        val piped = spec.pipeline match {
          case None => hist
          case Some("cumulative_sum") =>
            hist.withColumn("val", sum(col("n")).over(
              w.rowsBetween(Long.MinValue, 0)))
          case Some("derivative") =>
            hist.withColumn("val",
              coalesce(col("n") - lag(col("n"), 1).over(w), lit(0L)))
          // moving_fn-style trailing average: the current bucket and
          // its 2 predecessors, truncating integer mean (partial
          // leading windows average over what exists, ES shift=0)
          case Some("moving_avg") =>
            val w3 = w.rowsBetween(-2, 0)
            hist.withColumn("__s", sum(col("n")).over(w3))
              .withColumn("__c", count(lit(1)).over(w3))
              .withColumn("val", expr("__s div __c"))
              .drop("__s", "__c")
          // serial_diff with a configurable lag (spec field "lag",
          // default 1); the first `lag` buckets pin to 0 like the
          // derivative's first bucket
          case Some("serial_diff") =>
            hist.withColumn("val",
              coalesce(col("n") - lag(col("n"), spec.lag).over(w), lit(0L)))
          case Some(other) =>
            throw new IllegalArgumentException(
              s"unsupported pipeline agg '$other'")
        }
        piped.select(lit(spec.panel).as("panel"),
          col("bucket_ix").cast("string").as("bucket"), col("n"), col("val"))
      case "terms" =>
        base.groupBy(col(spec.field).cast("string").as("bucket"))
          .agg(count(lit(1)).as("n"), cents.as("val"))
          .orderBy(col("n").desc, col("bucket"))
          .limit(spec.size)
          .select(lit(spec.panel).as("panel"), col("bucket"), col("n"), col("val"))
      case "stats" =>
        base.agg(count(lit(1)).as("n"), cents.as("val"))
          .select(lit(spec.panel).as("panel"), lit("all").as("bucket"),
            col("n"), col("val"))
      case other =>
        throw new IllegalArgumentException(s"unsupported panel agg '$other'")
    }
  }
}
