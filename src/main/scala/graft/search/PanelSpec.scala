package graft.search

import org.apache.spark.sql.{Column, DataFrame, RelationalGroupedDataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dashboard panel definitions as data: the JSON shape a saved
  * dashboard stores per panel (kuery filter bar + one aggregation),
  * interpreted into a DataFrame plan. This is the porting surface for
  * the reference's exported dashboard ndjson (cf. the saved-search
  * kuery and per-panel agg specs in
  * deployment/.../dashboards/data-skew.ndjson): a user re-creates a
  * panel by handing over its spec, not by rewriting the query.
  *
  * Supported aggs — the reference dashboards' FULL panel vocabulary
  * (data-skew.ndjson lines 3-4, 8-11, 18-20, 24-25) — all normalized
  * to (panel, bucket, n, val) so any panel set unions into one frame:
  *  - date_histogram: fixed interval over a timestamp field
  *    (`interval_ms`), or `"interval": "auto"` resolved through the
  *    normalized OpenSearch ladder from the filtered frame's time range
  *    (calendar rungs label by date_trunc date)
  *  - terms: top-`size` buckets by count (count desc, key asc)
  *  - stats: one "all" bucket
  *  - cardinality: one "all" bucket; val = EXACT distinct count of
  *    `field` (the reference's panel is HLL-approximate; exact is
  *    strictly stronger and hash-comparable — the sketch path exists
  *    separately as Dashboards.approxCardinality, bounds-gated by q26)
  *  - percentiles: one row per requested percent (`percents`, default
  *    [50,95,99]); val = exact type-1 lower quantile of the metric in
  *    cents (rank ceil(p·n/100) over the distinct-cents value domain —
  *    the q172 two-phase shape, never a row-per-event window)
  *  - range: explicit [from,to) buckets over a numeric field
  *    (`ranges`: [{"to":100},{"from":100,"to":500},{"from":500}]);
  *    empty buckets are emitted with n=0 like the reference's range agg
  *  - nested_terms: multi-level terms ⊗ terms ⊗ terms with per-level
  *    top-k order by the sub-aggregated metric (`fields`/`sizes`);
  *    delegates to operators.TopK.nested over ONE leaf-granularity
  *    fact aggregation; bucket = "k1/k2/.../kn" path
  *
  * Metric: `metric` names the value column (integerized at cents so
  * panel values hash-compare cross-engine); `metric_agg` picks the
  * bucket metric — sum (default), max, min, avg (truncating integer
  * mean over the NON-NULL metric values, the ES mean), count — for
  * date_histogram/terms/stats/range panels.
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
      lag: Int = 1,
      metricAgg: String = "sum",
      percents: Seq[Int] = Seq(50, 95, 99),
      ranges: Seq[(Option[Double], Option[Double])] = Seq.empty,
      fields: Seq[String] = Seq.empty,
      sizes: Seq[Int] = Seq.empty,
      auto: Boolean = false)

  def parse(json: String): Spec = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmts: Formats = DefaultFormats
    val j = JsonMethods.parse(json)
    Spec(
      (j \ "panel").extract[String],
      (j \ "kuery").extractOpt[String],
      (j \ "agg").extract[String],
      (j \ "field").extractOpt[String].getOrElse(""),
      (j \ "interval_ms").extractOpt[Long].getOrElse(86400000L),
      (j \ "size").extractOpt[Int].getOrElse(5),
      (j \ "metric").extractOpt[String].getOrElse("value"),
      (j \ "pipeline").extractOpt[String],
      (j \ "lag").extractOpt[Int].getOrElse(1),
      (j \ "metric_agg").extractOpt[String].getOrElse("sum"),
      // json4s extracts a MISSING field as Some(List()), not None
      (j \ "percents").extractOpt[Seq[Int]]
        .filter(_.nonEmpty).getOrElse(Seq(50, 95, 99)),
      (j \ "ranges") match {
        case JArray(rs) => rs.map(r =>
          ((r \ "from").extractOpt[Double], (r \ "to").extractOpt[Double]))
        case _ => Seq.empty
      },
      (j \ "fields").extractOpt[Seq[String]].getOrElse(Seq.empty),
      (j \ "sizes").extractOpt[Seq[Int]].getOrElse(Seq.empty),
      (j \ "interval").extractOpt[String].exists(_.equalsIgnoreCase("auto")))
  }

  /** The "*-100" / "100-500" / "500-*" bucket key the reference's range
    * agg renders (integral bounds print without the trailing ".0").
    */
  private def rangeLabel(lo: Option[Double], hi: Option[Double]): String = {
    def f(d: Double) =
      if (d == math.floor(d) && !d.isInfinite) d.toLong.toString else d.toString
    s"${lo.fold("*")(f)}-${hi.fold("*")(f)}"
  }

  /** Interpret one panel spec over `df`. The kuery filter compiles to a
    * Catalyst predicate (pushdown-eligible); the metric column is
    * integerized at cents so panel values hash-compare cross-engine.
    * A percentiles panel persists its value-domain counts frame (read
    * by both cumsum phases) — long-lived sessions should prefer
    * [[runManaged]] or clear the session cache between panels.
    */
  def run(df: DataFrame, json: String,
      defaultFields: Seq[String] = Seq.empty): DataFrame =
    runTracked(df, json, defaultFields)._1

  /** [[run]] plus a cleanup thunk: invoke AFTER materializing the
    * result to unpersist anything the plan pinned.
    */
  def runManaged(df: DataFrame, json: String,
      defaultFields: Seq[String] = Seq.empty): (DataFrame, () => Unit) = {
    val (out, cached) = runTracked(df, json, defaultFields)
    (out, () => cached.foreach(_.unpersist()))
  }

  private def runTracked(df: DataFrame, json: String,
      defaultFields: Seq[String]): (DataFrame, Seq[DataFrame]) = {
    var cached = Vector.empty[DataFrame]
    val spec = parse(json)
    val base = spec.kuery.fold(df)(kq =>
      df.filter(Kuery.predicate(df, kq, defaultFields)))
    // `"interval": "auto"` overrides interval_ms via the normalized
    // OpenSearch ladder computed from the FILTERED frame's time range
    // (the SavedObjects importer's rule); calendar rungs label by
    // date_trunc. Resolved here so the date_histogram branch below
    // stays a pure fixed-width grouping.
    lazy val autoSpec: Either[Long, String] =
      SavedObjects.resolveAuto(base, col(spec.field).cast("timestamp"))
    val centsRow: Column = floor(col(spec.metric) * 100).cast("long")
    // (n, val) per bucket under the spec's metric_agg; "sum" keeps the
    // original coalesce(sum(cents), 0) shape byte-for-byte
    def aggNV(g: RelationalGroupedDataset): DataFrame = spec.metricAgg match {
      case "sum" =>
        g.agg(count(lit(1)).as("n"), coalesce(sum(centsRow), lit(0L)).as("val"))
      case "max" =>
        g.agg(count(lit(1)).as("n"), coalesce(max(centsRow), lit(0L)).as("val"))
      case "min" =>
        g.agg(count(lit(1)).as("n"), coalesce(min(centsRow), lit(0L)).as("val"))
      case "count" =>
        g.agg(count(lit(1)).as("n")).withColumn("val", col("n"))
      case "avg" => // truncating integer mean of cents; divides by the
        // NON-NULL metric count (ES mean), not the bucket row count
        g.agg(count(lit(1)).as("n"), coalesce(sum(centsRow), lit(0L)).as("__s"),
            count(col(spec.metric)).as("__c"))
          .withColumn("val",
            when(col("__c") > 0, expr("__s div __c")).otherwise(lit(0L)))
          .drop("__s", "__c")
      case other =>
        throw new IllegalArgumentException(s"unsupported metric_agg '$other'")
    }
    val out = spec.agg match {
      case "date_histogram" =>
        val bucketCol =
          if (!spec.auto)
            expr(s"unix_millis(${spec.field}) div ${spec.intervalMs}")
          else autoSpec match {
            case Left(ms) => expr(s"unix_millis(${spec.field}) div $ms")
            case Right(unit) => date_format(
              date_trunc(unit, col(spec.field).cast("timestamp")), "yyyy-MM-dd")
          }
        val hist = aggNV(base.groupBy(bucketCol.as("bucket_ix")))
        // pipeline aggs run over the BUCKET series (time-bounded — the
        // global window never sees raw rows); ES-style semantics with
        // the first derivative bucket pinned to 0 for hashability
        val w = Window.orderBy(col("bucket_ix"))
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
        aggNV(base.groupBy(col(spec.field).cast("string").as("bucket")))
          .orderBy(col("n").desc, col("bucket"))
          .limit(spec.size)
          .select(lit(spec.panel).as("panel"), col("bucket"), col("n"), col("val"))
      case "stats" =>
        aggNV(base.groupBy())
          .select(lit(spec.panel).as("panel"), lit("all").as("bucket"),
            col("n"), col("val"))
      case "cardinality" =>
        base.agg(count(lit(1)).as("n"),
            count_distinct(col(spec.field)).as("val"))
          .select(lit(spec.panel).as("panel"), lit("all").as("bucket"),
            col("n"), col("val"))
      case "percentiles" =>
        // q172 value-domain shape: ranks run over DISTINCT cents
        // (bounded domain), never over raw rows; rank = ceil(p·n/100)
        // (type-1 lower quantile). The running sum is the deterministic
        // two-phase PrefixSum.valueDomainCumsum — a continuous metric's
        // distinct-cents frame approaches the raw row count, so a
        // global Window.orderBy here would be the classic
        // single-reducer trap at 100× scale. counts is persisted (both
        // cumsum phases read it).
        val cents = base.filter(col(spec.metric).isNotNull)
          .select(centsRow.as("v"))
        val counts = cents.groupBy(col("v")).agg(count(lit(1)).as("c"))
          .persist()
        cached :+= counts
        graft.operators.PrefixSum
          .valueDomainCumsum(counts, "v", "c", "cumw", "n")
          .select(col("v"), col("cumw"), col("n"),
            explode(typedLit(spec.percents.map(_.toLong))).as("p"))
          .withColumn("thr", expr("(p * n + 99) div 100"))
          .groupBy(col("p"))
          .agg(first(col("n")).as("n"),
            min(when(col("cumw") >= col("thr"), col("v"))).as("val"))
          .select(lit(spec.panel).as("panel"),
            concat(lit("p"), col("p").cast("string")).as("bucket"),
            col("n"), col("val"))
      case "range" =>
        require(spec.ranges.nonEmpty, "range agg needs 'ranges'")
        // bucket label per row via a codegen'd when-chain ([from, to)
        // half-open like the reference's range agg), then a literal
        // bucket spine left-joins the counts so empty buckets emit n=0
        val labeled = spec.ranges.foldLeft[Option[Column]](None) {
          case (acc, (lo, hi)) =>
            val cond = (lo, hi) match {
              case (Some(a), Some(b)) => col(spec.field) >= a && col(spec.field) < b
              case (Some(a), None) => col(spec.field) >= a
              case (None, Some(b)) => col(spec.field) < b
              case (None, None) => lit(true)
            }
            val lbl = lit(rangeLabel(lo, hi))
            Some(acc.fold(when(cond, lbl))(_.when(cond, lbl)))
        }.get
        val aggd = aggNV(base.filter(col(spec.field).isNotNull)
          .withColumn("bucket", labeled)
          .filter(col("bucket").isNotNull)
          .groupBy(col("bucket")))
        val spine = df.sparkSession
          .createDataFrame(spec.ranges.map(r => Tuple1(rangeLabel(r._1, r._2))))
          .toDF("bucket")
        spine.join(broadcast(aggd), Seq("bucket"), "left")
          .select(lit(spec.panel).as("panel"), col("bucket"),
            coalesce(col("n"), lit(0L)).as("n"),
            coalesce(col("val"), lit(0L)).as("val"))
      case "nested_terms" =>
        require(spec.fields.nonEmpty && spec.fields.length == spec.sizes.length,
          "nested_terms needs matching 'fields' and 'sizes'")
        // ONE leaf-granularity fact aggregation (count + max cents);
        // TopK.nested re-aggregates that already-small frame per level
        // (idempotent at the leaf) and every survivor join broadcasts
        val keys = spec.fields.map(col)
        val leaf = base.groupBy(keys: _*)
          .agg(count(lit(1)).as("__n"),
            coalesce(max(centsRow), lit(0L)).as("__cents"))
        val surv = graft.operators.TopK.nested(
          leaf, spec.fields.zip(spec.sizes), "__cents")
        leaf.join(broadcast(surv.select(spec.fields.map(col): _*)), spec.fields)
          .select(lit(spec.panel).as("panel"),
            concat_ws("/", keys.map(_.cast("string")): _*).as("bucket"),
            col("__n").as("n"), col("__cents").as("val"))
      case other =>
        throw new IllegalArgumentException(s"unsupported panel agg '$other'")
    }
    (out, cached)
  }
}
