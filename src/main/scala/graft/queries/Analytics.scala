package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Buckets, Skewness, TopK}
import graft.sources.Tables

/** Analytic query layer — one entry per operator family from SURVEY §2,
  * expressed over the driver test tables so the DuckDB oracle can verify
  * them (TESTDATA.md). Each `qNN` has a paired ANSI-SQL oracle in
  * `oracle`; column names and types match exactly (the driver sorts
  * columns by name and hashes values).
  *
  * Determinism rules applied throughout:
  *  - money sums go through exact DECIMAL aggregation then to DOUBLE, so
  *    Spark's parallel partial sums and DuckDB's sequential sum cannot
  *    diverge in floating point;
  *  - integer-valued outputs are cast to LongType (DuckDB row_number /
  *    count are BIGINT);
  *  - time buckets are emitted as 'yyyy-MM-dd' strings (no tz ambiguity);
  *  - every result has a total ORDER BY.
  *
  * Scale notes are per-query; the shared principles: aggregations are
  * single-shuffle with map-side partials, dimension joins are broadcast,
  * filters/projections sit directly on the parquet scan for pushdown.
  */
object Analytics {

  /** Exact-decimal cent value of a 2-dp-valued double column. */
  private def cents(c: Column): Column = c.cast("decimal(18,2)")

  /** 1 - discount as exact decimal. */
  private def oneMinus(c: Column): Column =
    lit(1).cast("decimal(3,2)") - c.cast("decimal(3,2)")

  // ---------------------------------------------------------------------
  // B4-B8: full-scan grouped sums/avg (dashboard "Total ..." metrics).
  // One shuffle on 2 low-cardinality keys; partial agg does ~all the work
  // map-side, so at 100 TB the exchange carries a handful of rows per
  // mapper. Decimal sums for oracle-exact money math.
  def q01PricingSummary(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(sum(cents($"l_quantity")), 2).cast("double").as("sum_qty"),
        round(sum(cents($"l_extendedprice")), 2).cast("double").as("sum_base_price"),
        round(sum(cents($"l_extendedprice") * oneMinus($"l_discount")), 2)
          .cast("double").as("sum_disc_price"),
        round(avg($"l_quantity"), 4).as("avg_qty"),
        round(avg($"l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  // B1-B3: cardinality (exact count-distinct for the oracle; the approx
  // HLL variant — OpenSearch `cardinality` semantics — is
  // Dashboards.approxCardinality (q26, rows-only + error-bound spec,
  // DashboardsSpec) since approx sketches have no DuckDB twin).
  // count(distinct) over 2 keys = two-phase agg (expand + 2 shuffles);
  // fine at scale because keyspace is bounded.
  def q02Cardinality(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .groupBy($"o_orderpriority")
      .agg(
        countDistinct($"o_custkey").as("n_cust"),
        countDistinct($"o_orderkey").as("n_orders"),
        count(lit(1)).as("n_rows"))
      .orderBy($"o_orderpriority")
  }

  // A6: the reference's signature per-group relative-distance skewness,
  // over the events stream table. Single-pass algebraic form (SURVEY §2.1
  // A6): one hash aggregate, one shuffle.
  def q03GroupSkewness(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Skewness.relativeSkew(Tables.events(s, dir), Seq("event_type"), Seq("value"))
      .select(
        $"event_type",
        round($"avg_value", 4).as("avg_value"),
        $"max_value",
        $"min_value",
        round($"value_skewness", 6).as("value_skewness"))
      .orderBy($"event_type")
  }

  // B9/B10: distribution of groups per skewness range bucket — two-tier
  // aggregation (per-user skew, then bucket counts). Mirrors the
  // dashboards' range agg over the stage-agg table.
  def q04SkewBuckets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Skewness.relativeSkew(Tables.events(s, dir), Seq("user_id"), Seq("value"))
      .select($"user_id", $"value_skewness")
      .withColumn("bucket", Buckets.skewBuckets($"value_skewness"))
      .groupBy($"bucket")
      .agg(countDistinct($"user_id").as("n_users"))
      .orderBy($"bucket")
  }

  // B11: terms top-k per group (dashboards' `terms(size 5, order by
  // metric desc)`): top-3 suppliers per nation by account balance.
  // Broadcast the 25-row nation dim; window shuffle is on n_name only.
  def q05TopKPerGroup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sup = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)), $"s_nationkey" === $"n_nationkey")
    TopK.perGroup(sup, Seq($"n_name"), Seq($"s_acctbal".desc, $"s_suppkey"), 3)
      .select($"n_name", $"s_name", $"s_acctbal", $"rk".cast("long").as("rk"))
      .orderBy($"n_name", $"rk")
  }

  // B12: exact percentiles per group (dashboard percentiles panel uses
  // t-digest; exact `percentile` here so DuckDB's quantile_cont matches —
  // both linear-interpolate at rank p*(n-1)). Computed over the
  // integer-valued quantity column: interpolation between integers at
  // decimal-hundredth fractions is exact in both engines, so the doubles
  // are bit-identical (interpolating raw prices can land exactly on a
  // .xx5 rounding boundary where the engines' formulas differ by 1 ulp).
  def q06Percentiles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(
        round(percentile($"l_quantity", lit(0.25)), 2).as("p25"),
        round(percentile($"l_quantity", lit(0.5)), 2).as("p50"),
        round(percentile($"l_quantity", lit(0.75)), 2).as("p75"),
        round(percentile($"l_quantity", lit(0.99)), 2).as("p99"),
        max($"l_quantity").as("max_qty"),
        count(lit(1)).as("n"))
      .orderBy($"l_returnflag")
  }

  // B13/B14: date-histogram over time + cardinality per bucket.
  // Day buckets as strings (tz-proof for the oracle).
  def q07EventsOverTime(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy(date_format(date_trunc("day", $"ts"), "yyyy-MM-dd").as("day"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct($"user_id").as("n_users"))
      .orderBy($"day")
  }

  // B15/B16: per-bucket terms top-k over time — max(value) per
  // (day, event_type), then top-2 types per day.
  def q08TopSeriesOverTime(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = Tables.events(s, dir)
      .groupBy(
        date_format(date_trunc("day", $"ts"), "yyyy-MM-dd").as("day"),
        $"event_type")
      .agg(max($"value").as("max_value"))
    TopK.perGroup(daily, Seq($"day"), Seq($"max_value".desc, $"event_type"), 2)
      .select($"day", $"event_type", $"max_value", $"rk".cast("long").as("rk"))
      .orderBy($"day", $"rk")
  }

  // B17: log search — full-text predicate + projection + sort + limit
  // (the saved search over spark-logs). `contains` pushes a string
  // predicate to the scan.
  def q09LogSearch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .filter($"text".contains("slow") && $"lang" === "en")
      .select($"doc_id", $"lang", $"source", $"n_chars")
      .orderBy($"doc_id")
      .limit(200)
  }

  // B18/B19: dashboard filter controls + relative time range —
  // parameterized predicates feeding an aggregation. Both predicates are
  // parquet-pushed (check PushedFilters in explain).
  def q10FilteredAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .filter(
        $"o_orderstatus" === "F" &&
          $"o_orderdate" >= lit("1996-01-01").cast("timestamp_ntz") &&
          $"o_orderdate" < lit("1999-01-01").cast("timestamp_ntz"))
      .groupBy($"o_orderpriority")
      .agg(
        count(lit(1)).as("n_orders"),
        round(sum(cents($"o_totalprice")), 2).cast("double").as("sum_total"))
      .orderBy($"o_orderpriority")
  }

  // A4: lookup-join enrichment, scaled up: fact ⋈ dims with explicit
  // broadcast of every dimension (supplier/nation/region are fixed-size;
  // at 100 TB the lineitem side never shuffles for this join).
  def q11JoinEnrich(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.supplier(s, dir)), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(Tables.nation(s, dir)), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(s, dir)), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(
        round(sum(cents($"l_extendedprice") * oneMinus($"l_discount")), 2)
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy($"r_name", $"n_name")
  }

  // A10: regex field extraction (the reference pulls taskId/stageId out of
  // MDC taskName; here: key out of a JSON-ish props string) + agg.
  def q12RegexExtract(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .withColumn("k", regexp_extract($"props", "\"k\":\\s*(\\d+)", 1).cast("long"))
      .groupBy($"k")
      .agg(count(lit(1)).as("n"))
      .orderBy($"k")
  }

  // A2/A8: semi-structured parse — from_json over the props payload
  // (the log-ingest path parses Log4j2 JSON the same way).
  def q13JsonParse(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select(
        $"event_id",
        from_json($"props", org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").cast("long").as("k"))
      .orderBy($"event_id")
      .limit(1000)
  }

  // A12: content routing — predicate dispatch by record type; the routed
  // branch is a pushed-down filter + projection (partition pruning when
  // the sink table is partitioned by the route key). The deterministic
  // order is BOUNDED (orderBy+limit ⇒ TakeOrderedAndProject, a
  // per-partition heap + driver merge) — an unbounded global sort of
  // every matched row would become a full range-partition exchange at
  // 100 TB for no analytic value.
  def q14Route(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"value")
      .orderBy($"event_id")
      .limit(100000)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> q01PricingSummary _,
    "q02_cardinality" -> q02Cardinality _,
    "q03_group_skewness" -> q03GroupSkewness _,
    "q04_skew_buckets" -> q04SkewBuckets _,
    "q05_topk_per_group" -> q05TopKPerGroup _,
    "q06_percentiles" -> q06Percentiles _,
    "q07_events_over_time" -> q07EventsOverTime _,
    "q08_top_series_over_time" -> q08TopSeriesOverTime _,
    "q09_log_search" -> q09LogSearch _,
    "q10_filtered_agg" -> q10FilteredAgg _,
    "q11_join_enrich" -> q11JoinEnrich _,
    "q12_regex_extract" -> q12RegexExtract _,
    "q13_json_parse" -> q13JsonParse _,
    "q14_route" -> q14Route _
  )

  /** DuckDB-dialect oracle SQL, one per entry in `all`. */
  val oracle: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))),2) AS DOUBLE) AS sum_qty,
        | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))),2) AS DOUBLE) AS sum_base_price,
        | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))),2) AS DOUBLE) AS sum_disc_price,
        | round(avg(l_quantity),4) AS avg_qty,
        | round(avg(l_discount),4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q02_cardinality" ->
      """SELECT o_orderpriority,
        | count(DISTINCT o_custkey) AS n_cust,
        | count(DISTINCT o_orderkey) AS n_orders,
        | count(*) AS n_rows
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q03_group_skewness" ->
      """SELECT event_type,
        | round(avg(value),4) AS avg_value,
        | max(value) AS max_value,
        | min(value) AS min_value,
        | round(greatest(max(value)-avg(value), avg(value)-min(value)) /
        |       (CASE WHEN max(value)=min(value) THEN 1 ELSE max(value)-min(value) END),6) AS value_skewness
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q04_skew_buckets" ->
      """WITH per_user AS (
        | SELECT user_id,
        |  greatest(max(value)-avg(value), avg(value)-min(value)) /
        |  (CASE WHEN max(value)=min(value) THEN 1 ELSE max(value)-min(value) END) AS skew
        | FROM events GROUP BY 1)
        |SELECT CASE WHEN skew>=0.0 AND skew<0.1 THEN '0.0-0.1'
        |            WHEN skew>=0.1 AND skew<0.5 THEN '0.1-0.5'
        |            WHEN skew>=0.5 AND skew<0.8 THEN '0.5-0.8'
        |            WHEN skew>=0.8 AND skew<=1.0 THEN '0.8-1.0'
        |            ELSE 'other' END AS bucket,
        |       count(DISTINCT user_id) AS n_users
        |FROM per_user GROUP BY 1 ORDER BY 1""".stripMargin,
    "q05_topk_per_group" ->
      """WITH ranked AS (
        | SELECT n_name, s_name, s_acctbal,
        |  row_number() OVER (PARTITION BY n_name ORDER BY s_acctbal DESC, s_suppkey) AS rk
        | FROM supplier JOIN nation ON s_nationkey = n_nationkey)
        |SELECT n_name, s_name, s_acctbal, rk
        |FROM ranked WHERE rk <= 3 ORDER BY n_name, rk""".stripMargin,
    "q06_percentiles" ->
      """SELECT l_returnflag,
        | round(quantile_cont(l_quantity, 0.25),2) AS p25,
        | round(quantile_cont(l_quantity, 0.50),2) AS p50,
        | round(quantile_cont(l_quantity, 0.75),2) AS p75,
        | round(quantile_cont(l_quantity, 0.99),2) AS p99,
        | max(l_quantity) AS max_qty,
        | count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q07_events_over_time" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        | count(*) AS n_events,
        | count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q08_top_series_over_time" ->
      """WITH daily AS (
        | SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
        |        max(value) AS max_value
        | FROM events GROUP BY 1,2),
        |ranked AS (
        | SELECT day, event_type, max_value,
        |  row_number() OVER (PARTITION BY day ORDER BY max_value DESC, event_type) AS rk
        | FROM daily)
        |SELECT day, event_type, max_value, rk
        |FROM ranked WHERE rk <= 2 ORDER BY day, rk""".stripMargin,
    "q09_log_search" ->
      """SELECT doc_id, lang, source, n_chars
        |FROM documents
        |WHERE contains(text, 'slow') AND lang = 'en'
        |ORDER BY doc_id LIMIT 200""".stripMargin,
    "q10_filtered_agg" ->
      """SELECT o_orderpriority,
        | count(*) AS n_orders,
        | CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))),2) AS DOUBLE) AS sum_total
        |FROM orders
        |WHERE o_orderstatus = 'F'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1999-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q11_join_enrich" ->
      """SELECT r_name, n_name,
        | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))),2) AS DOUBLE) AS revenue,
        | count(*) AS n_items
        |FROM lineitem
        | JOIN supplier ON l_suppkey = s_suppkey
        | JOIN nation ON s_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q12_regex_extract" ->
      """SELECT CAST(NULLIF(regexp_extract(props, '"k":\s*(\d+)', 1), '') AS BIGINT) AS k,
        | count(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q13_json_parse" ->
      """SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id LIMIT 1000""".stripMargin,
    "q14_route" ->
      """SELECT event_id, user_id, value
        |FROM events WHERE event_type = 'purchase'
        |ORDER BY event_id LIMIT 100000""".stripMargin
  )
}
