package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Composite, SignificantTerms}
import graft.sources.Tables

/** OpenSearch/ES aggregation-parity pack: the dashboard aggs beyond
  * plain terms/date_histogram that the reference's OpenSearch query
  * surface exposes — significant_terms, adjacency_matrix, rare_terms,
  * rate + weighted_avg, moving_fn/serial_diff pipelines, and composite
  * paging. Each rebuilt as exact-integer Spark plans with DuckDB
  * oracles (reference dashboards export:
  * deployment/infra/resources/lambda/opensearch-bootstrap/resources/
  * dashboards/data-skew.ndjson).
  */
object SearchAggQueries {

  // ---------------------------------------------------------------- q207

  // Significant terms: which props-k deciles are over-represented among
  // error events vs the whole stream — the root-cause drill-down agg.
  // JLH score in exact ppm (see SignificantTerms). One hash agg + a
  // 1-row broadcast; top-10 TakeOrdered.
  def q207SignificantTerms(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .withColumn("k", get_json_object($"props", "$.k").cast("long"))
    SignificantTerms.jlh(ev, expr("k div 10"), $"event_type" === "error", 10)
  }

  // ---------------------------------------------------------------- q208

  // Adjacency-matrix agg: named filters a/b/c and every pairwise
  // intersection, counted in ONE conditional-aggregation pass (the ES
  // adjacency_matrix agg; filters are row-local booleans so no filter
  // is ever a separate scan). stack() emits the matrix cells as rows.
  def q208AdjacencyMatrix(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select(
        ($"event_type" === "purchase").as("a"),
        ($"value" >= 100.0).as("b"),
        (get_json_object($"props", "$.k").cast("long") >= 50L).as("c"))
      .agg(
        sum(when($"a", 1L).otherwise(0L)).as("na"),
        sum(when($"b", 1L).otherwise(0L)).as("nb"),
        sum(when($"c", 1L).otherwise(0L)).as("nc"),
        sum(when($"a" && $"b", 1L).otherwise(0L)).as("nab"),
        sum(when($"a" && $"c", 1L).otherwise(0L)).as("nac"),
        sum(when($"b" && $"c", 1L).otherwise(0L)).as("nbc"))
      .select(expr(
        "stack(6, 'a', na, 'a&b', nab, 'a&c', nac, 'b', nb, 'b&c', nbc, 'c', nc)")
        .as(Seq("cell", "n")))
      .orderBy($"cell")
  }

  // ---------------------------------------------------------------- q209

  // Rare-terms agg: the long-tail counterpart of top-k terms — buckets
  // whose doc count is AT MOST max_doc_count. Thresholds are scale-free
  // fractions of the total (half/quarter/full mean over the 100-value
  // term domain) so the query is meaningful at every SF. One term agg
  // (101 rows), a 1-row broadcast total, one stacked conditional pass.
  def q209RareTerms(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // persisted: the total below references the term counts a second
    // time; unpersisted, each reference re-runs the events scan
    val counts = Tables.events(s, dir)
      .withColumn("k", get_json_object($"props", "$.k").cast("long"))
      .filter($"k".isNotNull)
      .groupBy($"k").agg(count(lit(1)).as("c"))
      .persist()
    val tot = counts.agg(sum($"c").as("__tot"))
    val cuts = Seq(400, 200, 100) // divisor → max_doc_count = total div d
    val aggs = cuts.flatMap(d => Seq(
      sum(when($"c" <= expr(s"__tot div $d"), 1L).otherwise(0L)).as(s"t$d"),
      coalesce(sum(when($"c" <= expr(s"__tot div $d"), $"c")), lit(0L)).as(s"s$d"),
      max(expr(s"__tot div $d")).as(s"m$d")))
    val stacked = cuts.map(d => s"m$d, t$d, s$d").mkString(", ")
    counts.crossJoin(broadcast(tot))
      .agg(aggs.head, aggs.tail: _*)
      .select(expr(s"stack(${cuts.size}, $stacked)")
        .as(Seq("max_doc_count", "n_rare_terms", "n_rare_docs")))
      .orderBy($"max_doc_count")
  }

  // ---------------------------------------------------------------- q210

  // Rate + weighted_avg metrics per calendar month of lineitem
  // shipments: the ES rate agg (count normalized per day, here exact
  // ppm over the true month length) and weighted_avg (discount in
  // basis points weighted by quantity, cross-multiplied integer
  // division). One map-side-combinable hash agg.
  def q210RateWeighted(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .select(
        date_format(date_trunc("month", $"l_shipdate"), "yyyy-MM").as("month"),
        dayofmonth(last_day($"l_shipdate")).cast("long").as("days"),
        floor($"l_discount" * 10000).cast("long").as("disc_bp"),
        $"l_quantity".cast("long").as("qty"))
      .groupBy($"month", $"days")
      .agg(
        count(lit(1)).as("n"),
        sum($"disc_bp" * $"qty").as("__dw"),
        sum($"qty").as("__q"))
      .select($"month", $"n",
        expr("n * 1000000 div days").as("rate_per_day_ppm"),
        expr("__dw div __q").as("w_avg_disc_bp"))
      .orderBy($"month")
  }

  // ---------------------------------------------------------------- q211

  // moving_fn / serial_diff pipeline aggs from panel specs: a trailing
  // 3-day moving average of view traffic and a lag-7 serial difference
  // of clicks (the week-over-week daily delta), both over the daily
  // bucket series — windows never see raw rows.
  def q211PanelMoving(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val specs = Seq(
      """{"panel": "p1_view_movavg", "kuery": "event_type.keyword: view",
        | "agg": "date_histogram", "field": "ts", "pipeline": "moving_avg"}""".stripMargin,
      """{"panel": "p2_click_wow", "kuery": "event_type.keyword: click",
        | "agg": "date_histogram", "field": "ts", "pipeline": "serial_diff",
        | "lag": 7}""".stripMargin)
    specs.map(graft.search.PanelSpec.run(ev, _))
      .reduce(_.unionAll(_))
      .orderBy($"panel", $"bucket")
  }

  // ---------------------------------------------------------------- q212

  // Composite-agg paging: (event_type, day) buckets walked in keyset
  // order, 3 pages of 40 resuming from each page's after-key — the agg
  // that scales past one response. The page walk is a bounded driver
  // round-trip (≤ 40 rows per collect) over a persisted bucket frame;
  // the oracle replays it as a global rank, which is equivalent iff the
  // after-key filter is correct.
  def q212CompositePages(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val buckets = Tables.events(s, dir)
      .groupBy($"event_type",
        expr("unix_millis(ts) div 86400000").as("day"))
      .agg(count(lit(1)).as("n"),
        coalesce(sum(floor($"value" * 100).cast("long")), lit(0L)).as("cents"))
    Composite.pages(buckets, Seq("event_type", "day"), 40, 3)
      .orderBy($"page", $"event_type", $"day")
  }

  // ---------------------------------------------------------------- q218

  // Geo-grid bucket agg at two zoom levels (the ES geohash_grid
  // precision ladder) over the deterministic user lattice (q165's
  // coordinates): ONE data-scale aggregation to the fine grid, the
  // coarse level re-aggregated from the fine CELL frame (coarse cell =
  // fine cell div 3 — cells nest exactly), top-10 cells per level.
  // Windows only ever see the bounded cell frame.
  def q218GeoGridBuckets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val fine = Tables.events(s, dir)
      .filter($"user_id".isNotNull && $"user_id" >= 0)
      .select($"user_id").distinct()
      .select(expr("((user_id * 7919) % 180000) div 10000").as("cx"),
        expr("((user_id * 104729) % 360000) div 20000").as("cy"))
      .groupBy($"cx", $"cy").agg(count(lit(1)).as("n"))
      .persist() // referenced by both zoom levels
    val coarse = fine
      .groupBy(expr("cx div 3").as("cx"), expr("cy div 3").as("cy"))
      .agg(sum($"n").as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"precision")
      .orderBy($"n".desc, $"cx", $"cy")
    fine.withColumn("precision", lit("fine"))
      .unionAll(coarse.withColumn("precision", lit("coarse")))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 10).drop("rk")
      .select($"precision", $"cx", $"cy", $"n")
      .orderBy($"precision", $"n".desc, $"cx", $"cy")
  }

  // -------------------------------------------------------------- maps

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q218_geo_grid_buckets" -> q218GeoGridBuckets _,
    "q207_significant_terms" -> q207SignificantTerms _,
    "q208_adjacency_matrix" -> q208AdjacencyMatrix _,
    "q209_rare_terms" -> q209RareTerms _,
    "q210_rate_weighted" -> q210RateWeighted _,
    "q211_panel_moving" -> q211PanelMoving _,
    "q212_composite_pages" -> q212CompositePages _)

  val oracle: Map[String, String] = Map(
    "q218_geo_grid_buckets" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events
        |       WHERE user_id IS NOT NULL AND user_id >= 0),
        |f AS (SELECT ((user_id * 7919) % 180000) // 10000 AS cx,
        |       ((user_id * 104729) % 360000) // 20000 AS cy, count(*) AS n
        |      FROM u GROUP BY 1, 2),
        |c AS (SELECT cx // 3 AS cx, cy // 3 AS cy, sum(n) AS n FROM f GROUP BY 1, 2),
        |b AS (SELECT 'fine' AS precision, cx, cy, n FROM f
        |      UNION ALL SELECT 'coarse', cx, cy, n FROM c),
        |r AS (SELECT *, row_number() OVER
        |       (PARTITION BY precision ORDER BY n DESC, cx, cy) AS rk FROM b)
        |SELECT precision, CAST(cx AS BIGINT) AS cx, CAST(cy AS BIGINT) AS cy,
        | CAST(n AS BIGINT) AS n
        |FROM r WHERE rk <= 10 ORDER BY precision, n DESC, cx, cy""".stripMargin,
    "q207_significant_terms" ->
      """WITH t AS (SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) // 10 AS term,
        |        CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS fg
        |       FROM events
        |       WHERE json_extract_string(props, '$.k') IS NOT NULL),
        |a AS (SELECT term, CAST(sum(fg) AS BIGINT) AS fg_n,
        |       CAST(count(*) AS BIGINT) AS bg_n FROM t GROUP BY 1),
        |tot AS (SELECT sum(fg_n) AS fg_tot, sum(bg_n) AS bg_tot FROM a),
        |p AS (SELECT term, fg_n, bg_n,
        |       CAST(fg_n * 1000000 // fg_tot AS BIGINT) AS fg_ppm,
        |       CAST(bg_n * 1000000 // bg_tot AS BIGINT) AS bg_ppm
        |      FROM a, tot WHERE fg_n > 0),
        |sc AS (SELECT *, (CASE WHEN fg_ppm >= bg_ppm THEN 1 ELSE -1 END) *
        |        CAST(abs(fg_ppm - bg_ppm) * fg_ppm // bg_ppm AS BIGINT) AS score_ppm
        |       FROM p WHERE bg_ppm > 0)
        |SELECT term, fg_n, bg_n, fg_ppm, bg_ppm, CAST(score_ppm AS BIGINT) AS score_ppm
        |FROM sc ORDER BY score_ppm DESC, term LIMIT 10""".stripMargin,
    "q208_adjacency_matrix" ->
      """WITH f AS (SELECT event_type = 'purchase' AS a, value >= 100.0 AS b,
        |        CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50 AS c
        |       FROM events),
        |g AS (SELECT
        |       CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |       CAST(sum(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT) AS nb,
        |       CAST(sum(CASE WHEN c THEN 1 ELSE 0 END) AS BIGINT) AS nc,
        |       CAST(sum(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS nab,
        |       CAST(sum(CASE WHEN a AND c THEN 1 ELSE 0 END) AS BIGINT) AS nac,
        |       CAST(sum(CASE WHEN b AND c THEN 1 ELSE 0 END) AS BIGINT) AS nbc
        |      FROM f)
        |SELECT 'a' AS cell, na AS n FROM g UNION ALL
        |SELECT 'a&b' AS cell, nab AS n FROM g UNION ALL
        |SELECT 'a&c' AS cell, nac AS n FROM g UNION ALL
        |SELECT 'b' AS cell, nb AS n FROM g UNION ALL
        |SELECT 'b&c' AS cell, nbc AS n FROM g UNION ALL
        |SELECT 'c' AS cell, nc AS n FROM g
        |ORDER BY cell""".stripMargin,
    "q209_rare_terms" ->
      """WITH c AS (SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |        count(*) AS c FROM events
        |       WHERE json_extract_string(props, '$.k') IS NOT NULL GROUP BY 1),
        |tot AS (SELECT sum(c) AS tot FROM c),
        |d AS (SELECT unnest([400, 200, 100]) AS d)
        |SELECT CAST(max(tot) // d.d AS BIGINT) AS max_doc_count,
        | CAST(sum(CASE WHEN c.c <= tot // d.d THEN 1 ELSE 0 END) AS BIGINT) AS n_rare_terms,
        | CAST(coalesce(sum(CASE WHEN c.c <= tot // d.d THEN c.c END), 0) AS BIGINT) AS n_rare_docs
        |FROM d, tot, c
        |GROUP BY d.d ORDER BY max_doc_count""".stripMargin,
    "q210_rate_weighted" ->
      """SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m') AS month,
        | CAST(count(*) AS BIGINT) AS n,
        | CAST(count(*) * 1000000 //
        |   date_part('day', last_day(CAST(min(l_shipdate) AS DATE))) AS BIGINT) AS rate_per_day_ppm,
        | CAST(sum(CAST(floor(l_discount * 10000) AS BIGINT) * CAST(l_quantity AS BIGINT))
        |   // sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w_avg_disc_bp
        |FROM lineitem
        |GROUP BY 1 ORDER BY month""".stripMargin,
    "q211_panel_moving" ->
      """SELECT * FROM (
        | SELECT 'p1_view_movavg' AS panel, CAST(day AS VARCHAR) AS bucket,
        |  CAST(n AS BIGINT) AS n,
        |  CAST(sum(n) OVER w3 // count(*) OVER w3 AS BIGINT) AS val
        | FROM (SELECT epoch_ms(ts) // 86400000 AS day, count(*) AS n
        |       FROM events WHERE event_type = 'view' GROUP BY 1) h1
        | WINDOW w3 AS (ORDER BY day ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |UNION ALL
        |SELECT 'p2_click_wow' AS panel, CAST(day AS VARCHAR) AS bucket,
        |  CAST(n AS BIGINT) AS n,
        |  CAST(coalesce(n - lag(n, 7) OVER (ORDER BY day), 0) AS BIGINT) AS val
        | FROM (SELECT epoch_ms(ts) // 86400000 AS day, count(*) AS n
        |       FROM events WHERE event_type = 'click' GROUP BY 1) h2
        |) u ORDER BY panel, bucket""".stripMargin,
    "q212_composite_pages" ->
      """WITH b AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day,
        |        CAST(count(*) AS BIGINT) AS n,
        |        CAST(coalesce(sum(CAST(floor(value * 100) AS BIGINT)), 0) AS BIGINT) AS cents
        |       FROM events GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (ORDER BY event_type, day) AS rn FROM b)
        |SELECT CAST((rn - 1) // 40 AS BIGINT) AS page, event_type, day, n, cents
        |FROM r WHERE (rn - 1) // 40 <= 2
        |ORDER BY page, event_type, day""".stripMargin)
}
