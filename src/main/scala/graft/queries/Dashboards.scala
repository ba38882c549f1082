package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Approximate dashboard variants + log-table search — the OpenSearch
  * semantics the exact oracle queries deliberately avoid (SURVEY §7.4):
  *
  *  - B1-B3 `cardinality` is HLL → `approx_count_distinct` (HLL++ in
  *    Spark, relative error default 5%)
  *  - B12 `percentiles` is t-digest → `percentile_approx`
  *    (Greenwald-Khanna)
  *  - B17 log search over the ingested spark_logs table
  *  - B19 relative time filter (`from: now-6M to: now`)
  *
  * Approx results have no cross-engine oracle (different sketches), so
  * these are verified by error-bound ScalaTests against the exact
  * values, and exposed as rows-only queries. At 100 TB the approx forms
  * are the ones you actually run: HLL++ partial aggregation means the
  * shuffle carries fixed-size sketches instead of distinct-key expansion
  * (no two-phase distinct expand), and percentile_approx carries bounded
  * quantile summaries.
  */
object Dashboards {

  /** B1-B3 (HLL cardinality), approx form of q02. */
  def approxCardinality(orders: DataFrame, rsd: Double = 0.05): DataFrame =
    orders
      .groupBy(col("o_orderpriority"))
      .agg(
        approx_count_distinct(col("o_custkey"), rsd).as("n_cust"),
        approx_count_distinct(col("o_orderkey"), rsd).as("n_orders"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("o_orderpriority"))

  /** B12 (t-digest percentiles), approx form of q06. `accuracy` is
    * Spark's GK accuracy knob (10000 default ⇒ ~1/10000 rank error).
    */
  def approxPercentiles(lineitem: DataFrame, accuracy: Int = 10000): DataFrame =
    lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        percentile_approx(col("l_quantity"), lit(0.25), lit(accuracy)).as("p25"),
        percentile_approx(col("l_quantity"), lit(0.5), lit(accuracy)).as("p50"),
        percentile_approx(col("l_quantity"), lit(0.75), lit(accuracy)).as("p75"),
        percentile_approx(col("l_quantity"), lit(0.99), lit(accuracy)).as("p99"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  /** B11/B15 approximate terms aggregation — the honest version of what
    * the OpenSearch `terms` agg itself is at scale (shard-local top-N
    * with a doc_count_error bound). Two mergeable one-pass sketches over
    * the column, both from Spark's public sketch API:
    *
    *  - candidates: `stat.freqItems` (Misra-Gries style) — every value
    *    with frequency > `support` is guaranteed to survive;
    *  - counts: `stat.countMinSketch` — overestimates each candidate by
    *    at most eps·N with probability ≥ confidence, never
    *    underestimates.
    *
    * At 100 TB the aggregation state that moves is FIXED-SIZE sketch
    * partials (CMS depth×width counters, MG maps), never the
    * distinct-key expansion — the property that makes a terms panel over
    * a high-cardinality field feasible at all. The k survivors can be
    * exactly recounted with one tiny IN-filtered aggregation if the
    * ±eps·N bound isn't good enough for display.
    */
  def approxTopTerms(
      df: DataFrame,
      termCol: String,
      k: Int,
      support: Double = 0.01,
      eps: Double = 0.001,
      confidence: Double = 0.99,
      seed: Int = 42): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // nulls are not terms: a frequent null would surface as a freqItems
    // candidate and crash CountMinSketch.estimateCount(null)
    val terms = df.filter(col(termCol).isNotNull)
    val sketch = terms.stat.countMinSketch(col(termCol), eps, confidence, seed)
    val cands = terms.stat.freqItems(Array(termCol), support)
      .head().getSeq[String](0).filter(_ != null)
    cands.map(c => (c, sketch.estimateCount(c)))
      .toDF("term", "est_count")
      .orderBy(col("est_count").desc, col("term"))
      .limit(k)
  }

  /** Pre-aggregated MERGEABLE sketch table — the pattern that makes
    * "distinct users over any date range" a dashboard-speed query at
    * 100 TB: one offline pass folds each day into a fixed-size
    * Datasketches HLL state; range queries then union a handful of
    * sketch rows instead of rescanning raw events. HLL union is
    * lossless over sketch state, so the merged estimate is IDENTICAL
    * to a direct sketch of the union (spec-asserted), and the whole
    * thing stays inside Spark's public `hll_sketch_agg`/`hll_union_agg`
    * functions (partial aggregation ships sketches, never keys).
    */
  def writeCardinalitySketchTable(
      events: DataFrame,
      keyCol: String,
      epochDayCol: Column,
      path: String): Unit =
    events
      .groupBy(epochDayCol.as("day"))
      .agg(expr(s"hll_sketch_agg($keyCol)").as("sketch"),
        count(lit(1)).as("n_rows"))
      .write.mode("overwrite").parquet(path)

  /** Distinct-key estimate over an inclusive day range, from the sketch
    * table alone.
    */
  def rangeCardinality(
      spark: SparkSession,
      path: String,
      fromDay: Long,
      toDay: Long): DataFrame =
    spark.read.parquet(path)
      .filter(col("day").between(fromDay, toDay))
      .agg(
        count(lit(1)).as("n_days"),
        sum(col("n_rows")).as("n_rows"),
        expr("hll_sketch_estimate(hll_union_agg(sketch))").as("est_distinct"))

  /** B17 over the ingested spark_logs table: severity filter (Log4j2
    * intLevel — smaller is MORE severe, ERROR=200 < WARN=300 < INFO=400)
    * + full-text contains + the saved search's projection, sorted,
    * limited.
    */
  def searchLogs(logs: DataFrame, contains: String, maxIntLevel: Long = 400L,
      limit: Int = 1000): DataFrame =
    logs
      .filter(col("message").contains(contains) &&
        col("level.intLevel") <= maxIntLevel)
      .select(col("appName"), col("appId"), col("executorId"),
        col("taskId"), col("stageId"), col("level.name").as("level"),
        col("message"), col("logTime"))
      .orderBy(col("logTime"), col("taskId"))
      .limit(limit)

  /** B17 over the DEEP log table (rawLogSchemaDeep ingest): severity +
    * full-text search extended with the cause-chain dimensions the flat
    * schema cannot express — root-cause class filtering and minimum
    * cause depth. All predicates are scan-level (level/causeDepth/
    * rootCauseName are top-level sink columns), so the search stays a
    * pruned single pass at any scale.
    */
  def searchLogsDeep(
      logs: DataFrame,
      contains: String = "",
      maxIntLevel: Long = 400L,
      rootCause: Option[String] = None,
      minCauseDepth: Long = 0L,
      limit: Int = 1000): DataFrame = {
    val base = logs
      .filter(col("level.intLevel") <= maxIntLevel &&
        col("causeDepth") >= minCauseDepth)
    val text = if (contains.nonEmpty) base.filter(col("message").contains(contains)) else base
    val caused = rootCause.fold(text)(rc => text.filter(col("rootCauseName") === rc))
    caused
      .select(col("appName"), col("appId"), col("executorId"),
        col("taskId"), col("stageId"), col("levelName"),
        col("message"), col("rootCauseName"), col("causeDepth"),
        col("errLine"), col("logTime"))
      .orderBy(col("logTime"), col("taskId"))
      .limit(limit)
  }

  /** B19: relative time-range predicate (`now-<interval> .. now`); the
    * caller supplies `now` for determinism (SURVEY §7.4 clock injection).
    */
  def relativeTimeFilter(ts: Column, now: java.sql.Timestamp, interval: String): Column =
    ts >= lit(now) - expr(s"INTERVAL $interval") && ts <= lit(now)

  /** Rows-only query entries (no DuckDB twin for HLL/GK/CMS sketches). */
  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q26_approx_cardinality" ->
      ((s, dir) => approxCardinality(Tables.orders(s, dir))),
    "q27_approx_percentiles" ->
      ((s, dir) => approxPercentiles(Tables.lineitem(s, dir))),
    "q40_approx_top_terms" ->
      ((s, dir) => approxTopTerms(Tables.documents(s, dir), "source", 5)),
    "q70_sketch_table" -> ((s, dir) => {
      // build the per-day sketch table, then answer a 10-day range from
      // sketches alone (no raw rescan)
      val path = java.nio.file.Files.createTempDirectory("graft-q70")
        .resolve("user_sketches").toString
      val ev = Tables.events(s, dir)
      writeCardinalitySketchTable(ev, "user_id",
        floor(unix_millis(col("ts")) / 86400000L).cast("long"), path)
      val Array(minDay) = ev
        .agg(floor(min(unix_millis(col("ts"))) / 86400000L).cast("long"))
        .collect().map(_.getLong(0))
      rangeCardinality(s, path, minDay + 5, minDay + 14)
    })
  )
}
