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

  /** B17 with the dashboard filter bar's QUERY-STRING syntax: a kuery
    * expression compiled to a Catalyst predicate (graft.search.Kuery),
    * so a saved search exported from the reference's dashboards — e.g.
    * `appName.keyword: "TPCDS SQL Benchmark 3000 GB" and level.name:
    * ERROR` — runs verbatim, no hand translation to Columns. Free-text
    * terms search `message`.
    */
  def searchLogsKuery(logs: DataFrame, kuery: String,
      limit: Int = 1000): DataFrame =
    logs
      .filter(graft.search.Kuery.predicate(logs, kuery, Seq("message")))
      .select(col("appName"), col("appId"), col("executorId"),
        col("taskId"), col("stageId"), col("level.name").as("level"),
        col("message"), col("logTime"))
      .orderBy(col("logTime"), col("taskId"))
      .limit(limit)

  /** B19: relative time-range predicate (`now-<interval> .. now`); the
    * caller supplies `now` for determinism (SURVEY §7.4 clock injection).
    */
  def relativeTimeFilter(ts: Column, now: java.sql.Timestamp, interval: String): Column =
    ts >= lit(now) - expr(s"INTERVAL $interval") && ts <= lit(now)

  // ------------------------------------------------------------------
  // Bounds-gated driver views of the four sketch queries.
  //
  // Sketch estimates have no cross-engine twin (different sketch
  // families), so the driver used to see these as rows-only. The gated
  // form makes every one driver-checkable: the query emits
  // (group, estimate, exact, ok) where `exact` is recomputed by DuckDB
  // from the raw table (cross-engine gate) and `ok` is the sketch's
  // published error bound evaluated HONESTLY on the Spark side, while
  // the oracle asserts literal TRUE — so a sketch drifting out of its
  // bound flips the Spark cell to false and turns the driver row red.
  // The estimate itself reaches the oracle as a VALUES literal (the q23
  // embedded-hyperplane convention): `Verify` runs every query BEFORE
  // dumping oracle_sql.json, so the stash below is always populated by
  // dump time; un-run queries simply keep their oracle entry absent
  // (graceful rows-only degradation).
  //
  // The exact twins are shaped for scale even though they exist for the
  // gate: distinct-value cumulative ranks for percentiles (never a
  // row-per-event window on a 3-value partition key), conditional aggs
  // for the recounts, broadcast of the ≤20-row estimate frames.
  // ------------------------------------------------------------------

  private val estStash =
    scala.collection.concurrent.TrieMap.empty[String, String]

  private def sqlStr(s: String): String = "'" + s.replace("'", "''") + "'"

  /** q26: HLL cardinality vs exact, gated at 3σ of rsd=0.05 (|est −
    * exact|/exact ≤ 0.15, integer cross-multiplied).
    */
  def q26Gated(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = Tables.orders(s, dir)
    val est = approxCardinality(orders).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    estStash("q26_approx_cardinality") = est.map { case (p, c, o) =>
      s"(${sqlStr(p)}, CAST($c AS BIGINT), CAST($o AS BIGINT))"
    }.mkString(", ")
    val estDf = est.toDF("o_orderpriority", "n_cust_est", "n_orders_est")
    orders.groupBy($"o_orderpriority")
      .agg(
        countDistinct($"o_custkey").as("n_cust_exact"),
        countDistinct($"o_orderkey").as("n_orders_exact"),
        count(lit(1)).as("n_rows"))
      .join(broadcast(estDf), Seq("o_orderpriority"))
      .withColumn("cust_ok",
        abs($"n_cust_est" - $"n_cust_exact") * 20L <= $"n_cust_exact" * 3L)
      .withColumn("orders_ok",
        abs($"n_orders_est" - $"n_orders_exact") * 20L <= $"n_orders_exact" * 3L)
      .select($"o_orderpriority", $"n_cust_est", $"n_orders_est",
        $"n_cust_exact", $"n_orders_exact", $"n_rows", $"cust_ok", $"orders_ok")
      .orderBy($"o_orderpriority")
  }

  /** q27: GK percentiles gated by exact rank windows — the estimate must
    * land between the values at ranks floor(p·n)−m and ceil(p·n)+m for
    * m = 2n/accuracy + 1 (twice GK's ε·n guarantee, plus one for
    * boundary slack). Rank→value lookup runs on distinct-value
    * cumulative counts (~50 quantity values per flag), never a
    * row-per-event window.
    */
  def q27Gated(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir)
    val est = approxPercentiles(li).collect()
      .map(r => (r.getString(0), r.getDouble(1).toLong, r.getDouble(2).toLong,
        r.getDouble(3).toLong, r.getDouble(4).toLong)).toSeq
    estStash("q27_approx_percentiles") = est.map { case (f, a, b, c, d) =>
      s"(${sqlStr(f)}, CAST($a AS BIGINT), CAST($b AS BIGINT), " +
        s"CAST($c AS BIGINT), CAST($d AS BIGINT))"
    }.mkString(", ")
    val estDf = est.toDF("l_returnflag", "p25_est", "p50_est", "p75_est", "p99_est")
    val q = li.select($"l_returnflag", $"l_quantity".cast("long").as("q"))
    val cum = q.groupBy($"l_returnflag", $"q").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum($"c").over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"l_returnflag").orderBy($"q".asc_nulls_first)
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
    val ranks = q.groupBy($"l_returnflag").agg(count(lit(1)).as("n"))
      .withColumn("m", expr("(2 * n) div 10000 + 1"))
    val withRanks = Seq(25, 50, 75, 99).foldLeft(ranks) { (df, p) =>
      df.withColumn(s"lo${p}r",
          greatest(lit(1L), expr(s"($p * n) div 100") - col("m")))
        .withColumn(s"hi${p}r",
          least(col("n"), expr(s"($p * n + 99) div 100") + col("m")))
    }
    val aggCols = max($"n").as("n") +:
      Seq(25, 50, 75, 99).flatMap(p => Seq(
        min(when($"cum" >= col(s"lo${p}r"), $"q")).as(s"lo$p"),
        min(when($"cum" >= col(s"hi${p}r"), $"q")).as(s"hi$p")))
    val bounds = cum.join(broadcast(withRanks), Seq("l_returnflag"))
      .groupBy($"l_returnflag")
      .agg(aggCols.head, aggCols.tail: _*)
    val okCols = Seq(25, 50, 75, 99).map(p =>
      col(s"p${p}_est").between(col(s"lo$p"), col(s"hi$p")).as(s"ok$p"))
    bounds.join(broadcast(estDf), Seq("l_returnflag"))
      .select(Seq(col("l_returnflag"), col("n")) ++
        Seq(25, 50, 75, 99).flatMap(p => Seq(
          col(s"p${p}_est"), col(s"lo$p"), col(s"hi$p"))) ++ okCols: _*)
      .orderBy($"l_returnflag")
  }

  /** q40: freqItems+CMS top-k gated by the CMS contract — never
    * undercounts, overcounts by at most eps·N: exact ≤ est and
    * (est − exact)·1000 ≤ N (eps = 0.001, cross-multiplied).
    */
  def q40Gated(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val top = approxTopTerms(docs, "source", 5).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    estStash("q40_approx_top_terms") = top.map { case (t, c) =>
      s"(${sqlStr(t)}, CAST($c AS BIGINT))"
    }.mkString(", ")
    val estDf = top.toDF("term", "est_count")
    val terms = docs.filter($"source".isNotNull)
    val exact = terms.groupBy($"source".as("term"))
      .agg(count(lit(1)).as("exact_count"))
      .join(broadcast(estDf), Seq("term"))
    val total = terms.agg(count(lit(1)).as("n_total"))
    exact.crossJoin(broadcast(total))
      .withColumn("ok", $"est_count" >= $"exact_count" &&
        ($"est_count" - $"exact_count") * 1000L <= $"n_total")
      .select($"term", $"est_count", $"exact_count", $"n_total", $"ok")
      .orderBy($"est_count".desc, $"term")
  }

  /** q70: merged-sketch range cardinality gated at 3σ of the default
    * lgConfigK=12 HLL (rsd ≈ 1.6%, gate at 5%: |est − exact|·20 ≤
    * exact). n_days / n_rows from the sketch table are cross-checked
    * against a DuckDB recount of the raw range.
    */
  def q70Gated(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val path = PipelineQueries.tempDir("graft-q70")
      .resolve("user_sketches").toString
    val ev = Tables.events(s, dir)
    writeCardinalitySketchTable(ev, "user_id",
      floor(unix_millis(col("ts")) / 86400000L).cast("long"), path)
    val Array(minDay) = ev
      .agg(floor(min(unix_millis(col("ts"))) / 86400000L).cast("long"))
      .collect().map(_.getLong(0))
    val r = rangeCardinality(s, path, minDay + 5, minDay + 14).collect().head
    val (nDays, nRows, estD) = (r.getLong(0), r.getLong(1), r.getLong(2))
    estStash("q70_sketch_table") = s"CAST($estD AS BIGINT)"
    val sketchDf = Seq((nDays, nRows, estD))
      .toDF("n_days", "n_rows", "est_distinct")
    val exact = ev
      .withColumn("day", floor(unix_millis($"ts") / 86400000L).cast("long"))
      .filter($"day".between(minDay + 5, minDay + 14))
      .agg(countDistinct($"user_id").as("exact_distinct"))
    sketchDf.crossJoin(broadcast(exact))
      .withColumn("ok",
        abs($"est_distinct" - $"exact_distinct") * 20L <= $"exact_distinct")
  }

  /** Bounds-gated sketch queries (driver-checkable; see block comment). */
  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q26_approx_cardinality" -> (q26Gated _),
    "q27_approx_percentiles" -> (q27Gated _),
    "q40_approx_top_terms" -> (q40Gated _),
    "q70_sketch_table" -> (q70Gated _)
  )

  /** Dynamic oracle SQL — estimate literals stitched in from the last
    * run of each gated query (Verify runs queries before dumping, so
    * the stash is populated; absent entries degrade to rows-only).
    */
  def oracle: Map[String, String] = {
    val m = Map.newBuilder[String, String]
    estStash.get("q26_approx_cardinality").foreach { vals =>
      m += "q26_approx_cardinality" ->
        s"""WITH est(o_orderpriority, n_cust_est, n_orders_est) AS (VALUES $vals),
           |ex AS (SELECT o_orderpriority,
           |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust_exact,
           |  CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders_exact,
           |  CAST(count(*) AS BIGINT) AS n_rows
           | FROM orders GROUP BY 1)
           |SELECT ex.o_orderpriority, est.n_cust_est, est.n_orders_est,
           | ex.n_cust_exact, ex.n_orders_exact, ex.n_rows,
           | TRUE AS cust_ok, TRUE AS orders_ok
           |FROM ex JOIN est USING (o_orderpriority)
           |ORDER BY o_orderpriority""".stripMargin
    }
    estStash.get("q27_approx_percentiles").foreach { vals =>
      m += "q27_approx_percentiles" ->
        s"""WITH est(l_returnflag, p25_est, p50_est, p75_est, p99_est) AS (VALUES $vals),
           |c AS (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q, count(*) AS c
           |      FROM lineitem GROUP BY 1, 2),
           |cum AS (SELECT l_returnflag, q, sum(c) OVER
           |        (PARTITION BY l_returnflag ORDER BY q ASC NULLS FIRST
           |         ROWS UNBOUNDED PRECEDING) AS cum FROM c),
           |n AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n
           |      FROM lineitem GROUP BY 1),
           |k AS (SELECT l_returnflag, n, (2*n)//10000 + 1 AS m FROM n),
           |r AS (SELECT l_returnflag, n,
           |  greatest(1, (25*n)//100 - m) AS lo25r, least(n, (25*n+99)//100 + m) AS hi25r,
           |  greatest(1, (50*n)//100 - m) AS lo50r, least(n, (50*n+99)//100 + m) AS hi50r,
           |  greatest(1, (75*n)//100 - m) AS lo75r, least(n, (75*n+99)//100 + m) AS hi75r,
           |  greatest(1, (99*n)//100 - m) AS lo99r, least(n, (99*n+99)//100 + m) AS hi99r
           | FROM k),
           |b AS (SELECT cum.l_returnflag, max(r.n) AS n,
           |  min(CASE WHEN cum >= lo25r THEN q END) AS lo25,
           |  min(CASE WHEN cum >= hi25r THEN q END) AS hi25,
           |  min(CASE WHEN cum >= lo50r THEN q END) AS lo50,
           |  min(CASE WHEN cum >= hi50r THEN q END) AS hi50,
           |  min(CASE WHEN cum >= lo75r THEN q END) AS lo75,
           |  min(CASE WHEN cum >= hi75r THEN q END) AS hi75,
           |  min(CASE WHEN cum >= lo99r THEN q END) AS lo99,
           |  min(CASE WHEN cum >= hi99r THEN q END) AS hi99
           | FROM cum JOIN r USING (l_returnflag) GROUP BY 1)
           |SELECT b.l_returnflag, b.n,
           | est.p25_est, b.lo25, b.hi25, TRUE AS ok25,
           | est.p50_est, b.lo50, b.hi50, TRUE AS ok50,
           | est.p75_est, b.lo75, b.hi75, TRUE AS ok75,
           | est.p99_est, b.lo99, b.hi99, TRUE AS ok99
           |FROM b JOIN est USING (l_returnflag) ORDER BY l_returnflag""".stripMargin
    }
    estStash.get("q40_approx_top_terms").foreach { vals =>
      m += "q40_approx_top_terms" ->
        s"""WITH est(term, est_count) AS (VALUES $vals),
           |ex AS (SELECT source AS term, CAST(count(*) AS BIGINT) AS exact_count
           |       FROM documents WHERE source IS NOT NULL GROUP BY 1),
           |t AS (SELECT CAST(count(*) AS BIGINT) AS n_total
           |      FROM documents WHERE source IS NOT NULL)
           |SELECT est.term, est.est_count, ex.exact_count, t.n_total, TRUE AS ok
           |FROM est JOIN ex USING (term), t
           |ORDER BY est.est_count DESC, est.term""".stripMargin
    }
    estStash.get("q70_sketch_table").foreach { estLit =>
      m += "q70_sketch_table" ->
        s"""WITH b AS (SELECT min(epoch_ms(ts)) // 86400000 AS d0 FROM events),
           |e AS (SELECT epoch_ms(ts) // 86400000 AS day, user_id FROM events),
           |r AS (SELECT day, user_id FROM e, b WHERE day BETWEEN d0+5 AND d0+14)
           |SELECT CAST(count(DISTINCT day) AS BIGINT) AS n_days,
           | CAST(count(*) AS BIGINT) AS n_rows,
           | $estLit AS est_distinct,
           | CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct,
           | TRUE AS ok
           |FROM r""".stripMargin
    }
    m.result()
  }
}
