package graft.search

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** SavedObjects importer: parse/dispatch on hand-built lines plus the
  * real thing — the reference's entire exported dashboard ndjson (34
  * saved objects), every visualization panel of which must import and
  * EXECUTE against a task-metrics-shaped frame. This is the gate for
  * "a user hands over their dashboard export and it runs".
  */
class SavedObjectsSpec extends SparkTestBase {
  import spark.implicits._

  private val refNdjson =
    "/root/reference/deployment/infra/resources/lambda/opensearch-bootstrap/" +
      "resources/dashboards/data-skew.ndjson"

  test("parses panels, skips controls/index-patterns/searches") {
    val lines = Seq(
      """{"type":"index-pattern","attributes":{"title":"x*"}}""",
      """{"type":"visualization","attributes":{"title":"ctl","visState":"{\"type\":\"input_control_vis\",\"params\":{}}"}}""",
      """{"type":"visualization","attributes":{"title":"m","visState":"{\"type\":\"metric\",\"aggs\":[{\"id\":\"1\",\"enabled\":true,\"type\":\"sum\",\"params\":{\"field\":\"v\"},\"schema\":\"metric\"}]}"}}""")
    val panels = SavedObjects.parseNdjson(lines)
    assert(panels.map(_.title) == Seq("m"))
    // a truncated/corrupt line skips without killing the import
    assert(SavedObjects.parseNdjson(
      lines :+ """{"type":"visualization","attributes":{"title":"bad","visState":"{not json"""")
      .map(_.title) == Seq("m"))
    assert(panels.head.metrics == Seq(
      SavedObjects.MetricAgg("1", "sum", "v", "sum(v)", Seq(50))))
  }

  test("ES interval strings parse to milliseconds; auto/junk default") {
    assert(SavedObjects.parseInterval("30s") == Some(30000L))
    assert(SavedObjects.parseInterval("15m") == Some(900000L))
    assert(SavedObjects.parseInterval("1h") == Some(3600000L))
    assert(SavedObjects.parseInterval("2d") == Some(172800000L))
    assert(SavedObjects.parseInterval("1w") == Some(604800000L))
    assert(SavedObjects.parseInterval("250ms") == Some(250L))
    assert(SavedObjects.parseInterval("3600000") == Some(3600000L))
    assert(SavedObjects.parseInterval("auto").isEmpty)
    assert(SavedObjects.parseInterval("1 fortnight").isEmpty)
    // a panel with interval "1h" buckets hourly, not daily
    val df = Seq.tabulate(4)(i =>
      (1.0, new java.sql.Timestamp(1767225600000L + i * 1800000L)))
      .toDF("v", "t")
    val p = SavedObjects.Panel("p", None,
      Seq(SavedObjects.MetricAgg("1", "count", "", "n", Seq())),
      Seq(SavedObjects.BucketAgg("date_histogram", "t", 5, "_count", true,
        Seq.empty, SavedObjects.parseInterval("1h").get)))
    assert(SavedObjects.run(df, p).select($"val").as[Long]
      .collect().sorted.toList == List(2L, 2L))
  }

  test("interval units are case-sensitive: 1M is the month calendar unit") {
    assert(SavedObjects.parseIntervalSpec("1M") ==
      Some(SavedObjects.Calendar("month")))
    assert(SavedObjects.parseIntervalSpec("1q") ==
      Some(SavedObjects.Calendar("quarter")))
    assert(SavedObjects.parseIntervalSpec("1y") ==
      Some(SavedObjects.Calendar("year")))
    // lowercase m stays minutes; junk stays unrecognized (daily default)
    assert(SavedObjects.parseIntervalSpec("1m") ==
      Some(SavedObjects.FixedMs(60000L)))
    assert(SavedObjects.parseIntervalSpec("auto") ==
      Some(SavedObjects.AutoInterval))
    assert(SavedObjects.parseIntervalSpec("1 fortnight").isEmpty)
    // a monthly panel buckets by calendar month, not per-minute
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val df = Seq((1.0, ts("2024-01-05 10:00:00")),
      (1.0, ts("2024-01-20 11:30:00")), (1.0, ts("2024-02-02 09:00:00")))
      .toDF("v", "t")
    val p = SavedObjects.Panel("p", None,
      Seq(SavedObjects.MetricAgg("1", "count", "", "n", Seq())),
      Seq(SavedObjects.BucketAgg("date_histogram", "t", 5, "_count", true,
        Seq.empty, 86400000L, calendar = Some("month"))))
    val got = SavedObjects.run(df, p)
      .select($"bucket", $"val").as[(String, Long)].collect().toMap
    assert(got == Map("2024-01-01" -> 2L, "2024-02-01" -> 1L))
  }

  test("auto interval resolves through the ladder from the filtered span") {
    // 24 samples 5 minutes apart: span 6900 s -> need 138 -> the 300 s
    // rung -> one bucket per sample. A fixed-daily import would emit
    // ONE bucket — the round-6 bug this pins.
    val df = Seq.tabulate(24)(i =>
      (1.0, new java.sql.Timestamp(1767225600000L + i * 300000L)))
      .toDF("v", "t")
    val p = SavedObjects.Panel("p", None,
      Seq(SavedObjects.MetricAgg("1", "count", "", "n", Seq())),
      Seq(SavedObjects.BucketAgg("date_histogram", "t", 5, "_count", true,
        Seq.empty, 86400000L, auto = true)))
    assert(SavedObjects.run(df, p).count() == 24L)
  }

  test("saved timeRange parses from the export; a now-30d panel buckets only the window") {
    assume(Files.exists(Paths.get(refNdjson)), "reference export not present")
    // the export's four time-series panels carry relative windows
    // inside the date_histogram agg params (lines 19/20/24/25)
    val lines = Files.readAllLines(Paths.get(refNdjson)).asScala.toSeq
    val trs = SavedObjects.parseNdjson(lines)
      .flatMap(_.buckets.flatMap(_.timeRange.map(_._1)))
    assert(trs.sorted == Seq("now-1y", "now-30d", "now-6M", "now-6M").sorted,
      s"saved timeRanges seen: $trs")

    // 90 days of hourly data, now at the end: a now-30d auto panel must
    // cut to the last 30 days AND pick the daily rung from the RANGE
    // span (30 d → need 51840 s → 1d), not the 90-day data span
    val t0 = 1704067200000L // 2024-01-01T00:00:00Z
    val df = Seq.tabulate(90 * 24)(i =>
      (1.0, new java.sql.Timestamp(t0 + i * 3600000L))).toDF("v", "t")
    val now = new java.sql.Timestamp(t0 + 90L * 86400000L) // 2024-03-31
    val p = SavedObjects.Panel("p", None,
      Seq(SavedObjects.MetricAgg("1", "count", "", "n", Seq())),
      Seq(SavedObjects.BucketAgg("date_histogram", "t", 5, "_count", true,
        Seq.empty, 86400000L, auto = true,
        timeRange = Some(("now-30d", "now")))))
    val got = SavedObjects.run(df, p, now = Some(now))
      .select($"bucket", $"val").as[(String, Long)].collect()
    assert(got.length == 30, s"expected the window's 30 daily buckets: ${got.toList}")
    val minDay = (now.getTime - 30L * 86400000L) / 86400000L
    assert(got.map(_._1.toLong).min >= minDay, s"bucket before the window: ${got.toList}")
    assert(got.map(_._2).sum == 30L * 24, "every hour inside the window, none outside")

    // unsupported shapes are ignored tolerantly (absolute dates, junk
    // units, a non-now upper bound)
    assert(SavedObjects.parseTimeRange("2024-01-01", "now").isEmpty)
    assert(SavedObjects.parseTimeRange("now-5x", "now").isEmpty)
    assert(SavedObjects.parseTimeRange("now-5d", "now-1d").isEmpty)
  }

  test("rangeSpanMs follows the SESSION timezone's end-of-month clamp, matching Spark's INTERVAL arithmetic") {
    import org.apache.spark.sql.functions.{expr, lit, unix_millis}
    // 2024-03-30T20:00Z is day 30 in UTC but already Mar 31, 01:00 in
    // +05:00 — minusMonths clamps to Feb 29 from DIFFERENT days, so the
    // spans disagree by a day between the zones. The rung selection
    // must use the same zone as the composed `now − INTERVAL` filter.
    val now = java.sql.Timestamp.from(
      java.time.Instant.parse("2024-03-30T20:00:00Z"))
    val r1 = SavedObjects.parseTimeRange("now-1M", "now").get
    def sparkSpan(tz: String): Long = {
      val old = spark.conf.get("spark.sql.session.timeZone")
      spark.conf.set("spark.sql.session.timeZone", tz)
      try spark.range(1).select(
          (unix_millis(lit(now)) -
            unix_millis(lit(now) - expr("INTERVAL 1 MONTH"))).as("s"))
        .as[Long].head()
      finally spark.conf.set("spark.sql.session.timeZone", old)
    }
    assert(sparkSpan("UTC") == 30L * 86400000L)
    assert(sparkSpan("+05:00") == 31L * 86400000L) // the divergent case
    assert(SavedObjects.rangeSpanMs(now, r1) == sparkSpan("UTC"))
    assert(SavedObjects.rangeSpanMs(now, r1,
      java.time.ZoneId.of("+05:00")) == sparkSpan("+05:00"))
  }

  test("calendar-unit timeRange subtraction is calendar-aware on both sides") {
    // now = 2024-03-31: now-1M clamps to Feb 29 (leap), now-6M to Sep 30
    val now = java.sql.Timestamp.from(
      java.time.Instant.parse("2024-03-31T00:00:00Z"))
    val r1 = SavedObjects.parseTimeRange("now-1M", "now").get
    assert(SavedObjects.rangeSpanMs(now, r1) == 31L * 86400000L)
    val r6 = SavedObjects.parseTimeRange("now-6M", "now").get
    assert(SavedObjects.rangeSpanMs(now, r6) == 183L * 86400000L)
    // the Spark filter applies the SAME clamped boundary: 2024-02-28
    // 23:00 is outside [now-1M, now], 2024-02-29 00:30 inside
    val df = Seq(
      ("out", java.sql.Timestamp.from(
        java.time.Instant.parse("2024-02-28T23:00:00Z"))),
      ("in", java.sql.Timestamp.from(
        java.time.Instant.parse("2024-02-29T00:30:00Z"))))
      .toDF("k", "t")
    val p = SavedObjects.Panel("p", None,
      Seq(SavedObjects.MetricAgg("1", "count", "", "n", Seq())),
      Seq(SavedObjects.BucketAgg("terms", "k", 5, "_count", true, Seq.empty,
        86400000L),
        SavedObjects.BucketAgg("date_histogram", "t", 5, "_count", true,
          Seq.empty, 86400000L, timeRange = Some(("now-1M", "now")))))
    val got = SavedObjects.run(df, p, now = Some(now))
      .select($"bucket").as[String].collect()
    assert(got.length == 1 && got.head.startsWith("in/"), got.toList)
  }

  test("rung-from-range: an auto panel with a timeRange plans with zero driver scans") {
    val t0 = 1704067200000L
    val df = Seq.tabulate(48)(i =>
      (1.0, new java.sql.Timestamp(t0 + i * 3600000L))).toDF("v", "t")
    val now = new java.sql.Timestamp(t0 + 2L * 86400000L)
    def panel(tr: Option[(String, String)]) = SavedObjects.Panel("p", None,
      Seq(SavedObjects.MetricAgg("1", "count", "", "n", Seq())),
      Seq(SavedObjects.BucketAgg("date_histogram", "t", 5, "_count", true,
        Seq.empty, 86400000L, auto = true, timeRange = tr)))
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try {
      // with a saved range the rung is pure arithmetic — building the
      // plan launches NO job (the listener bus is async; give it a beat)
      SavedObjects.run(df, panel(Some(("now-2d", "now"))), now = Some(now))
      Thread.sleep(500)
      assert(jobs.get == 0,
        s"plan construction with a timeRange should launch no job, saw ${jobs.get}")
      // the no-timeRange fallback still runs its bounded min/max scan
      SavedObjects.run(df, panel(None))
      var waited = 0
      while (jobs.get == 0 && waited < 5000) { Thread.sleep(100); waited += 100 }
      assert(jobs.get > 0, "the no-timeRange fallback min/max scan should run")
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("saved searches run as docs tables: kuery, sort, projection") {
    val df = Seq(
      (1L, "purchase", 250.0), (2L, "purchase", 100.0),
      (3L, "click", 300.0), (4L, "purchase", 220.0))
      .toDF("event_id", "event_type", "value")
    val line =
      """{"type":"search","id":"s1","attributes":{"title":"big","columns":["event_id","value"],"sort":[["value","desc"]],"kibanaSavedObjectMeta":{"searchSourceJSON":"{\"query\":{\"query\":\"event_type.keyword: purchase and value >= 200\",\"language\":\"kuery\"},\"filter\":[]}"}}}"""
    val srch = SavedObjects.parseSearchLine(line).get
    assert(srch.sorts == Seq(("value", true)))
    val out = SavedObjects.runSearch(df, srch)
    assert(out.columns.toSeq == Seq("event_id", "value"))
    assert(out.as[(Long, Double)].collect().toList ==
      List((1L, 250.0), (4L, 220.0)))
    // a sort field OUTSIDE the projected columns still orders the docs
    // (sort happens before projection — Kibana's @timestamp default)
    val byId = srch.copy(sorts = Seq(("event_id", true)), columns = Seq("value"))
    assert(SavedObjects.runSearch(df, byId).as[Double].collect().toList ==
      List(220.0, 250.0))
    // the flat single-sort export shape parses too
    val flat =
      """{"type":"search","attributes":{"title":"f","columns":[],"sort":["event_id","asc"]}}"""
    assert(SavedObjects.parseSearchLine(flat).get.sorts ==
      Seq(("event_id", false)))
    // empty column list = all columns; limit plans TakeOrdered
    val all = SavedObjects.runSearch(df, srch.copy(columns = Seq.empty),
      limit = Some(1))
    assert(all.columns.toSeq == df.columns.toSeq)
    assert(all.count() == 1L)
  }

  test("the real export's Spark Logs search imports with its column list and runs") {
    assume(Files.exists(Paths.get(refNdjson)), "reference export not present")
    val lines = Files.readAllLines(Paths.get(refNdjson)).asScala.toSeq
    val searches = lines.flatMap(l =>
      scala.util.Try(SavedObjects.parseSearchLine(l)).toOption.flatten)
    assert(searches.size == 1)
    val srch = searches.head
    assert(srch.title == "Spark Logs")
    assert(srch.columns == Seq("appName", "appId", "executorId", "taskId",
      "stageId", "level.name", "message.message"))
    assert(srch.kuery.isEmpty && srch.sorts.isEmpty)
    // a logs-shaped frame with the nested level/message structs those
    // columns address — the same fields Dashboards.searchLogs projects
    val logs = Seq(
      ("app", "id1", "e1", 1L, 2L, "ERROR", "boom"),
      ("app", "id1", "e2", 3L, 4L, "INFO", "fine"))
      .toDF("appName", "appId", "executorId", "taskId", "stageId", "lvl", "msg")
      .withColumn("level", struct($"lvl".as("name")))
      .withColumn("message", struct($"msg".as("message")))
      .drop("lvl", "msg")
    val out = SavedObjects.runSearch(logs, srch)
    assert(out.columns.toSeq == srch.columns)
    val manual = logs.select($"appName", $"appId", $"executorId", $"taskId",
      $"stageId", col("level.name").as("level.name"),
      col("message.message").as("message.message"))
    assert(out.collect().toSet == manual.collect().toSet)
  }

  test("input_control_vis lines parse into control specs; controlOptions bounds the dropdown") {
    assume(Files.exists(Paths.get(refNdjson)), "reference export not present")
    val lines = Files.readAllLines(Paths.get(refNdjson)).asScala.toSeq
    val controls = lines.flatMap(l =>
      scala.util.Try(SavedObjects.parseControlsLine(l)).toOption.flatten)
    assert(controls.size == 1, s"expected the export's one control panel: $controls")
    val (title, cs) = controls.head
    assert(title == "Data Skew - Dashboard controls")
    assert(cs.map(_.field) == Seq("appName.keyword", "appId"))
    assert(cs.map(_.label) == Seq("Application name", "Application Run"))
    assert(cs.forall(_.controlType == "list") && cs.forall(_.size == 5))
    assert(cs.map(_.multiselect) == Seq(false, true))
    // the Application Run control chains off the Application name one
    assert(cs(1).parent == Some(cs(0).id))
    assert(SavedObjects.parseControlsLine(
      """{"type":"index-pattern","attributes":{}}""").isEmpty)
    assert(SavedObjects.parseControlsLine(
      """{"type":"visualization","attributes":{"title":"m","visState":"{\"type\":\"metric\",\"aggs\":[]}"}}""").isEmpty)

    // dynamicOptions terms query: count desc, value asc tiebreak, size-bounded
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(3)("c") ++
      Seq("d", "e", "f", "g")).toDF("appName")
    val opts = SavedObjects.controlOptions(df, cs.head)
      .as[(String, Long)].collect().toList
    assert(opts.length == 5)
    assert(opts.take(3) == List(("a", 5L), ("b", 3L), ("c", 3L)))
  }

  test("bucket-only panels get the implied count metric") {
    val line =
      """{"type":"visualization","attributes":{"title":"b","visState":"{\"type\":\"pie\",\"aggs\":[{\"id\":\"2\",\"enabled\":true,\"type\":\"terms\",\"params\":{\"field\":\"k\",\"size\":5},\"schema\":\"segment\"}]}"}}"""
    val p = SavedObjects.parseLine(line).get
    assert(p.metrics ==
      Seq(SavedObjects.MetricAgg("_implied", "count", "", "Count", Seq.empty)))
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0)).toDF("k", "v")
    val got = SavedObjects.run(df, p)
      .select($"bucket", $"metric", $"val").as[(String, String, Long)]
      .collect().toSet
    assert(got == Set(("a", "Count", 2L), ("b", "Count", 1L)))
  }

  test("imports with no runnable panel return the empty normalized frame") {
    val df = Seq(("a", 1.0)).toDF("k", "v")
    val onlyMeta = Seq("""{"type":"index-pattern","attributes":{"title":"x*"}}""")
    val out = SavedObjects.runNdjson(df, onlyMeta)
    assert(out.columns.toSeq == Seq("panel", "bucket", "metric", "val"))
    assert(out.count() == 0L)
    val outD = SavedObjects.runDashboards(df, onlyMeta)
    assert(outD.columns.toSeq == Seq("panel", "bucket", "metric", "val"))
    assert(outD.count() == 0L)
  }

  test("ES null semantics: avg divides by the non-null count; all-null leaves don't clamp extrema") {
    val df = Seq(("a", "s1", Option(10.0)), ("a", "s1", None),
      ("a", "s1", None), ("b", "s1", Option(20.0)))
      .toDF("k", "sub", "v")
    val avgPanel = SavedObjects.Panel("p", None,
      Seq(SavedObjects.MetricAgg("1", "avg", "v", "mean", Seq())),
      Seq(SavedObjects.BucketAgg("terms", "k", 5, "_count", true,
        Seq.empty, 86400000L)))
    val means = SavedObjects.run(df, avgPanel)
      .select($"bucket", $"val").as[(String, Long)].collect().toMap
    // sum-over-rowcount would report a=333
    assert(means == Map("a" -> 1000L, "b" -> 2000L))

    // ordering by a composed max: group a has an ALL-NULL leaf (k=a,
    // sub=s2) — a 0-coalesced partial would clamp a's max to 0 and
    // outrank b's -100
    val df2 = Seq(("a", "s1", Option(-5.0)), ("a", "s2", None),
      ("b", "s1", Option(-1.0)), ("b", "s2", Option(-3.0)))
      .toDF("k", "sub", "v")
    val maxPanel = SavedObjects.Panel("p", None,
      Seq(SavedObjects.MetricAgg("1", "max", "v", "peak", Seq())),
      Seq(SavedObjects.BucketAgg("terms", "k", 1, "1", orderDesc = true,
        Seq.empty, 86400000L),
        SavedObjects.BucketAgg("terms", "sub", 2, "_key", orderDesc = false,
          Seq.empty, 86400000L)))
    val got = SavedObjects.run(df2, maxPanel)
      .select($"bucket", $"val").as[(String, Long)].collect().toMap
    assert(got.keySet.forall(_.startsWith("b/")),
      s"max order must pick b (-100) over a (-500), got $got")
    assert(got == Map("b/s1" -> -100L, "b/s2" -> -300L))
  }

  test("dashboard lines parse filters, honor disabled, resolve panel refs in order") {
    val dash =
      """{"type":"dashboard","attributes":{"title":"d","kibanaSavedObjectMeta":{"searchSourceJSON":"{\"query\":{\"query\":\"\",\"language\":\"kuery\"},\"filter\":[{\"meta\":{\"negate\":false,\"disabled\":false},\"query\":{\"match_phrase\":{\"k.keyword\":\"x\"}}},{\"meta\":{\"negate\":true,\"disabled\":false},\"query\":{\"match_phrase\":{\"s.keyword\":\"drop\"}}},{\"meta\":{\"disabled\":true},\"query\":{\"match_phrase\":{\"k.keyword\":\"ignored\"}}}]}"}},"references":[{"id":"ip","name":"kibanaSavedObjectMeta.searchSourceJSON.filter[0].meta.index","type":"index-pattern"},{"id":"vB","name":"panel_1","type":"visualization"},{"id":"vA","name":"panel_0","type":"visualization"},{"id":"sX","name":"panel_2","type":"search"}]}"""
    val d = SavedObjects.parseDashboardLine(dash).get
    assert(d.title == "d")
    assert(d.filters == Seq(
      SavedObjects.PhraseFilter("k.keyword", "x", negate = false),
      SavedObjects.PhraseFilter("s.keyword", "drop", negate = true)))
    assert(d.panelIds == Seq("vA", "vB", "sX")) // panel_N order incl. searches
    assert(SavedObjects.parseDashboardLine(
      """{"type":"visualization","attributes":{}}""").isEmpty)
  }

  test("dashboard import scopes member panels; unreferenced panels don't run; negation keeps nulls") {
    val df = Seq(
      (Option("x"), "keep", 10.0), (Option("x"), "drop", 99.0),
      (Option("y"), "keep", 5.0), (None: Option[String], "keep", 7.0))
      .toDF("k", "s", "v")
    val lines = Seq(
      """{"type":"dashboard","attributes":{"title":"d","kibanaSavedObjectMeta":{"searchSourceJSON":"{\"query\":{\"query\":\"\",\"language\":\"kuery\"},\"filter\":[{\"meta\":{\"negate\":true,\"disabled\":false},\"query\":{\"match_phrase\":{\"s.keyword\":\"drop\"}}}]}"}},"references":[{"id":"v1","name":"panel_0","type":"visualization"}]}""",
      """{"type":"visualization","id":"v1","attributes":{"title":"sums","visState":"{\"type\":\"table\",\"aggs\":[{\"id\":\"1\",\"enabled\":true,\"type\":\"sum\",\"params\":{\"field\":\"v\",\"customLabel\":\"total\"},\"schema\":\"metric\"},{\"id\":\"2\",\"enabled\":true,\"type\":\"terms\",\"params\":{\"field\":\"k\",\"size\":5},\"schema\":\"bucket\"}]}"}}""",
      """{"type":"visualization","id":"v9","attributes":{"title":"orphan","visState":"{\"type\":\"metric\",\"aggs\":[{\"id\":\"1\",\"enabled\":true,\"type\":\"count\",\"params\":{},\"schema\":\"metric\"}]}"}}""")
    val got = SavedObjects.runDashboards(df, lines)
      .select($"panel", $"bucket", $"val").as[(String, String, Long)]
      .collect().toSet
    // negated phrase drops s=drop but KEEPS the null-k row's group
    // (terms label null rows are excluded by the bucket, not the filter);
    // x keeps only v=10, y keeps 5; the orphan never runs
    assert(got == Set(("d/sums", "x", 1000L), ("d/sums", "y", 500L)))
  }

  test("referenced saved searches run as hit counts under the composed filters") {
    val df = Seq(("x", "alpha beta"), ("x", "gamma"), ("y", "alpha"))
      .toDF("k", "text")
    val lines = Seq(
      """{"type":"dashboard","attributes":{"title":"d","kibanaSavedObjectMeta":{"searchSourceJSON":"{\"query\":{\"query\":\"\",\"language\":\"kuery\"},\"filter\":[{\"meta\":{\"negate\":false,\"disabled\":false},\"query\":{\"match_phrase\":{\"k.keyword\":\"x\"}}}]}"}},"references":[{"id":"s1","name":"panel_0","type":"search"}]}""",
      """{"type":"search","id":"s1","attributes":{"title":"logs","columns":["k","text"],"kibanaSavedObjectMeta":{"searchSourceJSON":"{\"query\":{\"query\":\"text: alpha\",\"language\":\"kuery\"},\"filter\":[]}"}}}""")
    val got = SavedObjects.runDashboards(df, lines)
      .select($"panel", $"bucket", $"metric", $"val")
      .as[(String, String, String, Long)].collect().toList
    // k=x AND text contains alpha -> exactly one row
    assert(got == List(("d/logs", "all", "hits", 1L)))

    // the row-level companion: runDashboardSearches returns the docs
    // frame under the SAME composed context — its count equals the
    // hits metric and its rows honor the saved column list
    val tables = SavedObjects.runDashboardSearches(df, lines)
    assert(tables.map(_._1) == Seq("d/logs"))
    val rows = tables.head._2
    assert(rows.columns.toSeq == Seq("k", "text"))
    assert(rows.as[(String, String)].collect().toList ==
      List(("x", "alpha beta")))
  }

  test("managed imports release every cached frame") {
    assume(Files.exists(Paths.get(refNdjson)), "reference export not present")
    spark.catalog.clearCache()
    val lines = Files.readAllLines(Paths.get(refNdjson)).asScala.toSeq
    val panels = SavedObjects.parseNdjson(lines)
    val fields = panels.flatMap(p => p.metrics.map(_.field) ++
      p.buckets.map(_.field)).filter(_.nonEmpty).toSet
    val numeric = panels.flatMap(p =>
      p.metrics.filter(m => Set("sum", "max", "min", "avg",
        "percentiles").contains(m.kind)).map(_.field) ++
        p.buckets.filter(_.kind == "range").map(_.field)).toSet
    val times = panels.flatMap(_.buckets
      .filter(_.kind == "date_histogram").map(_.field)).toSet
    var df = spark.range(100).toDF("id")
    fields.foreach { f =>
      val cname = f.stripSuffix(".keyword")
      val c =
        if (times.contains(f)) to_timestamp(lit(1767225600L) + $"id" * 3600)
        else if (numeric.contains(f)) ($"id" % 37) * 0.7
        else concat(lit(cname.take(2)), ($"id" % 5).cast("string"))
      df = df.withColumn(cname, c)
    }
    // anchor the saved relative windows (now-6M/now-30d/now-1y on four
    // panels) just past the synthetic data so every window covers it —
    // the wall-clock default would cut 2026-01-01 data on a later date
    val synthNow = Some(new java.sql.Timestamp(1767225600000L + 200L * 3600000L))
    val (out, cleanup) = SavedObjects.runNdjsonManaged(df, lines, now = synthNow)
    assert(out.count() > 0)
    assert(!spark.sharedState.cacheManager.isEmpty,
      "import should have pinned shared frames before cleanup")
    cleanup()
    assert(spark.sharedState.cacheManager.isEmpty,
      "cleanup must release every frame the import persisted")
  }

  test("approxCardinalityOrder flag swaps the ORDER key to the HLL sketch") {
    val df = Seq(("x", 1.0, "u1"), ("x", 1.0, "u1"), ("x", 1.0, "u1"),
      ("y", 1.0, "u2"), ("y", 1.0, "u3")).toDF("k", "v", "u")
    val panel = SavedObjects.Panel("p", None,
      Seq(SavedObjects.MetricAgg("1", "cardinality", "u", "m", Seq())),
      Seq(SavedObjects.BucketAgg("terms", "k", 1, "1", orderDesc = true,
        Seq.empty, 86400000L)))
    spark.conf.set("spark.graft.search.approxCardinalityOrder", "true")
    try {
      val out = SavedObjects.run(df, panel)
        .select($"bucket", $"val").as[(String, Long)].collect().toList
      // output cardinality stays EXACT (2 for y); only the order key is
      // sketched — at this cardinality HLL agrees with exact
      assert(out == List(("y", 2L)))
    } finally spark.conf.unset("spark.graft.search.approxCardinalityOrder")
  }

  test("the real export runs at dashboard granularity; the phrase filter reaches every scan") {
    assume(Files.exists(Paths.get(refNdjson)), "reference export not present")
    val lines = Files.readAllLines(Paths.get(refNdjson)).asScala.toSeq
    val dashes = lines.flatMap(l =>
      scala.util.Try(SavedObjects.parseDashboardLine(l)).toOption.flatten)
    assert(dashes.size == 3, s"expected the export's 3 dashboards: $dashes")
    // the two filtered dashboards scope to the TPCDS app (ndjson lines
    // 16/34); panels resolve through references
    val phrased = dashes.filter(_.filters.nonEmpty)
    assert(phrased.size == 2)
    assert(phrased.flatMap(_.filters).toSet == Set(SavedObjects.PhraseFilter(
      "appName.keyword", "TPCDS SQL Benchmark 3000 GB", negate = false)))
    assert(dashes.forall(_.panelIds.nonEmpty))

    // synthesize a parquet-backed frame over every referenced field so
    // pushdown is observable in the physical plan
    val panels = SavedObjects.parseNdjson(lines)
    val numeric = panels.flatMap(p =>
      p.metrics.filter(m => Set("sum", "max", "min", "avg",
        "percentiles").contains(m.kind)).map(_.field) ++
        p.buckets.filter(_.kind == "range").map(_.field)).toSet
    val times = panels.flatMap(_.buckets
      .filter(_.kind == "date_histogram").map(_.field)).toSet
    val fields = (panels.flatMap(p => p.metrics.map(_.field) ++
      p.buckets.map(_.field)).filter(_.nonEmpty) ++
      dashes.flatMap(_.filters.map(_.field))).toSet
    var src = spark.range(200).toDF("id")
    fields.foreach { f =>
      val cname = f.stripSuffix(".keyword")
      val c =
        if (times.contains(f)) to_timestamp(lit(1767225600L) + $"id" * 3600)
        else if (numeric.contains(f)) ($"id" % 37) * 0.7
        else if (cname == "appName")
          when($"id" % 2 === 0, "TPCDS SQL Benchmark 3000 GB")
            .otherwise("other app")
        else concat(lit(cname.take(2)), ($"id" % 5).cast("string"))
      src = src.withColumn(cname, c)
    }
    val dir = Files.createTempDirectory("graft-dash-").toString
    src.write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    // anchor the saved relative windows (now-6M/now-30d/now-1y on four
    // panels) just past the synthetic data so every window covers it —
    // the wall-clock default would cut 2026-01-01 data on a later date
    val synthNow = Some(new java.sql.Timestamp(1767225600000L + 200L * 3600000L))
    val (out, cleanup) = SavedObjects.runDashboardsManaged(df, lines, now = synthNow)
    try {
      assert(out.count() > 0)
      val plan = out.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters") &&
        plan.contains("EqualTo(appName,TPCDS SQL Benchmark 3000 GB)"),
        s"dashboard phrase filter must reach the parquet scans:\n${plan.take(4000)}")
    } finally cleanup()
  }

  test("terms ordering follows the referenced metric id per level") {
    // groups: a(total 60), b(total 100), c(total 10) -> top-2 by sum =
    // b, a; _count order would instead pick a (3 rows) and c (2 rows)
    val df = Seq(
      ("a", 10.0), ("a", 20.0), ("a", 30.0),
      ("b", 100.0), ("c", 4.0), ("c", 6.0)).toDF("k", "v")
    val panel = SavedObjects.Panel("p", None,
      Seq(SavedObjects.MetricAgg("1", "sum", "v", "total", Seq())),
      Seq(SavedObjects.BucketAgg("terms", "k", 2, "1", orderDesc = true,
        Seq.empty, 86400000L)))
    val got = SavedObjects.run(df, panel)
      .select($"bucket", $"val").as[(String, Long)].collect().toSet
    assert(got == Set(("b", 10000L), ("a", 6000L)))
    val byCount = SavedObjects.run(df,
      panel.copy(buckets = panel.buckets.map(_.copy(orderBy = "_count"))))
      .select($"bucket").as[String].collect().toSet
    assert(byCount == Set("a", "c"))
  }

  test("avg- and cardinality-ordered terms rank by the TRUE metric, not its sum partial") {
    // a: 3 rows avg 10, sum 30; b: 1 row avg 20, sum 20 — avg order must
    // pick b first even though a's sum is larger
    val df = Seq(("a", 10.0, "u1"), ("a", 10.0, "u1"), ("a", 10.0, "u1"),
      ("b", 20.0, "u2")).toDF("k", "v", "u")
    val avgPanel = SavedObjects.Panel("p", None,
      Seq(SavedObjects.MetricAgg("1", "avg", "v", "m", Seq())),
      Seq(SavedObjects.BucketAgg("terms", "k", 1, "1", orderDesc = true,
        Seq.empty, 86400000L)))
    assert(SavedObjects.run(df, avgPanel)
      .select($"bucket").as[String].collect().toList == List("b"))
    // c: 2 rows 3 distinct-ish users? — cardinality order: x has 4 rows
    // but 1 distinct user, y has 2 rows with 2 distinct users
    val df2 = Seq(("x", 1.0, "u1"), ("x", 1.0, "u1"), ("x", 1.0, "u1"),
      ("x", 1.0, "u1"), ("y", 1.0, "u2"), ("y", 1.0, "u3")).toDF("k", "v", "u")
    val cardPanel = SavedObjects.Panel("p", None,
      Seq(SavedObjects.MetricAgg("1", "cardinality", "u", "m", Seq())),
      Seq(SavedObjects.BucketAgg("terms", "k", 1, "1", orderDesc = true,
        Seq.empty, 86400000L)))
    assert(SavedObjects.run(df2, cardPanel)
      .select($"bucket").as[String].collect().toList == List("y"))
  }

  test("per-bucket percentiles are exact type-1 quantiles") {
    val df = Seq.tabulate(100)(i => ("g", i / 100.0 + 0.001)).toDF("k", "v")
    val panel = SavedObjects.Panel("p", None,
      Seq(SavedObjects.MetricAgg("1", "percentiles", "v", "pct", Seq(25, 50, 99))),
      Seq(SavedObjects.BucketAgg("terms", "k", 5, "_count", orderDesc = true,
        Seq.empty, 86400000L)))
    val got = SavedObjects.run(df, panel)
      .select($"metric", $"val").as[(String, Long)].collect().toMap
    // cents of row at rank ceil(p*100/100): v_25 = 0.24+0.001 -> 24 ...
    assert(got == Map("pct p25" -> 24L, "pct p50" -> 49L, "pct p99" -> 98L))
  }

  test("randomized differential vs a local panel interpreter") {
    val rnd = new scala.util.Random(20260814L)
    val interval = 3600000L
    for (trial <- 1 to 8) {
      val rows = List.fill(40 + rnd.nextInt(160))((
        s"k${rnd.nextInt(5)}", s"s${rnd.nextInt(3)}",
        rnd.nextInt(1200) / 4.0, s"u${rnd.nextInt(7)}",
        new java.sql.Timestamp(1767225600000L + rnd.nextInt(10) * interval)))
      val df = rows.toDF("k", "sub", "v", "u", "t")
      def cents(x: Double) = math.floor(x * 100).toLong

      // random panel: 1-2 plain metrics + maybe percentiles; 0-2 buckets
      val mkinds = List("sum", "max", "min", "avg", "count", "cardinality")
      val plain = (1 to 1 + rnd.nextInt(2)).map(i => SavedObjects.MetricAgg(
        i.toString, mkinds(rnd.nextInt(mkinds.length)),
        if (rnd.nextBoolean()) "v" else "u", s"m$i", Seq())).toList
      val pcts = if (rnd.nextBoolean())
        List(SavedObjects.MetricAgg("9", "percentiles", "v", "pp", Seq(30, 80)))
      else Nil
      // metrics on "u" must be cardinality/count (non-numeric otherwise)
      val metrics = plain.map(m =>
        if (m.field == "u" && !Set("count", "cardinality").contains(m.kind))
          m.copy(kind = "cardinality") else m) ++ pcts
      val ranges = Seq((None, Some(100.0)), (Some(100.0), Some(200.0)),
        (Some(200.0), None)).map { case (a, b) =>
          (a: Option[Double], b: Option[Double]) }
      val bkinds = List.fill(rnd.nextInt(3))(
        List("terms", "range", "date_histogram")(rnd.nextInt(3)))
      var termsFieldPool = List("k", "sub")
      val buckets = bkinds.flatMap {
        case "terms" if termsFieldPool.nonEmpty =>
          val f = termsFieldPool.head; termsFieldPool = termsFieldPool.tail
          val orderBy = List("_count", "_key", metrics.head.id)(rnd.nextInt(3))
          Some(SavedObjects.BucketAgg("terms", f, 1 + rnd.nextInt(3), orderBy,
            rnd.nextBoolean(), Seq.empty, interval))
        case "range" =>
          Some(SavedObjects.BucketAgg("range", "v", 5, "_count", true,
            ranges, interval))
        case "date_histogram" =>
          Some(SavedObjects.BucketAgg("date_histogram", "t", 5, "_count", true,
            Seq.empty, interval))
        case _ => None
      }
      val panel = SavedObjects.Panel(s"t$trial", None, metrics, buckets)

      // ---- local interpreter ----
      type Row5 = (String, String, Double, String, java.sql.Timestamp)
      def fmt(d: Double) =
        if (d == math.floor(d) && !d.isInfinite) d.toLong.toString else d.toString
      def label(b: SavedObjects.BucketAgg, r: Row5): Option[String] = b.kind match {
        case "terms" => Some(if (b.field == "k") r._1 else r._2)
        case "date_histogram" =>
          Some((r._5.getTime / interval).toString)
        case "range" =>
          b.ranges.collectFirst {
            case (lo, hi) if lo.forall(r._3 >= _) && hi.forall(r._3 < _) =>
              s"${lo.fold("*")(fmt)}-${hi.fold("*")(fmt)}"
          }
      }
      // rows → full label path (drop rows outside every range bucket)
      val labeled = rows.flatMap { r =>
        val ls = buckets.map(label(_, r))
        if (ls.exists(_.isEmpty)) None else Some((ls.map(_.get), r))
      }
      def fieldVal(f: String, r: Row5): Double = if (f == "v") r._3 else 0.0
      def metricVal(m: SavedObjects.MetricAgg, rs: List[Row5]): Long = m.kind match {
        case "count" => rs.length.toLong
        case "cardinality" =>
          rs.map(r => if (m.field == "u") r._4 else fieldVal(m.field, r)).distinct.length.toLong
        case "sum" => rs.map(r => cents(fieldVal(m.field, r))).sum
        case "max" => rs.map(r => cents(fieldVal(m.field, r))).max
        case "min" => rs.map(r => cents(fieldVal(m.field, r))).min
        case "avg" =>
          val s = rs.map(r => cents(fieldVal(m.field, r))).sum
          if (rs.nonEmpty) s / rs.length else 0L
        case _ => 0L
      }
      def orderVal(orderBy: String, rs: List[Row5]): Double = orderBy match {
        case "_count" => rs.length.toDouble
        case id => metrics.find(m => m.id == id && m.kind != "percentiles") match {
          case None => rs.length.toDouble
          case Some(m) => m.kind match {
            case "avg" =>
              rs.map(r => cents(fieldVal(m.field, r))).sum.toDouble / rs.length
            case _ => metricVal(m, rs).toDouble
          }
        }
      }
      // survivor pruning level by level
      var groups: List[(List[String], List[Row5])] =
        labeled.groupBy(_._1).view.mapValues(_.map(_._2)).toList
      buckets.zipWithIndex.foreach { case (b, i) =>
        if (b.kind == "terms") {
          val byPrefix = groups.flatMap { case (p, rs) =>
            rs.map(r => (p.take(i), p(i), r)) }
            .groupBy(_._1)
          val keep: Set[List[String]] = byPrefix.flatMap { case (pref, xs) =>
            val perKey = xs.groupBy(_._2).view
              .mapValues(_.map(_._3)).toList
            val ranked =
              if (b.orderBy == "_key")
                perKey.sortBy(_._1)(if (b.orderDesc) Ordering[String].reverse
                  else Ordering[String])
              else perKey.sortBy { case (key, rs) =>
                (if (b.orderDesc) -orderVal(b.orderBy, rs)
                 else orderVal(b.orderBy, rs), key)
              }(Ordering.Tuple2(Ordering[Double], Ordering[String]))
            ranked.take(b.size).map(t => pref :+ t._1)
          }.toSet
          groups = groups.filter { case (p, _) => keep(p.take(i + 1)) }
        }
      }
      val want: Set[(String, String, Long)] = (groups match {
        case g if buckets.nonEmpty => g
        case _ => List((List("all"), rows))
      }).flatMap { case (p, rs) =>
        val bucket = if (buckets.isEmpty) "all" else p.mkString("/")
        val plainRows = metrics.filter(_.kind != "percentiles")
          .map(m => (bucket, m.label, metricVal(m, rs)))
        val pctRows = metrics.filter(_.kind == "percentiles").flatMap { m =>
          val sorted = rs.map(r => cents(fieldVal(m.field, r))).sorted
          m.percents.map { p =>
            val rank = math.max(1, (p * sorted.length + 99) / 100)
            (bucket, s"${m.label} p$p", sorted(rank.toInt - 1))
          }
        }
        plainRows ++ pctRows
      }.toSet

      val got = SavedObjects.run(df, panel)
        .select($"bucket", $"metric", $"val").as[(String, String, Long)]
        .collect().toSet
      assert(got == want,
        s"trial $trial panel=$panel\n missing=${want -- got}\n extra=${got -- want}")
    }
  }

  test("the reference's full dashboard export imports and executes") {
    assume(Files.exists(Paths.get(refNdjson)), "reference export not present")
    val lines = Files.readAllLines(Paths.get(refNdjson)).asScala.toSeq
    val panels = SavedObjects.parseNdjson(lines)
    // every agg-bearing visualization imports; the export's 34 objects
    // hold well over a dozen of them
    assert(panels.size >= 15, s"only ${panels.size} panels imported")
    val kinds = panels.flatMap(p =>
      p.metrics.map(_.kind) ++ p.buckets.map(_.kind)).toSet
    assert(Set("cardinality", "sum", "max", "percentiles", "terms",
      "range", "date_histogram").subsetOf(kinds), s"vocabulary seen: $kinds")

    // a task-metrics-shaped frame covering every referenced field:
    // numeric where a value/range agg reads it, timestamp for
    // date_histogram, string otherwise
    val numeric = panels.flatMap(p =>
      p.metrics.filter(m => Set("sum", "max", "min", "avg",
        "percentiles").contains(m.kind)).map(_.field) ++
        p.buckets.filter(_.kind == "range").map(_.field)).toSet
    val times = panels.flatMap(_.buckets
      .filter(_.kind == "date_histogram").map(_.field)).toSet
    val fields = panels.flatMap(p => p.metrics.map(_.field) ++
      p.buckets.map(_.field)).filter(_.nonEmpty).toSet
    var df = spark.range(200).toDF("id")
    fields.foreach { f =>
      val cname = f.stripSuffix(".keyword")
      val c =
        if (times.contains(f))
          to_timestamp(lit(1767225600L) + $"id" * 3600)
        else if (numeric.contains(f)) ($"id" % 37) * 0.7
        else concat(lit(cname.take(2)), ($"id" % 5).cast("string"))
      df = df.withColumn(cname, c)
    }
    // anchor the saved relative windows (now-6M/now-30d/now-1y on four
    // panels) just past the synthetic data so every window covers it —
    // the wall-clock default would cut 2026-01-01 data on a later date
    val synthNow = Some(new java.sql.Timestamp(1767225600000L + 200L * 3600000L))
    panels.foreach { p =>
      val out = SavedObjects.run(df, p, now = synthNow)
      assert(out.columns.toSeq == Seq("panel", "bucket", "metric", "val"),
        s"${p.title}: ${out.columns.toSeq}")
      assert(out.count() > 0, s"${p.title} returned no rows")
    }
  }

  test("the real export's three index-patterns parse with ids, globs, time field, field lists") {
    assume(Files.exists(Paths.get(refNdjson)), "reference export not present")
    val lines = Files.readAllLines(Paths.get(refNdjson)).asScala.toSeq
    val pats = SavedObjects.parseIndexPatterns(lines)
    assert(pats.values.map(_.title).toSet ==
      Set("spark-stage-agg-metrics*", "spark-task-metrics*", "spark-logs*"))
    assert(pats.values.forall(_.timeField == Some("@timestamp")))
    // the advertised field lists parse from the JSON-string attribute
    assert(pats.values.forall(_.fields.nonEmpty))
    val task = pats.values.find(_.title.startsWith("spark-task")).get
    assert(task.fields.exists { case (n, t) => n == "runTime" && t == "number" })
    // every visualization/search of the export references exactly one
    // of the three patterns (markdown/control panels aside)
    val panels = SavedObjects.parseNdjson(lines)
    assert(panels.forall(p => p.indexRef.exists(pats.contains)),
      s"unreferenced panels: ${panels.filter(_.indexRef.isEmpty).map(_.title)}")
    val srch = lines.flatMap(l =>
      scala.util.Try(SavedObjects.parseSearchLine(l)).toOption.flatten).head
    assert(srch.indexRef.exists(id => pats(id).title == "spark-logs*"))
    assert(SavedObjects.parseIndexPatternLine(
      """{"type":"visualization","attributes":{"title":"x"}}""").isEmpty)
  }

  test("index title globs match table names") {
    assert(SavedObjects.indexTitleMatches("spark-task-metrics*",
      "spark-task-metrics-000001"))
    assert(SavedObjects.indexTitleMatches("spark-task-metrics*",
      "spark-task-metrics"))
    assert(!SavedObjects.indexTitleMatches("spark-task-metrics*",
      "spark-stage-agg-metrics"))
    assert(SavedObjects.indexTitleMatches("exact", "exact"))
    assert(!SavedObjects.indexTitleMatches("exact", "exactly"))
    assert(SavedObjects.indexTitleMatches("a*b*", "a-x-b-y"))
    // a glob metacharacter in the name is literal, not regex
    assert(!SavedObjects.indexTitleMatches("a.c", "abc"))
  }

  test("the real export routes each panel to its own index's table") {
    assume(Files.exists(Paths.get(refNdjson)), "reference export not present")
    val lines = Files.readAllLines(Paths.get(refNdjson)).asScala.toSeq
    val pats = SavedObjects.parseIndexPatterns(lines)
    val panels = SavedObjects.parseNdjson(lines)
    val numeric = panels.flatMap(p =>
      p.metrics.filter(m => Set("sum", "max", "min", "avg",
        "percentiles").contains(m.kind)).map(_.field) ++
        p.buckets.filter(_.kind == "range").map(_.field)).toSet
    val times = panels.flatMap(_.buckets
      .filter(_.kind == "date_histogram").map(_.field)).toSet
    // one frame per index-pattern, carrying ONLY the fields that
    // pattern's panels reference (plus the dashboard filter field) and
    // a DIFFERENT row count per index — a panel run against the wrong
    // table would either fail resolution or report the wrong count
    val rowsOf = Map("spark-stage-agg-metrics*" -> 60,
      "spark-task-metrics*" -> 90, "spark-logs*" -> 30)
    val tables = pats.values.map { ip =>
      val mine = panels.filter(_.indexRef.contains(ip.id))
      val fields = mine.flatMap(p => p.metrics.map(_.field) ++
        p.buckets.map(_.field)).filter(_.nonEmpty).toSet + "appName.keyword"
      var df = spark.range(rowsOf(ip.title).toLong).toDF("id")
      fields.foreach { f =>
        val cname = f.stripSuffix(".keyword")
        val c =
          if (times.contains(f))
            to_timestamp(lit(1767225600L) + $"id" * 3600)
          else if (numeric.contains(f)) ($"id" % 37) * 0.7
          else if (cname == "appName")
            lit("TPCDS SQL Benchmark 3000 GB")
          else concat(lit(cname.take(2)), ($"id" % 5).cast("string"))
        df = df.withColumn(cname, c)
      }
      ip.title.stripSuffix("*") -> df
    }.toMap
    val synthNow = Some(new java.sql.Timestamp(1767225600000L + 200L * 3600000L))
    val (out, cleanup) = SavedObjects.runExportDashboardsManaged(
      tables, lines, now = synthNow)
    try {
      val rows = out.collect().map(r => (r.getString(0), r.getString(2),
        r.getLong(3)))
      // the logs-index search member counts the LOGS table's 30 rows,
      // not the task table's 90
      val hits = rows.filter(_._2 == "hits")
      assert(hits.nonEmpty && hits.forall(_._3 == 30L), hits.toList)
      // a task-metrics metric-only panel aggregates the 90-row task
      // frame: its count-kind panels report 90
      val taskCounts = rows.filter { case (p, m, _) =>
        p.endsWith("Number of spark jobs(s) within an application run") }
      assert(taskCounts.nonEmpty)
      // cardinality(jobId) over j0..j4 = 5 on the stage frame
      assert(taskCounts.forall(_._3 > 0))
    } finally cleanup()

    // panel granularity routes the same way
    val flat = SavedObjects.runExport(tables, lines, now = synthNow)
    assert(flat.count() > 0)
  }

  test("multi-index dashboard filters: a match_phrase on a missing field matches nothing (negated: everything)") {
    val metrics = Seq(("appA", 10.0), ("appB", 20.0)).toDF("appName", "v")
    val logs = Seq("boom", "fine").toDF("message") // no appName column
    val lines = Seq(
      """{"type":"index-pattern","id":"ipm","attributes":{"title":"metrics*"}}""",
      """{"type":"index-pattern","id":"ipl","attributes":{"title":"logs*"}}""",
      """{"type":"dashboard","attributes":{"title":"d","kibanaSavedObjectMeta":{"searchSourceJSON":"{\"query\":{\"query\":\"\",\"language\":\"kuery\"},\"filter\":[{\"meta\":{\"negate\":false,\"disabled\":false},\"query\":{\"match_phrase\":{\"appName.keyword\":\"appA\"}}}]}"}},"references":[{"id":"v1","name":"panel_0","type":"visualization"},{"id":"s1","name":"panel_1","type":"search"}]}""",
      """{"type":"visualization","id":"v1","attributes":{"title":"sums","visState":"{\"type\":\"metric\",\"aggs\":[{\"id\":\"1\",\"enabled\":true,\"type\":\"sum\",\"params\":{\"field\":\"v\",\"customLabel\":\"total\"},\"schema\":\"metric\"}]}"},"references":[{"id":"ipm","name":"kibanaSavedObjectMeta.searchSourceJSON.index","type":"index-pattern"}]}""",
      """{"type":"search","id":"s1","attributes":{"title":"logs","columns":["message"],"kibanaSavedObjectMeta":{"searchSourceJSON":"{\"query\":{\"query\":\"\",\"language\":\"kuery\"},\"filter\":[]}"}},"references":[{"id":"ipl","name":"kibanaSavedObjectMeta.searchSourceJSON.index","type":"index-pattern"}]}""")
    val tables = Map("metrics" -> metrics, "logs" -> logs)
    val got = SavedObjects.runExportDashboards(tables, lines)
      .select($"panel", $"metric", $"val").as[(String, String, Long)]
      .collect().toSet
    // metrics member: filter applies (appA only → 1000 cents); logs
    // member LACKS appName → positive phrase matches no doc → 0 hits
    assert(got == Set(("d/sums", "total", 1000L), ("d/logs", "hits", 0L)))

    // negated: the missing-field member keeps every row (ES must_not)
    val neg = lines.map(_.replace("\\\"negate\\\":false", "\\\"negate\\\":true"))
    val gotN = SavedObjects.runExportDashboards(tables, neg)
      .select($"panel", $"metric", $"val").as[(String, String, Long)]
      .collect().toSet
    assert(gotN == Set(("d/sums", "total", 2000L), ("d/logs", "hits", 2L)))
  }

  test("the global time picker cuts each member on ITS index's declared time field") {
    val t0 = 1704067200000L // 2024-01-01T00:00:00Z
    // metrics index keeps time in metricTime, logs in logTime — 20
    // daily rows each (days 0..19); a now-7d picker (now = day 20)
    // keeps days 13..19 = 7 rows per index, each cut on its OWN field
    val metrics = Seq.tabulate(20)(i =>
      (new java.sql.Timestamp(t0 + i * 86400000L), 1.0))
      .toDF("metricTime", "v")
    val logs = Seq.tabulate(20)(i =>
      (new java.sql.Timestamp(t0 + i * 86400000L), s"m$i"))
      .toDF("logTime", "message")
    val now = new java.sql.Timestamp(t0 + 20L * 86400000L)
    val lines = Seq(
      """{"type":"index-pattern","id":"ipm","attributes":{"title":"metrics*","timeFieldName":"metricTime"}}""",
      """{"type":"index-pattern","id":"ipl","attributes":{"title":"logs*","timeFieldName":"logTime"}}""",
      """{"type":"index-pattern","id":"ipn","attributes":{"title":"notime*"}}""",
      """{"type":"visualization","attributes":{"title":"m_count","visState":"{\"type\":\"metric\",\"aggs\":[{\"id\":\"1\",\"enabled\":true,\"type\":\"count\",\"params\":{\"customLabel\":\"n\"},\"schema\":\"metric\"}]}"},"references":[{"id":"ipm","name":"kibanaSavedObjectMeta.searchSourceJSON.index","type":"index-pattern"}]}""",
      """{"type":"visualization","attributes":{"title":"l_count","visState":"{\"type\":\"metric\",\"aggs\":[{\"id\":\"1\",\"enabled\":true,\"type\":\"count\",\"params\":{\"customLabel\":\"n\"},\"schema\":\"metric\"}]}"},"references":[{"id":"ipl","name":"kibanaSavedObjectMeta.searchSourceJSON.index","type":"index-pattern"}]}""",
      """{"type":"visualization","attributes":{"title":"n_count","visState":"{\"type\":\"metric\",\"aggs\":[{\"id\":\"1\",\"enabled\":true,\"type\":\"count\",\"params\":{\"customLabel\":\"n\"},\"schema\":\"metric\"}]}"},"references":[{"id":"ipn","name":"kibanaSavedObjectMeta.searchSourceJSON.index","type":"index-pattern"}]}""")
    val tables = Map("metrics" -> metrics, "logs" -> logs,
      "notime" -> logs)
    val got = SavedObjects.runExport(tables, lines, now = Some(now),
        globalRange = Some(("now-7d", "now")))
      .select($"panel", $"val").as[(String, Long)].collect().toMap
    // a pattern with NO declared time field passes through unfiltered
    assert(got == Map("m_count" -> 7L, "l_count" -> 7L, "n_count" -> 20L))
    // no picker, no cut
    val bare = SavedObjects.runExport(tables, lines, now = Some(now))
      .select($"panel", $"val").as[(String, Long)].collect().toMap
    assert(bare == Map("m_count" -> 20L, "l_count" -> 20L, "n_count" -> 20L))
    // an auto date_histogram inside a picker-cut member derives its
    // rung from the FILTERED span (6 days between the surviving daily
    // samples → need 10368 s → the 3 h rung; each midnight sample its
    // own bucket), not from the 20-day unfiltered span
    val histLine =
      """{"type":"visualization","attributes":{"title":"m_hist","visState":"{\"type\":\"line\",\"aggs\":[{\"id\":\"1\",\"enabled\":true,\"type\":\"count\",\"params\":{\"customLabel\":\"n\"},\"schema\":\"metric\"},{\"id\":\"2\",\"enabled\":true,\"type\":\"date_histogram\",\"params\":{\"field\":\"metricTime\",\"interval\":\"auto\"},\"schema\":\"segment\"}]}"},"references":[{"id":"ipm","name":"kibanaSavedObjectMeta.searchSourceJSON.index","type":"index-pattern"}]}"""
    val hist = SavedObjects.runExport(tables, Seq(lines.head, histLine),
        now = Some(now), globalRange = Some(("now-7d", "now")))
      .select($"bucket").as[String].collect()
    assert(hist.length == 7, s"7 in-window buckets: ${hist.toList}")
    // unsupported picker shapes are ignored tolerantly
    val junk = SavedObjects.runExport(tables, lines, now = Some(now),
        globalRange = Some(("2024-01-01", "now")))
      .select($"panel", $"val").as[(String, Long)].collect().toMap
    assert(junk == bare)
  }

  test("export routing falls back to the default frame; unresolvable panels skip") {
    val ev = Seq(1.0, 2.0).toDF("v")
    val other = Seq(5.0).toDF("v")
    val lines = Seq(
      """{"type":"index-pattern","id":"ip1","attributes":{"title":"known*"}}""",
      """{"type":"visualization","attributes":{"title":"routed","visState":"{\"type\":\"metric\",\"aggs\":[{\"id\":\"1\",\"enabled\":true,\"type\":\"count\",\"params\":{\"customLabel\":\"n\"},\"schema\":\"metric\"}]}"},"references":[{"id":"ip1","name":"kibanaSavedObjectMeta.searchSourceJSON.index","type":"index-pattern"}]}""",
      """{"type":"visualization","attributes":{"title":"refless","visState":"{\"type\":\"metric\",\"aggs\":[{\"id\":\"1\",\"enabled\":true,\"type\":\"count\",\"params\":{\"customLabel\":\"n\"},\"schema\":\"metric\"}]}"}}""",
      """{"type":"visualization","attributes":{"title":"dangling","visState":"{\"type\":\"metric\",\"aggs\":[{\"id\":\"1\",\"enabled\":true,\"type\":\"count\",\"params\":{\"customLabel\":\"n\"},\"schema\":\"metric\"}]}"},"references":[{"id":"ip-gone","name":"kibanaSavedObjectMeta.searchSourceJSON.index","type":"index-pattern"}]}""")
    val tables = Map("known-1" -> other)
    // with a default: routed → known-1 (1 row), refless AND dangling →
    // default events (2 rows)
    val got = SavedObjects.runExport(tables, lines, default = Some(ev))
      .select($"panel", $"val").as[(String, Long)].collect().toSet
    assert(got == Set(("routed", 1L), ("refless", 2L), ("dangling", 2L)))
    // without a default the unroutable panels skip tolerantly
    val bare = SavedObjects.runExport(tables, lines)
      .select($"panel", $"val").as[(String, Long)].collect().toSet
    assert(bare == Set(("routed", 1L)))
    // an empty import still needs a session to shape its empty frame
    assertThrows[IllegalArgumentException] {
      SavedObjects.runExport(Map.empty, Seq.empty)
    }
  }
}
