package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.sources.Tables

class DashboardsSpec extends SparkTestBase {
  import spark.implicits._

  test("approxCardinality is within the configured HLL error of exact") {
    val exact = Analytics.q02Cardinality(spark, sfSmoke)
      .select($"o_orderpriority", $"n_cust", $"n_orders")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val approx = Dashboards.approxCardinality(Tables.orders(spark, sfSmoke), rsd = 0.05)
      .select($"o_orderpriority", $"n_cust", $"n_orders")
      .as[(String, Long, Long)].collect()
    assert(approx.nonEmpty)
    approx.foreach { case (k, cust, orders) =>
      val (ec, eo) = exact(k)
      // 4 standard errors at rsd=0.05 — deterministic sketch, generous bound
      assert(math.abs(cust - ec) <= math.max(2, ec * 0.2), s"$k cust $cust vs $ec")
      assert(math.abs(orders - eo) <= math.max(2, eo * 0.2), s"$k orders $orders vs $eo")
    }
  }

  test("approxPercentiles lands within one rank-error of exact percentiles") {
    val exact = Analytics.q06Percentiles(spark, sfSmoke)
      .select($"l_returnflag", $"p50", $"p99")
      .as[(String, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val approx = Dashboards.approxPercentiles(Tables.lineitem(spark, sfSmoke))
      .select($"l_returnflag", $"p50", $"p99")
      .as[(String, Double, Double)].collect()
    assert(approx.nonEmpty)
    approx.foreach { case (k, p50, p99) =>
      val (e50, e99) = exact(k)
      // GK returns an actual element; exact interpolates — allow one unit
      assert(math.abs(p50 - e50) <= 1.0, s"$k p50 $p50 vs $e50")
      assert(math.abs(p99 - e99) <= 1.0, s"$k p99 $p99 vs $e99")
    }
  }

  test("approxTopTerms: CMS never undercounts, stays within eps*N, finds the exact top-k") {
    import graft.sources.Tables
    val docs = Tables.documents(spark, sfSmoke)
    val n = docs.count()
    val eps = 0.001
    val exact = docs.groupBy($"source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Dashboards.approxTopTerms(docs, "source", k = 5, eps = eps)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(got.nonEmpty)
    got.foreach { case (term, est) =>
      val ex = exact(term)
      assert(est >= ex, s"CMS undercounted $term: $est < $ex")
      assert(est <= ex + (eps * n).ceil.toLong, s"$term overcount beyond eps*N: $est vs $ex")
    }
    // with well-separated counts the approximate top-k IS the exact top-k
    val exactTop = exact.toSeq.sortBy { case (t, c) => (-c, t) }.take(5).map(_._1)
    assert(got.map(_._1).toSeq == exactTop)
  }

  test("gated sketch queries: every ok flag true, oracle SQL materializes after a run") {
    val gated = Seq("q26_approx_cardinality", "q27_approx_percentiles",
      "q40_approx_top_terms", "q70_sketch_table")
    gated.foreach { name =>
      val rows = Dashboards.all(name)(spark, sfSmoke).collect()
      assert(rows.nonEmpty, name)
      val okCols = rows.head.schema.fieldNames.filter(f =>
        f == "ok" || f.startsWith("ok") || f.endsWith("_ok"))
      assert(okCols.nonEmpty, s"$name has no ok columns")
      rows.foreach(r => okCols.foreach(c =>
        assert(r.getAs[Boolean](c), s"$name.$c false: $r")))
    }
    // the dynamic oracle is populated once the queries have run, and the
    // estimate literals it embeds are plain SQL (VALUES lists / a CAST)
    val o = Dashboards.oracle
    gated.foreach { name =>
      assert(o.contains(name), s"$name missing from dynamic oracle")
      assert(o(name).contains("TRUE AS"), name)
    }
  }

  test("searchLogsDeep filters on severity, root-cause class and cause depth") {
    import graft.ingest.Transforms
    val err =
      """{"appName":"a","appId":"app-9","executorId":"2","logTime":1767225600000,
        |"level":{"intLevel":200,"name":"ERROR","standardLevel":"ERROR"},
        |"message":{"message":"write failed"},
        |"contextData":{"taskName":"task 4.0 in stage 7.0 (TID 42)"},
        |"thrownProxy":{"name":"java.lang.RuntimeException","message":"outer",
        | "localizedMessage":"outer","commonElementCount":0,
        | "extendedStackTrace":[{"stackTraceElement":{"declaringClass":"graft.Job",
        |   "fileName":"Job.scala","lineNumber":33,"methodName":"run"}}],
        | "causeProxy":{"name":"java.io.IOException","message":"inner",
        |  "localizedMessage":"inner","commonElementCount":1,
        |  "extendedStackTrace":[]}}}""".stripMargin.replaceAll("\n", "")
    val info =
      """{"appName":"a","appId":"app-9","executorId":"2","logTime":1767225601000,
        |"level":{"intLevel":400,"name":"INFO","standardLevel":"INFO"},
        |"message":{"message":"write ok"},
        |"contextData":{"taskName":"task 1.0 in stage 2.0 (TID 1)"}}"""
        .stripMargin.replaceAll("\n", "")
    val logs = Transforms.projectLogRecordsDeep(
      spark.read.schema(Transforms.rawLogSchemaDeep).json(Seq(err, info).toDS()))
    val hit = Dashboards.searchLogsDeep(logs, contains = "write",
      maxIntLevel = 300L, rootCause = Some("java.io.IOException"), minCauseDepth = 2L)
      .collect()
    assert(hit.length == 1)
    assert(hit(0).getAs[Long]("errLine") == 33L &&
      hit(0).getAs[String]("levelName") == "ERROR")
    // depth/severity guards exclude the INFO row even with permissive text
    assert(Dashboards.searchLogsDeep(logs, minCauseDepth = 1L).count() == 1)
    assert(Dashboards.searchLogsDeep(logs).count() == 2)
  }

  test("relativeTimeFilter keeps exactly the trailing interval") {
    val now = Timestamp.valueOf("2025-06-30 00:00:00")
    val df = Seq("2025-06-29 23:00:00", "2025-06-01 00:00:00", "2025-07-01 00:00:00")
      .toDF("s").select(to_timestamp($"s").as("ts"))
    val kept = df.filter(Dashboards.relativeTimeFilter($"ts", now, "7 DAYS"))
      .as[Timestamp].collect()
    assert(kept.map(_.toString).toSeq == Seq("2025-06-29 23:00:00.0"))
  }

  test("sketch table: merged range estimate == direct sketch, within 5% of exact") {
    val path = java.nio.file.Files.createTempDirectory("graft-hll-spec")
      .resolve("sk").toString
    // 3 days × overlapping user sets
    val ev = (0 until 3000).map(i => (i.toLong % 700, (i % 3).toLong * 86400000L))
      .toDF("user_id", "ms").withColumn("ts", timestamp_millis($"ms"))
    Dashboards.writeCardinalitySketchTable(ev, "user_id",
      floor(unix_millis($"ts") / 86400000L).cast("long"), path)
    val got = Dashboards.rangeCardinality(spark, path, 0, 1)
      .as[(Long, Long, Long)].collect().head
    assert(got._1 == 2 && got._2 == 2000)
    // lossless union: merged sketches == one sketch over the raw union
    val direct = ev.filter($"ms" < 2 * 86400000L)
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id))")).head().getLong(0)
    assert(got._3 == direct)
    val exact = ev.filter($"ms" < 2 * 86400000L)
      .select($"user_id").distinct().count()
    assert(math.abs(got._3 - exact).toDouble / exact < 0.05)
  }

  test("searchLogsKuery runs a saved-search query string over the logs table") {
    val logs = Seq(
      ("TPCDS SQL Benchmark 3000 GB", "app", "1", "1.0", "2.0", 200L, "ERROR",
        "oom on shuffle", Timestamp.valueOf("2026-01-01 00:00:01")),
      ("TPCDS SQL Benchmark 3000 GB", "app", "1", "1.0", "2.0", 400L, "INFO",
        "all fine", Timestamp.valueOf("2026-01-01 00:00:02")),
      ("other app", "app2", "2", "3.0", "4.0", 200L, "ERROR", "oom elsewhere",
        Timestamp.valueOf("2026-01-01 00:00:03"))
    ).toDF("appName", "appId", "executorId", "taskId", "stageId",
        "intLevel", "levelName", "message", "logTime")
      .withColumn("level", struct($"intLevel", $"levelName".as("name")))
    // the reference's phrase filter + severity + free text, as ONE string
    val got = Dashboards.searchLogsKuery(logs,
      "appName.keyword: \"TPCDS SQL Benchmark 3000 GB\" and level.intLevel <= 300 and oom")
      .collect()
    assert(got.length == 1 && got(0).getAs[String]("message") == "oom on shuffle")
    assert(got(0).getAs[String]("level") == "ERROR")
  }

  test("searchLogs filters severity ≤ maxIntLevel and projects the saved-search columns") {
    val logs = Seq(
      ("a", "app", "1", "1.0", "2.0", 200L, "ERROR", "task failed: oom",
        Timestamp.valueOf("2026-01-01 00:00:01")),
      ("a", "app", "1", "1.0", "2.0", 400L, "INFO", "task failed retry scheduled",
        Timestamp.valueOf("2026-01-01 00:00:02")),
      ("a", "app", "1", "2.0", "2.0", 200L, "ERROR", "all good",
        Timestamp.valueOf("2026-01-01 00:00:03"))
    ).toDF("appName", "appId", "executorId", "taskId", "stageId",
        "intLevel", "levelName", "message", "logTime")
      .withColumn("level", struct($"intLevel", $"levelName".as("name")))
    val got = Dashboards.searchLogs(logs, "task failed", maxIntLevel = 300L)
    assert(got.columns.toSeq == Seq("appName", "appId", "executorId",
      "taskId", "stageId", "level", "message", "logTime"))
    val rows = got.collect()
    assert(rows.length == 1 && rows(0).getAs[String]("message") == "task failed: oom")
  }
}
