package graft.ingest

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions.struct

import graft.SparkTestBase

/** PipelineConfig: the Data Prepper YAML subset the reference's two
  * ingestion pipelines use, parsed from the REAL files and executed as
  * DataFrame routing.
  */
class PipelineConfigSpec extends SparkTestBase {
  import spark.implicits._

  private val pipelinesDir =
    "/root/reference/deployment/infra/resources/pipelines"

  test("the real metrics pipeline parses: source path, 2 routes, 2 routed sinks") {
    assume(Files.exists(Paths.get(s"$pipelinesDir/metrics-pipeline.yaml")),
      "reference pipelines not present")
    val cfg = PipelineConfig.parse(new String(Files.readAllBytes(
      Paths.get(s"$pipelinesDir/metrics-pipeline.yaml"))))
    assert(cfg.sourcePath == Some("/ingest"))
    assert(cfg.routes.map(_.name) == Seq("task-metrics", "stage-agg-metrics"))
    assert(cfg.routes.forall(r => r.field == "metricsType" && r.op == "=="))
    assert(cfg.routes.map(_.value) ==
      Seq(Left("taskMetrics"), Left("stageAggMetrics")))
    assert(cfg.sinks == Seq(
      PipelineConfig.Sink("spark-stage-agg-metrics", Seq("stage-agg-metrics")),
      PipelineConfig.Sink("spark-task-metrics", Seq("task-metrics"))))
  }

  test("the real logs pipeline parses: no routes, one catch-all sink") {
    assume(Files.exists(Paths.get(s"$pipelinesDir/logs-pipeline.yaml")),
      "reference pipelines not present")
    val cfg = PipelineConfig.parse(new String(Files.readAllBytes(
      Paths.get(s"$pipelinesDir/logs-pipeline.yaml"))))
    assert(cfg.sourcePath == Some("/ingest"))
    assert(cfg.routes.isEmpty)
    assert(cfg.sinks == Seq(PipelineConfig.Sink("spark-logs", Seq.empty)))
  }

  test("routed frames reproduce Transforms.route; unrouted sinks get everything") {
    val df = Seq(
      ("taskMetrics", 1L), ("taskMetrics", 2L), ("stageAggMetrics", 3L),
      ("other", 4L))
      .toDF("metricsType", "v")
    val cfg = PipelineConfig.parse(
      """version: "2"
        |pipeline:
        |  source:
        |    http:
        |      path: "/ingest"
        |  route:
        |    - task-metrics: '/metricsType == "taskMetrics"'
        |    - stage-agg-metrics: '/metricsType == "stageAggMetrics"'
        |  sink:
        |    - opensearch:
        |        index: "spark-task-metrics"
        |        routes:
        |          - task-metrics
        |    - opensearch:
        |        index: "everything"
        |""".stripMargin)
    val frames = cfg.routedFrames(df).toMap
    assert(frames.keySet == Set("spark-task-metrics", "everything"))
    assert(frames("spark-task-metrics").as[(String, Long)].collect().toSet ==
      Set(("taskMetrics", 1L), ("taskMetrics", 2L)))
    assert(frames("everything").count() == 4L)
    // the config-driven route ≡ the hard-coded Transforms.route
    assert(frames("spark-task-metrics").collect().toSet ==
      Transforms.route(df, "taskMetrics").collect().toSet)
  }

  test("a multi-route sink ORs its routes; != is null-safe (missing key matches)") {
    val df = Seq(Option("a"), Option("b"), Option("c"), None)
      .toDF("k")
    val cfg = PipelineConfig.parse(
      """pipeline:
        |  route:
        |    - is-a: '/k == "a"'
        |    - is-b: '/k == "b"'
        |    - not-a: '/k != "a"'
        |  sink:
        |    - opensearch:
        |        index: "ab"
        |        routes:
        |          - is-a
        |          - is-b
        |    - opensearch:
        |        index: "rest"
        |        routes:
        |          - not-a
        |""".stripMargin)
    val frames = cfg.routedFrames(df).toMap
    assert(frames("ab").as[Option[String]].collect().toSet ==
      Set(Option("a"), Option("b")))
    // Data Prepper's != matches records whose key differs OR is absent
    assert(frames("rest").as[Option[String]].collect().toSet ==
      Set(Option("b"), Option("c"), None))
  }

  test("the dev compose pipeline's freely-named block parses; its processor vocabulary compiles onto the A15 transforms") {
    // the dev file names its pipeline `dev-pipeline:` and (commented
    // out there) declares the three dormant processors — this is that
    // block uncommented, grok matching the reference's MDC taskName
    // pattern on a flat column
    val cfg = PipelineConfig.parse(
      """dev-pipeline:
        |  delay: 1000
        |  source:
        |    http:
        |      path: "/ingest"
        |  processor:
        |    - date:
        |        from_time_received: true
        |        destination: "ingestTime"
        |    - delete_entries:
        |        with_keys: ["threadId","threadName","threadPriority"]
        |    - grok:
        |        match:
        |          mdcTaskName: ['task %{NUMBER:taskId} in stage %{NUMBER:stageId} \(TID %{NUMBER:tid}\)']
        |  sink:
        |    - opensearch:
        |        index: spark-logs
        |""".stripMargin)
    assert(cfg.sourcePath == Some("/ingest"))
    assert(cfg.routes.isEmpty)
    assert(cfg.sinks == Seq(PipelineConfig.Sink("spark-logs", Seq.empty)))
    assert(cfg.processors == Seq(
      PipelineConfig.DateProcessor("ingestTime"),
      PipelineConfig.DeleteEntries(
        Seq("threadId", "threadName", "threadPriority")),
      PipelineConfig.Grok("mdcTaskName",
        """task %{NUMBER:taskId} in stage %{NUMBER:stageId} \(TID %{NUMBER:tid}\)""")))

    val now = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val df = Seq(
      ("task 1.0 in stage 2.0 (TID 42)", 7L, "a", 1L),
      ("no task marker here", 8L, "b", 2L))
      .toDF("mdcTaskName", "threadId", "threadName", "threadPriority")
    val out = cfg.applyProcessors(df, Some(now))
    // delete_entries dropped the three noise fields; date added the
    // injected ingest timestamp; grok extracted the captures (null on
    // no match — parseMdc's posture, not the reference's throw)
    assert(out.columns.toSet ==
      Set("mdcTaskName", "ingestTime", "taskId", "stageId", "tid"))
    val rows = out.select($"taskId", $"stageId", $"tid")
      .as[(Option[String], Option[String], Option[String])]
      .collect().toSet
    assert(rows == Set(
      (Some("1.0"), Some("2.0"), Some("42")),
      (None, None, None)))
    assert(out.select($"ingestTime").distinct().as[java.sql.Timestamp]
      .collect().toList == List(now))
    // grok agrees with the hard-coded A10 parseMdc on the match row
    val mdc = Transforms.parseMdc(df).select($"taskId", $"stageId")
      .as[(Option[String], Option[String])].collect().toSet
    assert(rows.map(r => (r._1, r._2)) == mdc)

    // unknown processors and grok types are config errors
    assertThrows[IllegalArgumentException] {
      PipelineConfig.parse(
        "p:\n  sink: []\n  processor:\n    - lowercase:\n        with_keys: [a]\n")
    }
    assertThrows[IllegalArgumentException] {
      PipelineConfig.parse(
        "p:\n  sink: []\n  processor:\n    - grok:\n        match:\n          f: ['%{IPV4:ip}']\n")
    }
  }

  test("the REAL metrics pipeline runs as checkpointed streams: each sink receives exactly its routed records") {
    assume(Files.exists(Paths.get(s"$pipelinesDir/metrics-pipeline.yaml")),
      "reference pipelines not present")
    val cfg = PipelineConfig.parse(new String(Files.readAllBytes(
      Paths.get(s"$pipelinesDir/metrics-pipeline.yaml"))))

    val root = Files.createTempDirectory("graft-pipeline-config")
    val src = root.resolve("src"); Files.createDirectories(src)
    Files.writeString(src.resolve("batch-0.json"), Seq(
      """{"metricsType":"taskMetrics","id":1}""",
      """{"metricsType":"taskMetrics","id":2}""",
      """{"metricsType":"stageAggMetrics","id":3}""",
      """{"metricsType":"somethingElse","id":4}""").mkString("\n"))
    val conf = Pipelines.Config(
      sourceDir = src.toString,
      sinkRoot = root.resolve("tables").toString,
      checkpointRoot = root.resolve("ckpt").toString,
      availableNow = true)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("metricsType",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType)))

    val queries = Pipelines.startConfigured(spark, cfg, conf, schema)
    assert(queries.size == 2) // one query per declared sink
    queries.foreach(_.awaitTermination())

    val tasks = spark.read.parquet(conf.tablePath("spark-task-metrics"))
    val stages = spark.read.parquet(conf.tablePath("spark-stage-agg-metrics"))
    assert(tasks.select($"id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    assert(stages.select($"id").as[Long].collect().toSeq == Seq(3L))
    // the unroutable record (id=4) lands in NO sink — both declared
    // sinks are routed, and a second identical run on the same
    // checkpoints delivers nothing new (exactly-once)
    Pipelines.startConfigured(spark, cfg, conf, schema)
      .foreach(_.awaitTermination())
    assert(spark.read.parquet(conf.tablePath("spark-task-metrics"))
      .count() == 2L)
  }

  test("numeric conditions and nested pointers compile; junk fails fast") {
    val df = Seq((1.0, "x"), (0.0, "y")).toDF("value", "k")
    val r = PipelineConfig.parseCondition("nz", "/value != 0")
    assert(df.filter(r.predicate).as[(Double, String)].collect().toList ==
      List((1.0, "x")))
    assert(PipelineConfig.parseCondition("n", "/a/b == \"v\"").field == "a.b")
    assertThrows[IllegalArgumentException] {
      PipelineConfig.parseCondition("bad", "/k =~ \"re\"")
    }
    assertThrows[IllegalArgumentException] {
      PipelineConfig.parseCondition("bad", "k == \"v\"") // no leading /
    }
    // a sink naming an undeclared route fails fast, not silently empty
    val cfg = PipelineConfig.Config(None,
      Seq(PipelineConfig.Route("r1", "k", "==", Left("x"))),
      Seq(PipelineConfig.Sink("s", Seq("nope"))))
    assertThrows[IllegalArgumentException] { cfg.routedFrames(df) }
    // and a config without a pipeline block is a config error
    assertThrows[IllegalArgumentException] {
      PipelineConfig.parse("nothing: here")
    }
  }

  test("pointers resolve stepwise: map keys and dotted key names address correctly") {
    // the reference dev pipeline's dormant grok field is a JSON pointer
    // into a map<string,string> whose KEY contains a literal dot:
    // 'contextData/map/mdc.taskName' (deployment/dev/pipelines.yaml) —
    // a single dotted col() cannot address either hop
    val df = Seq(
      (1L, Map("mdc.taskName" -> "task 12.0 in stage 3.0 (TID 99)")),
      (2L, Map("other" -> "x")))
      .toDF("id", "map")
      .select($"id", struct($"map").as("contextData"))
    val cfg = PipelineConfig.Config(None, Seq.empty, Seq.empty, Seq(
      PipelineConfig.Grok("contextData/map/mdc.taskName",
        "task %{NOTSPACE:taskId} in stage %{NOTSPACE:stageId}")))
    val out = cfg.applyProcessors(df)
      .select($"id", $"taskId", $"stageId")
      .as[(Long, Option[String], Option[String])].collect().toSet
    assert(out == Set(
      (1L, Some("12.0"), Some("3.0")),
      (2L, None, None))) // missing map key → nulls, not a crash

    // route conditions step into map columns too
    val routed = PipelineConfig.Config(None,
      Seq(PipelineConfig.parseCondition("m", "/contextData/map == \"y\"")),
      Seq(PipelineConfig.Sink("s", Seq("m"))))
    val mdf = Seq((1L, Map("map" -> "y")), (2L, Map("map" -> "n")), (3L, Map.empty[String, String]))
      .toDF("id", "contextData")
    assert(routed.routedFrames(mdf).head._2.select($"id")
      .as[Long].collect().toSeq == Seq(1L))

    // degenerate pointers ("", "/", empty segments) are a CONFIG error
    // with a config-shaped message, not an obscure analysis failure on
    // a backtick-quoted empty column
    Seq("", "/", "/a//b", "//").foreach { p =>
      val e = intercept[IllegalArgumentException] {
        PipelineConfig.Config(None, Seq.empty, Seq.empty,
          Seq(PipelineConfig.Grok(p, "task %{NOTSPACE:taskId}")))
          .applyProcessors(df)
      }
      assert(e.getMessage.contains("malformed JSON pointer"), s"pointer '$p'")
    }
  }

  test("duplicate sink indexes fail fast in startConfigured (shared checkpoint hazard)") {
    val cfg = PipelineConfig.parse(
      "pipeline:\n  sink:\n" +
        "    - opensearch:\n        index: same\n" +
        "    - opensearch:\n        index: same\n")
    val root = java.nio.file.Files.createTempDirectory("graft-dup-sink")
    val conf = Pipelines.Config(
      sourceDir = root.resolve("src").toString,
      sinkRoot = root.resolve("tables").toString,
      checkpointRoot = root.resolve("ckpt").toString,
      availableNow = true)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType)))
    val e = intercept[IllegalArgumentException] {
      Pipelines.startConfigured(spark, cfg, conf, schema)
    }
    assert(e.getMessage.contains("same"))
  }

  test("a present-but-malformed routes/route/processor block fails fast, never silently degrades") {
    // the dangerous one: a scalar `routes:` would silently turn a
    // ROUTED sink into a catch-all, landing records in the wrong index
    assertThrows[IllegalArgumentException] {
      PipelineConfig.parse(
        """p:
          |  route:
          |    - a: '/k == "x"'
          |  sink:
          |    - opensearch:
          |        index: "i"
          |        routes: a
          |""".stripMargin)
    }
    // a mis-shaped pipeline-level route block must not vanish
    assertThrows[IllegalArgumentException] {
      PipelineConfig.parse(
        "p:\n  route:\n    a: '/k == \"x\"'\n  sink: []\n")
    }
    // nor a mis-shaped processor chain
    assertThrows[IllegalArgumentException] {
      PipelineConfig.parse(
        "p:\n  sink: []\n  processor:\n    date:\n      from_time_received: true\n")
    }
    // absent blocks still default cleanly (the logs pipeline's shape)
    val ok = PipelineConfig.parse("p:\n  sink:\n    - opensearch:\n        index: \"i\"\n")
    assert(ok.routes.isEmpty && ok.processors.isEmpty &&
      ok.sinks == Seq(PipelineConfig.Sink("i", Seq.empty)))
  }
}
