package graft.ingest

import java.nio.file.{Files, Path}

import scala.concurrent.duration.DurationInt

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.model.Schemas
import graft.operators.Skewness

/** Batch-replay tests of the streaming ingestion plane against the
  * FIXTURES.md values (skewed stage 2 → skew exactly 2/3; uniform stage 3
  * → range-0 guard → skew 0).
  */
class IngestSpec extends SparkTestBase {
  import spark.implicits._

  // 2026-01-01T00:00:00Z
  private val T0 = 1767225600000L

  private def taskJson(stageId: Int, taskId: String, input: Long, shuffle: Long,
      offsetMs: Long, jobId: String = "1"): String =
    s"""{"metricsType":"taskMetrics","appName":"fixture-app","appId":"app-001",
       |"jobId":"$jobId","stageId":$stageId,"stageAttemptId":0,"taskId":"$taskId",
       |"executorId":"1","partitionId":0,"inputBytesRead":$input,"inputRecordsRead":10,
       |"runTime":100,"executorCpuTime":90,"peakExecutionMemory":1024,
       |"outputRecordsWritten":0,"outputBytesWritten":0,"shuffleRecordsRead":1,
       |"shuffleBytesRead":$shuffle,"shuffleRecordsWritten":0,"shuffleBytesWritten":0,
       |"metricTime":${T0 + offsetMs}}""".stripMargin.replaceAll("\n", "")

  private def fixtureDirs(): (Path, Pipelines.Config) = {
    val root = Files.createTempDirectory("graft-ingest")
    val src = root.resolve("src"); Files.createDirectories(src)
    // FIXTURES.md §1: one skewed stage, one uniform stage + a routed
    // stage-agg passthrough record.
    val f0 = Seq(
      taskJson(2, "10.0", 1000000L, 0L, 1000L),
      taskJson(2, "11.0", 1000000L, 0L, 2000L),
      taskJson(2, "12.0", 98000000L, 0L, 9000L),
      taskJson(3, "20.0", 5000L, 4096L, 11000L),
      taskJson(3, "21.0", 5000L, 4096L, 12000L),
      s"""{"metricsType":"stageAggMetrics","appName":"fixture-app","appId":"app-002",
         |"jobId":"7","stageId":9,"inputBytesReadSkewness":0.25,"maxInputBytesRead":777,
         |"shuffleBytesReadSkewness":0.5,"maxShuffleBytesRead":888,
         |"metricTime":${T0 + 13000L}}""".stripMargin.replaceAll("\n", "")
    ).mkString("\n")
    Files.writeString(src.resolve("batch-0.json"), f0)
    // watermark sentinels (event time advances only between micro-batches)
    Files.writeString(src.resolve("batch-1.json"),
      taskJson(99, "90.0", 1L, 0L, 3600L * 1000))
    Files.writeString(src.resolve("batch-2.json"),
      taskJson(99, "91.0", 1L, 0L, 7200L * 1000))
    // the file source orders by modification time — make it deterministic
    // (same-millisecond writes tie-break arbitrarily)
    Seq("batch-0.json", "batch-1.json", "batch-2.json").zipWithIndex.foreach {
      case (f, i) => Files.setLastModifiedTime(src.resolve(f),
        java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 1000L))
    }
    val conf = Pipelines.Config(
      sourceDir = src.toString,
      sinkRoot = root.resolve("tables").toString,
      checkpointRoot = root.resolve("ckpt").toString,
      maxFilesPerTrigger = 1,
      timeThreshold = 1.second,
      availableNow = true)
    (src, conf)
  }

  test("metrics pipeline: routing, exactly-once sink, derived stage skewness") {
    val (src, conf) = fixtureDirs()
    Pipelines.startMetrics(spark, conf).foreach(_.awaitTermination())

    val tasks = spark.read.parquet(conf.tablePath(Schemas.TaskMetricsTable))
    assert(tasks.count() == 7) // 5 fixture + 2 sentinels
    assert(tasks.columns.contains("dt")) // A16 partitioned layout
    assert(tasks.filter($"dt" === "2026-01-01").count() == 7)

    // A12 routing: the passthrough record went ONLY to the stage table
    val pass = spark.read.parquet(conf.tablePath(Schemas.StageAggMetricsTable))
    val p = pass.collect()
    assert(p.length == 1)
    assert(p(0).getAs[String]("appId") == "app-002" &&
      p(0).getAs[Double]("inputBytesReadSkewness") == 0.25)

    // derived stateful agg: fixture stages flushed by the watermark
    val derived = spark.read.parquet(
      conf.tablePath(Schemas.StageAggMetricsTable + "_derived"))
    val byStage = derived.filter($"appId" === "app-001")
      .collect().map(r => r.getAs[Int]("stageId") -> r).toMap
    assert(byStage.contains(2) && byStage.contains(3))
    assert(byStage(2).getAs[Double]("inputBytesReadSkewness") == (98000000.0 - (1000000.0 + 1000000.0 + 98000000.0) / 3) / 97000000.0)
    assert(byStage(2).getAs[Long]("maxInputBytesRead") == 98000000L)
    assert(byStage(3).getAs[Double]("inputBytesReadSkewness") == 0.0) // range-0 guard
    assert(byStage(3).getAs[Double]("shuffleBytesReadSkewness") == 0.0)
    assert(byStage(3).getAs[Long]("maxShuffleBytesRead") == 4096L)

    // checkpoint restart: new file only → no reprocessing of old files
    Files.writeString(src.resolve("batch-3.json"),
      taskJson(4, "30.0", 42L, 0L, 20000L))
    Pipelines.startMetrics(spark, conf).foreach(_.awaitTermination())
    assert(spark.read.parquet(conf.tablePath(Schemas.TaskMetricsTable)).count() == 8)
  }

  test("stateful (flatMapGroupsWithState) variant lands exact stage rows in its table") {
    val (_, base) = fixtureDirs()
    val conf = base.copy(
      sinkRoot = base.sinkRoot + "-stateful",
      checkpointRoot = base.checkpointRoot + "-stateful",
      watermarkDelay = "1 minute")
    Pipelines.startMetricsStateful(spark, conf).awaitTermination()
    val out = spark.read.parquet(
      conf.tablePath(Schemas.StageAggMetricsTable + "_stateful"))
    val byStage = out.collect().map(r => r.getAs[Int]("stageId") -> r).toMap
    assert(byStage.contains(2) && byStage.contains(3)) // sentinel stage 99 still open
    assert(byStage(2).getAs[Double]("inputBytesReadSkewness") ==
      (98000000.0 - (1000000.0 + 1000000.0 + 98000000.0) / 3) / 97000000.0)
    assert(byStage(3).getAs[Double]("inputBytesReadSkewness") == 0.0)
  }

  test("foreachBatch upsert variant recomputes exact batch stage aggs") {
    val (_, base) = fixtureDirs()
    val conf = base.copy(
      sinkRoot = base.sinkRoot + "-upsert",
      checkpointRoot = base.checkpointRoot + "-upsert")
    Pipelines.startMetricsUpsert(spark, conf).awaitTermination()
    val tasks = spark.read.parquet(conf.tablePath(Schemas.TaskMetricsTable + "_upsert"))
    val expected = Skewness.stageAgg(tasks.drop("dt", "batch_id"))
      .orderBy($"appId", $"jobId", $"stageId")
      .collect().map(_.toString).toSeq
    val got = spark.read
      .parquet(conf.tablePath(Schemas.StageAggMetricsTable + "_upsert"))
      .drop("appIdPart")
      .select("appName", "appId", "jobId", "stageId",
        "inputBytesReadSkewness", "maxInputBytesRead",
        "shuffleBytesReadSkewness", "maxShuffleBytesRead", "metricTime")
      .orderBy($"appId", $"jobId", $"stageId")
      .collect().map(_.toString).toSeq
    assert(got == expected)
    // the skewed stage is exact in the upsert path too
    val s2 = spark.read.parquet(conf.tablePath(Schemas.StageAggMetricsTable + "_upsert"))
      .filter($"stageId" === 2).head()
    assert(s2.getAs[Double]("inputBytesReadSkewness") == (98000000.0 - (1000000.0 + 1000000.0 + 98000000.0) / 3) / 97000000.0)
  }

  test("dedupeDelivery drops at-least-once duplicate task events") {
    val root = Files.createTempDirectory("graft-dedup-delivery")
    val src = root.resolve("src"); Files.createDirectories(src)
    val dup = taskJson(2, "10.0", 1000000L, 0L, 1000L)
    // the same task delivered twice (retry replay) + one distinct task
    Files.writeString(src.resolve("b0.json"),
      Seq(dup, dup, taskJson(2, "11.0", 2000000L, 0L, 2000L)).mkString("\n"))
    val conf = Pipelines.Config(
      sourceDir = src.toString,
      sinkRoot = root.resolve("tables").toString,
      checkpointRoot = root.resolve("ckpt").toString,
      availableNow = true,
      dedupeDelivery = true)
    Pipelines.startMetrics(spark, conf).foreach(_.awaitTermination())
    val tasks = spark.read.parquet(conf.tablePath(Schemas.TaskMetricsTable))
    assert(tasks.count() == 2, "duplicate delivery should collapse to one row per task")
  }

  test("logs pipeline: MDC parse + enrichment into the LogRecord table") {
    val root = Files.createTempDirectory("graft-logs")
    val src = root.resolve("src"); Files.createDirectories(src)
    val logs = Seq(
      s"""{"appName":"fixture-app","appId":"app-001","executorId":"1",
         |"logTime":${T0 + 5000L},"loggerName":"org.apache.spark.executor.Executor",
         |"threadName":"Executor task launch worker-0","message":"Running task",
         |"level":{"intLevel":400,"name":"INFO","standardLevel":"INFO"},
         |"mdcTaskName":"task 1.0 in stage 2.0 (TID 42)"}""".stripMargin.replaceAll("\n", ""),
      s"""{"appName":"fixture-app","appId":"app-001","executorId":"driver",
         |"logTime":${T0 + 6000L},"loggerName":"o.a.s.scheduler.DAGScheduler",
         |"threadName":"dag-scheduler","message":"Job failed",
         |"level":{"intLevel":300,"name":"WARN","standardLevel":"WARN"},
         |"thrownName":"java.lang.IllegalStateException","thrownMessage":"boom"}""".stripMargin.replaceAll("\n", "")
    ).mkString("\n")
    Files.writeString(src.resolve("logs-0.json"), logs)
    val conf = Pipelines.Config(
      sourceDir = src.toString,
      sinkRoot = root.resolve("tables").toString,
      checkpointRoot = root.resolve("ckpt").toString,
      availableNow = true)
    Pipelines.startLogs(spark, conf).awaitTermination()

    val out = spark.read.parquet(conf.tablePath(Schemas.LogsTable))
    assert(out.count() == 2)
    val byLevel = out.collect().map(r => r.getAs[org.apache.spark.sql.Row]("level")
      .getAs[String]("name") -> r).toMap
    assert(byLevel("INFO").getAs[String]("taskId") == "1.0")
    assert(byLevel("INFO").getAs[String]("stageId") == "2.0")
    assert(byLevel("WARN").getAs[String]("taskId") == null) // no MDC → null, no throw
    assert(byLevel("WARN").getAs[String]("thrownName") == "java.lang.IllegalStateException")
    assert(out.schema("logTime").dataType.typeName == "timestamp")
  }

  test("deep log schema preserves the cause chain, stack frames and MDC map") {
    // a realistic Log4j2 JsonLayout event with a 2-level proxy chain
    val json =
      """{"appName":"a","appId":"app-9","executorId":"2","logTime":1767225600000,
        |"instant":{"epochSecond":1767225600,"nanoOfSecond":0},
        |"loggerName":"graft.x","threadName":"w-1","threadId":1,"threadPriority":5,
        |"level":{"intLevel":200,"name":"ERROR","standardLevel":"ERROR"},
        |"message":{"message":"boom"},
        |"contextData":{"taskName":"task 4.0 in stage 7.0 (TID 42)","k":"v"},
        |"thrownProxy":{"name":"java.lang.RuntimeException","message":"outer",
        | "localizedMessage":"outer","commonElementCount":0,
        | "extendedStackTrace":[{"stackTraceElement":{"classLoaderName":"app",
        |   "declaringClass":"graft.Job","fileName":"Job.scala","lineNumber":33,
        |   "methodName":"run","moduleName":"m","moduleVersion":"1"},
        |   "extraClassInfo":{"exact":true,"location":"j.jar","version":"1"}}],
        | "causeProxy":{"name":"java.io.IOException","message":"inner",
        |  "localizedMessage":"inner","commonElementCount":1,
        |  "extendedStackTrace":[{"stackTraceElement":{"classLoaderName":"app",
        |    "declaringClass":"graft.Io","fileName":"Io.scala","lineNumber":7,
        |    "methodName":"read","moduleName":"m","moduleVersion":"1"},
        |    "extraClassInfo":{"exact":false,"location":"j.jar","version":"1"}}]}}}"""
        .stripMargin.replaceAll("\n", "")
    val noThrow =
      """{"appName":"a","appId":"app-9","executorId":"2","logTime":1767225601000,
        |"level":{"intLevel":400,"name":"INFO","standardLevel":"INFO"},
        |"message":{"message":"ok"},"contextData":{"taskName":"task 1.0 in stage 2.0 (TID 1)"}}"""
        .stripMargin.replaceAll("\n", "")
    // stackless throwable (frames absorbed / -XX:-StackTraceInThrowable):
    // the empty frame array must yield a null errLine, not an ANSI abort
    val stackless =
      """{"appName":"a","appId":"app-9","executorId":"2","logTime":1767225602000,
        |"level":{"intLevel":200,"name":"ERROR","standardLevel":"ERROR"},
        |"message":{"message":"stackless"},
        |"contextData":{"taskName":"task 1.0 in stage 2.0 (TID 2)"},
        |"thrownProxy":{"name":"java.lang.Error","message":"m",
        | "localizedMessage":"m","commonElementCount":7,"extendedStackTrace":[]}}"""
        .stripMargin.replaceAll("\n", "")
    import scala.jdk.CollectionConverters._
    val raw = spark.read.schema(Transforms.rawLogSchemaDeep)
      .json(Seq(json, noThrow, stackless).toDS())
    val out = Transforms.projectLogRecordsDeep(raw).orderBy($"logTime").collect()
    val err = out(0); val ok = out(1); val noStack = out(2)
    assert(noStack.isNullAt(noStack.fieldIndex("errLine")))
    assert(noStack.getAs[Long]("causeDepth") == 1L)
    assert(err.getAs[String]("levelName") == "ERROR")
    assert(err.getAs[Long]("causeDepth") == 2L)
    assert(err.getAs[String]("rootCauseName") == "java.io.IOException")
    assert(err.getAs[Long]("errLine") == 33L)
    assert(err.getAs[String]("stageId") == "7.0" && err.getAs[String]("taskId") == "4.0")
    assert(err.getAs[Map[String, String]]("mdc")("k") == "v")
    // nested frame fields survive typed
    val thrown = err.getAs[org.apache.spark.sql.Row]("thrownProxy")
    val causeFrames = thrown.getAs[org.apache.spark.sql.Row]("causeProxy")
      .getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("extendedStackTrace")
    assert(causeFrames.head.getAs[org.apache.spark.sql.Row]("stackTraceElement")
      .getAs[String]("declaringClass") == "graft.Io")
    assert(ok.getAs[Long]("causeDepth") == 0L)
    assert(ok.isNullAt(ok.fieldIndex("rootCauseName")))
    assert(ok.isNullAt(ok.fieldIndex("errLine")))
  }

  test("transforms: identity injection and jobId lookup enrichment") {
    val tasks = Seq((null.asInstanceOf[String], null.asInstanceOf[String], 2),
      ("known", "app-x", 3)).toDF("appName", "appId", "stageId")
      .withColumn("executorId", lit(null).cast("string"))
      .withColumn("jobId", lit(null).cast("string"))
    val dim = Seq((2, "11"), (3, "12")).toDF("stageId", "jobId")
    val got = Transforms.enrichJobId(
        Transforms.injectIdentity(tasks, "my-app", "app-123"), dim)
      .orderBy($"stageId")
      .select($"appName", $"appId", $"executorId", $"jobId")
      .as[(String, String, String, String)].collect().toSeq
    assert(got == Seq(
      ("my-app", "app-123", "driver", "11"),
      ("known", "app-x", "driver", "12")))
  }
}
