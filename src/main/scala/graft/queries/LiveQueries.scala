package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}

import graft.ingest.{PipelineConfig, Pipelines}
import graft.search.SavedObjects
import graft.sources.Tables

/** Dashboards over LIVE ingest, driver-checkable (q282) — the oracle
  * gate for the claim `LiveConsistencySpec` proves spec-side: a panel
  * run between two `startConfigured` availableNow deliveries sees
  * exactly the COMMITTED prefix of the stream, because the batch read
  * of the sink routes through the streaming file sink's
  * `_spark_metadata` commit log (the engine-side analog of OpenSearch's
  * point-in-time segment snapshot the reference's dashboards query,
  * source/collector/README.md dashboards-over-indices flow).
  */
object LiveQueries {

  // The live-panel shape: per-type cent-sums (SavedObjects integerizes
  // value metrics at cents so results hash cross-engine).
  private val panelLine =
    """{"type":"visualization","attributes":{"title":"live","visState":
      |"{\"type\":\"table\",\"aggs\":[
      |{\"id\":\"1\",\"enabled\":true,\"type\":\"sum\",\"params\":{\"field\":\"value\",\"customLabel\":\"cents\"},\"schema\":\"metric\"},
      |{\"id\":\"2\",\"enabled\":true,\"type\":\"terms\",\"params\":{\"field\":\"event_type\",\"size\":100},\"schema\":\"segment\"}]}"}}"""
      .stripMargin.replace("\n", "")

  // Dashboards-over-live-ingest, end to end: deliver HALF the events
  // (even event_id) through a parsed pipeline config as a checkpointed
  // availableNow stream, run the panel; plant a fully-written but
  // UNCOMMITTED orphan part file in the sink (the crashed-micro-batch
  // race, made deterministic); deliver the other half (the stream
  // RESUMES from its checkpoint); run the panel again. Output = both
  // runs' buckets. The oracle replays each run's aggregation over the
  // delivered-so-far SOURCE rows — a panel reading a torn prefix, the
  // orphan's zz_orphan bucket, or re-delivered batch-1 rows all break
  // the hash. Panel reads route through _spark_metadata (q25's sink ≡
  // source discipline, extended to reads that RACE the writer).
  def q282LiveDashboard(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import java.nio.file.{Files, Path, StandardCopyOption}
    val tmp = PipelineQueries.tempDir("graft-q282")
    val src = tmp.resolve("src"); Files.createDirectories(src)
    val conf = Pipelines.Config(
      sourceDir = src.toString,
      sinkRoot = tmp.resolve("tables").toString,
      checkpointRoot = tmp.resolve("ckpt").toString,
      availableNow = true)
    val cfg = PipelineConfig.parse(
      "pipeline:\n  source:\n    http:\n      path: /ingest\n" +
        "  sink:\n    - opensearch:\n        index: live-events\n")
    val table = conf.tablePath("live-events")
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType)))

    val ev = Tables.events(s, dir)
      .select($"event_id", $"event_type", $"value")

    // spool one delivery: distributed JSON write, parts moved into the
    // watched source dir (files are the stream's arrival unit)
    def deliver(name: String, rows: DataFrame): Unit = {
      val stage = tmp.resolve(s"stage-$name")
      rows.toJSON.write.mode("overwrite").text(stage.toString)
      val listing = Files.list(stage)
      try {
        val it = listing.iterator()
        var i = 0
        while (it.hasNext) {
          val p = it.next()
          if (p.getFileName.toString.startsWith("part-")) {
            Files.move(p, src.resolve(s"$name-$i.json"),
              StandardCopyOption.REPLACE_EXISTING)
            i += 1
          }
        }
      } finally listing.close()
      Pipelines.startConfigured(s, cfg, conf, schema)
        .foreach(_.awaitTermination())
    }

    def panelRows(run: Long): Seq[(Long, String, String, Long)] = {
      val panel = SavedObjects.parseLine(panelLine).get
      val (out, release) = SavedObjects.runManaged(s.read.parquet(table), panel)
      // bounded collect: one row per event type — the panel surface,
      // pinned at THIS point of the ingest timeline (a lazy frame would
      // re-list the sink after later deliveries)
      val rows = out.select(col("bucket"), col("metric"), col("val"))
        .collect().map(r => (run, r.getString(0), r.getString(1), r.getLong(2)))
      release()
      rows.toSeq
    }

    deliver("d1", ev.filter($"event_id" % 2 === 0))
    val run1 = panelRows(1L)

    // the race, planted: schema-compatible part file, no commit-log entry
    val stray = tmp.resolve("stray")
    Seq((-1L, "zz_orphan", 9.0e9)).toDF("event_id", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(stray.toString)
    val listing = Files.list(stray)
    val part =
      try {
        import scala.jdk.CollectionConverters._
        listing.iterator().asScala.find(_.toString.endsWith(".parquet")).get
      } finally listing.close()
    Files.copy(part, Path.of(table).resolve("part-99999-orphan.snappy.parquet"),
      StandardCopyOption.REPLACE_EXISTING)

    deliver("d2", ev.filter($"event_id" % 2 =!= 0))
    val run2 = panelRows(2L)

    (run1 ++ run2).toDF("run", "bucket", "metric", "val")
      .orderBy($"run", $"bucket")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q282_live_dashboard" -> q282LiveDashboard _)

  val oracle: Map[String, String] = Map(
    "q282_live_dashboard" ->
      """SELECT * FROM (
        | SELECT CAST(1 AS BIGINT) AS run, event_type AS bucket,
        |  'cents' AS metric,
        |  CAST(coalesce(sum(CAST(floor(value * 100) AS BIGINT)), 0)
        |    AS BIGINT) AS val
        | FROM events WHERE event_id % 2 = 0 GROUP BY event_type
        |UNION ALL
        | SELECT CAST(2 AS BIGINT), event_type, 'cents',
        |  CAST(coalesce(sum(CAST(floor(value * 100) AS BIGINT)), 0) AS BIGINT)
        | FROM events GROUP BY event_type
        |) u ORDER BY run, bucket""".stripMargin)
}
