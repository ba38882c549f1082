package graft.ingest

import java.nio.file.{Files, Path, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}

import graft.SparkTestBase
import graft.search.SavedObjects

/** Live-dashboard consistency: the reference's panels query indexes
  * that are being written CONCURRENTLY by the ingestion pipeline —
  * OpenSearch gives each search a consistent point-in-time snapshot of
  * refreshed segments. The engine-side equivalent is the streaming file
  * sink's `_spark_metadata` commit log: a batch read of the sink
  * directory lists only files recorded by a COMMITTED micro-batch, so a
  * panel run interleaved with (or racing) deliveries sees a consistent
  * committed prefix — never a partially-written batch, never an
  * uncommitted straggler file.
  *
  * The racy half (a file fully written but its batch not yet committed)
  * is made deterministic here by planting exactly that state: a
  * schema-compatible parquet part file dropped into the sink directory
  * OUTSIDE the commit log. A naive file-listing read sees it; the
  * metadata-aware read must not.
  */
class LiveConsistencySpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", StringType), StructField("v", DoubleType)))

  private val panelLine =
    """{"type":"visualization","attributes":{"title":"live","visState":
      |"{\"type\":\"table\",\"aggs\":[
      |{\"id\":\"1\",\"enabled\":true,\"type\":\"sum\",\"params\":{\"field\":\"v\"},\"schema\":\"metric\"},
      |{\"id\":\"2\",\"enabled\":true,\"type\":\"terms\",\"params\":{\"field\":\"k\",\"size\":10},\"schema\":\"segment\"}]}"}}"""
      .stripMargin.replace("\n", "")

  private def panelRows(df: DataFrame): Set[(String, Long)] = {
    val panel = SavedObjects.parseLine(panelLine).get
    val (out, release) = SavedObjects.runManaged(df, panel)
    val rows = out.select($"bucket", $"val").as[(String, Long)].collect().toSet
    release()
    rows
  }

  test("interleaved panel runs see only committed batches; an uncommitted file is invisible") {
    val root = Files.createTempDirectory("graft-live-consistency")
    val src = root.resolve("src"); Files.createDirectories(src)
    val conf = Pipelines.Config(
      sourceDir = src.toString,
      sinkRoot = root.resolve("tables").toString,
      checkpointRoot = root.resolve("ckpt").toString,
      availableNow = true)
    val cfg = PipelineConfig.parse(
      "pipeline:\n  source:\n    http:\n      path: /ingest\n" +
        "  sink:\n    - opensearch:\n        index: live-events\n")
    val table = conf.tablePath("live-events")

    def deliver(name: String, lines: Seq[String]): Unit = {
      Files.writeString(src.resolve(name), lines.mkString("\n"))
      Pipelines.startConfigured(spark, cfg, conf, schema)
        .foreach(_.awaitTermination())
    }

    // delivery 1 commits, then the panel runs: sees exactly batch 1
    deliver("b0.json", Seq(
      """{"k":"a","v":1.5}""", """{"k":"a","v":2.5}""", """{"k":"b","v":3.0}"""))
    val run1 = panelRows(spark.read.parquet(table))
    assert(run1 == panelRows(Seq(("a", 1.5), ("a", 2.5), ("b", 3.0))
      .toDF("k", "v")), s"run1 saw $run1")

    // plant the race: a fully-written but UNCOMMITTED part file (what a
    // crashed/in-flight micro-batch leaves behind, and what a panel
    // racing a live batch must never read)
    val stray = root.resolve("stray")
    Seq(("z", 1000.0)).toDF("k", "v").coalesce(1)
      .write.parquet(stray.toString)
    val strayPart = Files.list(stray).filter(_.toString.endsWith(".parquet"))
      .findFirst().get()
    val orphan = Path.of(table).resolve("part-99999-orphan.snappy.parquet")
    Files.copy(strayPart, orphan, StandardCopyOption.REPLACE_EXISTING)

    // the naive listing DOES see the orphan (the race is real)...
    assert(spark.read.schema(schema)
      .parquet(orphan.toString).count() == 1L)
    // ...but the metadata-aware table read and the panel on it do not
    val run2 = panelRows(spark.read.parquet(table))
    assert(run2 == run1, s"panel must not see the uncommitted file: $run2")

    // delivery 2 commits; the next panel run sees batches 1+2 — a
    // consistent prefix that still excludes the orphan
    deliver("b1.json", Seq("""{"k":"b","v":4.0}""", """{"k":"c","v":5.0}"""))
    val run3 = panelRows(spark.read.parquet(table))
    assert(run3 == panelRows(Seq(("a", 1.5), ("a", 2.5), ("b", 3.0),
      ("b", 4.0), ("c", 5.0)).toDF("k", "v")), s"run3 saw $run3")
    assert(!run3.exists(_._1 == "z"), "orphan rows must never surface")
  }
}
