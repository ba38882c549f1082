package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.ingest.Pipelines
import graft.model.Schemas

/** A16 tail: catalog-registered ingest tables — schema-first creation
  * (before any data), partition recovery after writes, and dt partition
  * PRUNING visible in the scan (the 100 TB read-path property).
  */
class CatalogSpec extends SparkTestBase {
  import spark.implicits._

  test("ingest tables register before data lands, recover partitions, and prune on dt") {
    val root = Files.createTempDirectory("graft-catalog")
    val conf = Pipelines.Config(
      sourceDir = root.resolve("src").toString,
      sinkRoot = root.resolve("tables").toString,
      checkpointRoot = root.resolve("ckpt").toString)
    try {
      // 1. bootstrap: tables exist and are queryable while still empty
      CatalogTables.registerIngestTables(spark, conf)
      assert(spark.catalog.tableExists(Schemas.TaskMetricsTable))
      assert(spark.table(Schemas.TaskMetricsTable).count() == 0)
      assert(spark.table(Schemas.LogsTable).columns.contains("stageId"))

      // 2. data lands dt-partitioned (as the streaming sink writes it)
      val rows = Seq(
        ("app", "app-1", "1", 2, 0, "10.0", "1", 0, 100L, 10L, 5L, 4L, 1024L,
          0L, 0L, 1L, 7L, 0L, 0L, java.sql.Timestamp.valueOf("2026-01-01 00:00:01"), "2026-01-01"),
        ("app", "app-1", "1", 2, 0, "11.0", "1", 0, 200L, 10L, 5L, 4L, 1024L,
          0L, 0L, 1L, 7L, 0L, 0L, java.sql.Timestamp.valueOf("2026-01-02 00:00:01"), "2026-01-02"))
        .toDF(CatalogTables.withDt(Schemas.taskMetrics).fieldNames: _*)
      rows.write.mode("append").partitionBy("dt")
        .parquet(conf.tablePath(Schemas.TaskMetricsTable))
      CatalogTables.refresh(spark, Schemas.TaskMetricsTable)
      assert(spark.table(Schemas.TaskMetricsTable).count() == 2)

      // 3. a dt filter prunes at file listing: the scan reads ONE
      // partition and carries the predicate as a PartitionFilter
      val q = spark.table(Schemas.TaskMetricsTable).filter($"dt" === "2026-01-02")
      assert(q.count() == 1)
      val scan = q.queryExecution.executedPlan.collectFirst {
        case s: FileSourceScanExec => s
      }.get
      assert(scan.partitionFilters.map(_.toString).mkString(",").contains("dt"))
      assert(scan.metadata.get("PartitionFilters").exists(_.contains("dt")))
      // 4. derived tables register schema-first too, with the deep log
      // schema taken from the projection itself
      CatalogTables.registerDerivedTables(spark, conf)
      val deep = spark.table(Schemas.LogsTable + "_deep")
      assert(deep.columns.contains("causeDepth") && deep.columns.contains("rootCauseName"))
      assert(deep.count() == 0)
      assert(spark.catalog.tableExists(Schemas.StageAggMetricsTable + "_stateful"))
    } finally {
      (Seq(Schemas.TaskMetricsTable, Schemas.StageAggMetricsTable, Schemas.LogsTable,
        Schemas.LogsTable + "_deep") ++
        Seq("_derived", "_stateful").map(Schemas.StageAggMetricsTable + _))
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))
    }
  }
}
