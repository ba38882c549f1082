package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{StringType, StructType}

import graft.ingest.Pipelines
import graft.model.Schemas

/** Catalog registration for the ingest tables (A16 tail): the reference
  * bootstraps its three typed indexes BEFORE any data lands
  * (deployment/.../opensearch-bootstrap/bootstrap.py:223-229); the
  * Spark-native equivalent is a catalog-registered EXTERNAL partitioned
  * parquet table over each sink path — created up front with an explicit
  * schema and partition spec, so `spark.table(...)` works from day one
  * and a dt filter prunes partitions at file listing (the same effect
  * the reference gets from per-index time filters).
  */
object CatalogTables {

  /** dt-partitioned variant of a record schema (the sinks append the
    * partition column via Transforms.withDt).
    */
  def withDt(schema: StructType): StructType = schema.add("dt", StringType)

  /** Register an external partitioned parquet table with an explicit
    * schema. Idempotent (IF NOT EXISTS); existing partitions on disk are
    * recovered into the catalog.
    */
  def register(
      spark: SparkSession,
      name: String,
      path: String,
      schema: StructType,
      partitionCols: Seq[String] = Seq("dt")): Unit = {
    val colsDdl = schema.fields
      .map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
    val partDdl = partitionCols.map(c => s"`$c`").mkString(", ")
    // schema-first: the location may not exist yet (tables are created
    // before any ingest lands); partition recovery needs a listable dir
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) fs.mkdirs(p)
    spark.sql(
      s"CREATE TABLE IF NOT EXISTS `$name` ($colsDdl) USING parquet " +
        s"PARTITIONED BY ($partDdl) LOCATION '$path'")
    spark.catalog.recoverPartitions(name)
  }

  /** Re-scan a sink's directory tree for partitions the streaming
    * writers added since registration (run after ingest batches land;
    * at cluster scale this is the metastore-sync step of the pipeline).
    */
  def refresh(spark: SparkSession, name: String): Unit = {
    spark.catalog.recoverPartitions(name)
    spark.catalog.refreshTable(name)
  }

  /** Register the three ingest tables over a pipeline Config's sink
    * root — the typed-index bootstrap for the observability store.
    */
  def registerIngestTables(spark: SparkSession, conf: Pipelines.Config): Unit = {
    register(spark, Schemas.TaskMetricsTable,
      conf.tablePath(Schemas.TaskMetricsTable), withDt(Schemas.taskMetrics))
    register(spark, Schemas.StageAggMetricsTable,
      conf.tablePath(Schemas.StageAggMetricsTable), withDt(Schemas.stageAggMetrics))
    register(spark, Schemas.LogsTable,
      conf.tablePath(Schemas.LogsTable), withDt(Schemas.logRecords))
  }

  /** Sink schema of the deep logs pipeline, derived from the projection
    * itself (schema-on-write = projectLogRecordsDeep over the wire
    * schema) so registration can never drift from the pipeline.
    */
  def deepLogSchema(spark: SparkSession): StructType = {
    val empty = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      graft.ingest.Transforms.rawLogSchemaDeep)
    withDt(graft.ingest.Transforms.projectLogRecordsDeep(empty).schema)
  }

  /** Register the derived sink tables the extended pipelines write: the
    * deep log table and the three stage-agg delivery variants.
    */
  def registerDerivedTables(spark: SparkSession, conf: Pipelines.Config): Unit = {
    register(spark, Schemas.LogsTable + "_deep",
      conf.tablePath(Schemas.LogsTable + "_deep"), deepLogSchema(spark))
    Seq("_derived", "_stateful").foreach { suffix =>
      register(spark, Schemas.StageAggMetricsTable + suffix,
        conf.tablePath(Schemas.StageAggMetricsTable + suffix),
        withDt(Schemas.stageAggMetrics))
    }
  }
}
