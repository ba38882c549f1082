package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet test tables (TESTDATA.md).
  *
  * All reads go through `spark.read.parquet` so Catalyst's datasource V2
  * path applies column pruning and predicate pushdown at the scan
  * (verify with `.explain`: `PushedFilters`, `ReadSchema`). At cluster
  * scale these would be catalog tables partitioned by date/appId; the
  * query layer only depends on the DataFrame, not the physical layout.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Dimension tables small enough to broadcast at any scale factor
    * (region 5 rows, nation 25 rows — fixed-size in TPC-H).
    */
  val broadcastable: Set[String] = Set("region", "nation")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
  /** The events table stores `ts` as parquet TIMESTAMP(NANOS) which Spark
    * has no native type for; with `spark.sql.legacy.parquet.nanosAsLong`
    * (set once at session bootstrap — Verify/Bench/test builders — NOT
    * mutated here) the column arrives as nano longs, floor-converted to
    * microseconds — the same conversion DuckDB applies reading nanos into
    * its microsecond timestamps, so oracle results align. Floor (not
    * truncate-toward-zero) so pre-epoch nanos would still bucket left.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // Defensive set-if-absent for externally-built sessions (the nanos
    // flag is required to read this file at all); our own entry points
    // set it at session build so this is a no-op there.
    if (spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").isEmpty) {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    val df = apply(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts div 1000 - (case when ts % 1000 < 0 then 1 else 0 end))"))
      case _ => df
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
