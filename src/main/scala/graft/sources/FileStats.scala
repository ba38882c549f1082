package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level min/max statistics index ("zone map") + data-skipping reads.
  *
  * Reference analog: OpenSearch prunes per-segment BKD range trees before
  * scanning a shard; lakehouse tables (Delta/Iceberg) keep per-file
  * column stats in the table log for the same reason. Parquet footers
  * carry row-group min/max, but the scan still has to OPEN every file to
  * learn them — at 100 TB / millions of files the footer round-trips are
  * the bottleneck. A side stats table moves that pruning to one tiny
  * metadata read.
  *
  * Layout contract: data is written range-partitioned on the stats column
  * (one sort-ish pass at write time) so per-file [min,max] envelopes are
  * tight and disjoint — the write-side investment that makes read-side
  * skipping pay. Stats are computed from the files actually landed (via
  * the `_metadata.file_path` hidden column — one cheap scan at write
  * time) so they are correct by construction even under task retries.
  *
  * The pruned read collects the surviving FILE LIST on the driver — this
  * is metadata at file-count scale (what any table format's planning
  * phase does), never data; the residual predicate stays on executors.
  */
object FileStats {

  /** Write `df` range-partitioned on `statsCol` into ~`numFiles` files
    * under `path`, then write the per-file stats index to `path_stats`.
    */
  def writeWithStats(df: DataFrame, path: String, statsCol: String,
      numFiles: Int): Unit = {
    df.repartitionByRange(numFiles, col(statsCol))
      .write.mode("overwrite").parquet(path)
    val spark = df.sparkSession
    spark.read.parquet(path)
      .select(col("_metadata.file_path").as("file_path"), col(statsCol))
      .groupBy(col("file_path"))
      .agg(min(col(statsCol)).as("min_v"), max(col(statsCol)).as("max_v"),
        count(lit(1)).as("n_rows"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"${path}_stats")
  }

  /** Read only the files whose [min_v, max_v] envelope intersects
    * [lo, hi]; the caller still applies the residual predicate (stats
    * prune at file granularity, not row).
    * Returns (pruned DataFrame, files selected, files total).
    */
  def prunedRead(spark: SparkSession, path: String, lo: Long,
      hi: Long): (DataFrame, Int, Int) = {
    val stats = spark.read.parquet(s"${path}_stats")
    val total = stats.count().toInt
    // driver-side file list: metadata-scale (one row per file), the same
    // planning collect every table format performs
    val files = stats.filter(col("max_v") >= lo && col("min_v") <= hi)
      .select("file_path").as[String](org.apache.spark.sql.Encoders.STRING)
      .collect().sorted
    val df = if (files.isEmpty) spark.read.parquet(path).limit(0)
      else spark.read.parquet(files: _*)
    (df, files.length, total)
  }
}
