package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-file compaction — the table-maintenance pass every streaming
  * ingest needs: micro-batch sinks (q25/q42/q59-style) accumulate
  * kilobyte parquet files whose per-file open/footer cost eventually
  * dominates scans; compaction rewrites a directory into files near a
  * target size.
  *
  * Sizing comes from the FILESYSTEM (sum of data-file lengths), not
  * from row counts — output file count = ceil(bytes / targetBytes).
  * The rewrite uses coalesce() when shrinking the file count (pure
  * merge, NO shuffle — at 100 TB the data moves zero times across the
  * network for the common many-small→few-big direction) and falls
  * back to repartition() only when the target asks for MORE files
  * than the scan yields. Content is preserved row-for-row; only
  * layout changes.
  */
object Compaction {

  final case class Report(bytesIn: Long, filesIn: Int, filesOut: Int)

  /** Rewrite `srcDir` (flat parquet) into `dstDir` at ~targetBytes
    * per file; returns what was compacted. `dstDir` is overwritten.
    */
  def compact(
      spark: SparkSession,
      srcDir: String,
      dstDir: String,
      targetBytes: Long): Report = {
    require(targetBytes > 0, "targetBytes must be positive")
    val fs = new Path(srcDir).getFileSystem(spark.sessionState.newHadoopConf())
    val dataFiles = fs.listStatus(new Path(srcDir))
      .filter(f => f.isFile && !f.getPath.getName.startsWith("_")
        && !f.getPath.getName.startsWith("."))
    val bytesIn = dataFiles.map(_.getLen).sum
    val filesOut = math.max(1L, (bytesIn + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(srcDir)
    val sized =
      if (filesOut <= df.rdd.getNumPartitions) df.coalesce(filesOut)
      else df.repartition(filesOut)
    sized.write.mode("overwrite").parquet(dstDir)
    Report(bytesIn, dataFiles.length, filesOut)
  }

  /** Read helper for callers that want the compacted table back. */
  def read(spark: SparkSession, dstDir: String): DataFrame =
    spark.read.parquet(dstDir)
}
