package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Write-audit-publish — the "never expose a bad drop" pattern: a new
  * table version is written to a STAGING directory, audited there
  * (checks run against the re-read staged files, so they validate
  * what consumers would actually see, not the pre-write plan), and
  * only on a clean audit swapped into the live path. A failing audit
  * leaves the previous published version untouched and keeps the
  * staging dir for inspection.
  *
  * The swap is two directory renames (live→retired, staging→live) —
  * the object-store-practical approximation of atomicity: readers see
  * either the old or the new version, never a half-written mix,
  * because data files only ever change under a non-live path.
  */
object Publish {

  final case class Report(published: Boolean, failed: Seq[String], rows: Long)

  /** Audit checks: name → predicate over the STAGED table. */
  def writeAuditPublish(
      spark: SparkSession,
      df: DataFrame,
      livePath: String,
      checks: Seq[(String, DataFrame => Boolean)]): Report = {
    val fs = new Path(livePath).getFileSystem(spark.sessionState.newHadoopConf())
    val staging = new Path(livePath + ".staging")
    val retired = new Path(livePath + ".retired")
    fs.delete(staging, true)
    df.write.mode("overwrite").parquet(staging.toString)

    val staged = spark.read.parquet(staging.toString)
    val failed = checks.collect { case (name, check) if !check(staged) => name }
    if (failed.nonEmpty) {
      Report(published = false, failed = failed, rows = -1L)
    } else {
      val rows = staged.count()
      fs.delete(retired, true)
      val live = new Path(livePath)
      if (fs.exists(live)) fs.rename(live, retired)
      require(fs.rename(staging, live), s"publish rename failed for $livePath")
      fs.delete(retired, true)
      Report(published = true, failed = Nil, rows = rows)
    }
  }
}
