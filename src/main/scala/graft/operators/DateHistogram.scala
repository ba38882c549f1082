package graft.operators

import java.time.Duration

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Date-histogram bucketing — the reference dashboards' `date_histogram`
  * with auto interval (SURVEY §2.2 B13-B16; OpenSearch
  * `useNormalizedOpenSearchInterval`, data-skew.ndjson lines 19/20/24/25).
  *
  * The auto interval is pure driver-side arithmetic (pick the smallest
  * ladder rung giving ≤ targetBuckets over the time range) — no Catalyst
  * work. The bucketing itself is `timestamp_millis(floor(millis/step)*step)`
  * for sub-month rungs, `date_trunc` for calendar rungs, both
  * codegen-friendly and groupable.
  */
object DateHistogram {

  /** Normalized interval ladder (seconds), mirroring OpenSearch's auto
    * date-histogram rungs: 1s 5s 30s 1m 5m 30m 1h 3h 12h 1d 7d.
    * Calendar rungs (month/quarter/year) handled separately.
    */
  val ladderSeconds: Seq[Long] =
    Seq(1L, 5L, 30L, 60L, 300L, 1800L, 3600L, 3 * 3600L, 12 * 3600L,
      86400L, 7 * 86400L)

  /** Choose a fixed interval (seconds) so the span yields at most
    * `targetBuckets` buckets; falls back to the largest rung.
    */
  def autoIntervalSeconds(span: Duration, targetBuckets: Int = 50): Long = {
    val need = math.max(1L, span.getSeconds / math.max(1, targetBuckets))
    ladderSeconds.find(_ >= need).getOrElse(ladderSeconds.last)
  }

  /** Calendar rungs above the fixed ladder (OpenSearch auto continues
    * month → quarter → year for long spans). Approximate second-lengths
    * are only used for rung SELECTION; bucketing is true calendar
    * `date_trunc`.
    */
  val calendarLadder: Seq[(String, Long)] = Seq(
    "month" -> 30L * 86400L,
    "quarter" -> 91L * 86400L,
    "year" -> 365L * 86400L)

  /** Full auto-interval: Left(seconds) for fixed rungs, Right(unit) for
    * calendar rungs when even 7d would overflow `targetBuckets`.
    */
  def autoInterval(span: Duration, targetBuckets: Int = 50): Either[Long, String] = {
    val need = math.max(1L, span.getSeconds / math.max(1, targetBuckets))
    ladderSeconds.find(_ >= need) match {
      case Some(s) => Left(s)
      case None =>
        Right(calendarLadder.find(_._2 >= need).map(_._1).getOrElse("year"))
    }
  }

  /** Bucket a timestamp column to a fixed interval of `seconds`. */
  def bucket(ts: Column, seconds: Long): Column = {
    val step = seconds * 1000L
    timestamp_millis((floor(unix_millis(ts) / step) * step).cast("long"))
  }

  /** Calendar bucketing (day/week/month/...) via date_trunc. */
  def truncate(ts: Column, unit: String): Column = date_trunc(unit, ts)

  /** Bucket by an auto-chosen interval (fixed or calendar). */
  def autoBucket(ts: Column, span: Duration, targetBuckets: Int = 50): Column =
    autoInterval(span, targetBuckets) match {
      case Left(seconds) => bucket(ts, seconds)
      case Right(unit) => truncate(ts, unit)
    }
}
