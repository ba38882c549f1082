package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention matrix over an event stream: users grouped by the
  * week of their FIRST event (the cohort), counted in every later week
  * they return. Pure epoch-integer week arithmetic — no calendar
  * truncation, so any SQL oracle replays it exactly and DST/locale can
  * never skew a bucket.
  *
  * Scale shape: the first-event aggregate and the join back both key
  * on the user id — one uniform hash partitioning, reused (the join is
  * Exchange-free on the agg side). The final (cohort, offset) aggregate
  * has a bounded key space (weeks², tiny) and the distinct-user count
  * inside it is Spark's standard two-phase distinct aggregate.
  */
object Retention {

  val WeekMs: Long = 7L * 86400000L
  val DayMs: Long = 86400000L

  /** (cohort_week, week_offset, n_users): epoch-period of first event,
    * whole periods since it, distinct returning users. `periodMs`
    * defaults to a week; pass `DayMs` for daily cohorts.
    */
  def matrix(
      events: DataFrame,
      userCol: String,
      tsMsCol: String,
      periodMs: Long = WeekMs): DataFrame = {
    require(periodMs > 0, "periodMs must be positive")
    val ev = events.select(col(userCol).as("u"), col(tsMsCol).as("ms"))
    val first = ev.groupBy(col("u")).agg(min(col("ms")).as("first_ms"))
    ev.join(first, "u")
      .select(
        col("u"),
        floor(col("first_ms") / periodMs).cast("long").as("cohort_week"),
        floor((col("ms") - col("first_ms")) / periodMs).cast("long").as("week_offset"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("u")).as("n_users"))
  }
}
