package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Conversion-funnel analysis: how many users progress through an
  * ordered sequence of event stages (view → click → purchase), where
  * each next stage must occur STRICTLY after the previous one and
  * within a per-step conversion window — the product-analytics staple
  * the reference's dashboards stop short of (their aggs are per-metric,
  * not per-sequence).
  *
  * Semantics are FIRST-TOUCH: stage 1 anchors on the user's first
  * stage-1 event, and each later stage on the first qualifying event
  * after the previous stage's time. A user whose first anchor never
  * converts is not retried on later anchors — the deterministic,
  * oracle-replayable reading, and the one that matches "time from first
  * exposure" metrics.
  *
  * Scale shape: stage i touches ONLY stage-i-type events (the type
  * filter reaches the scan), and every join/agg keys on the user id —
  * one uniform-key partitioning reused down the chain, no windows over
  * raw events, no per-user arrays. Per-user event multiplicity only
  * inflates the one stage it belongs to.
  */
object Funnel {

  /** Per-user stage timestamps: one row per user who reached stage 1,
    * columns `t1..tk` (epoch-ms in `tsMsCol`'s unit; null from the
    * first stage the user failed to reach). Stage i+1 = the user's
    * first `stages(i)` event with `t_i < ts <= t_i + windowMs`.
    */
  def stageTimes(
      events: DataFrame,
      userCol: String,
      tsMsCol: String,
      typeCol: String,
      stages: Seq[String],
      windowMs: Long): DataFrame = {
    require(stages.size >= 2, "a funnel needs at least two stages")
    require(stages.distinct.size == stages.size, "funnel stages must be distinct")
    require(windowMs > 0, "windowMs must be positive")
    require(!events.columns.contains("__ms") && !events.columns.exists(_.matches("t\\d+")),
      "column names __ms and t<i> are reserved by stageTimes")
    val first = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol)).agg(min(col(tsMsCol)).as("t1"))
    stages.zipWithIndex.drop(1).foldLeft(first) { case (acc, (stage, i)) =>
      val prev = col(s"t$i")
      val ev = events.filter(col(typeCol) === stage)
        .select(col(userCol), col(tsMsCol).as("__ms"))
      val carried: Seq[Column] = (1 to i).map(j => col(s"t$j"))
      acc.join(ev, Seq(userCol), "left")
        .groupBy(col(userCol) +: carried: _*)
        .agg(min(when(col("__ms") > prev && col("__ms") <= prev + windowMs,
          col("__ms"))).as(s"t${i + 1}"))
    }
  }

  /** Funnel summary: ONE row with `n_<stage>` = users reaching each
    * stage (count ignores the null drop-outs, so the counts are
    * monotone non-increasing by construction).
    */
  def counts(
      events: DataFrame,
      userCol: String,
      tsMsCol: String,
      typeCol: String,
      stages: Seq[String],
      windowMs: Long): DataFrame =
    stageTimes(events, userCol, tsMsCol, typeCol, stages, windowMs)
      .agg(
        count(col("t1")).as(s"n_${stages.head}"),
        stages.zipWithIndex.drop(1).map { case (s, i) =>
          count(col(s"t${i + 1}")).as(s"n_$s")
        }: _*)
}
