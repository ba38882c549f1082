package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join: pair every point row with every
  * interval row whose half-open span `[start, end)` contains the
  * point's time — the other temporal-correlation operator (with
  * [[AsofJoin]]) the reference leaves to dashboard eyeballing.
  *
  * Spark has no range join; the naive non-equi formulation degenerates
  * to BroadcastNestedLoopJoin (or a cartesian product when neither side
  * fits in memory) — quadratic work at 100 TB. The scalable formulation
  * is BIN BUCKETING: quantize time into fixed-width bins, explode each
  * interval onto every bin it overlaps, tag each point with its single
  * containing bin, equi-join on the bin key (an ordinary shuffled/
  * broadcast hash join Catalyst can plan, reorder and AQE-skew-split),
  * then apply the exact containment predicate as a residual filter.
  * Each matching (point, interval) pair is emitted exactly once because
  * a point lives in exactly one bin — no post-join dedup shuffle.
  *
  * `binWidthMs` is the fan-out knob: an interval explodes into
  * `len/binWidth + 1` bin rows, so pick the bin width at or above the
  * typical interval length (1 extra row per interval) and never far
  * below the shortest one. Empty or inverted intervals (`end <= start`)
  * match nothing, mirroring the half-open predicate.
  */
object RangeJoin {

  /** Inner-join `points` to `intervals` on
    * `start <= point < end` (epoch-millis long columns). Output carries
    * all columns of both inputs; column names must not collide.
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointMs: String,
      startMs: String,
      endMs: String,
      binWidthMs: Long): DataFrame = {
    require(binWidthMs > 0, "binWidthMs must be positive")
    require(points.columns.toSet.intersect(intervals.columns.toSet).isEmpty,
      "point and interval column names collide — rename before joining")
    require(!(points.columns ++ intervals.columns).contains("__bin"),
      "column name __bin is reserved by pointInInterval")

    // floor-division via `div` (exact on longs; floor(double/) loses
    // ulps past 2^53 ms). Half-open end: the last covered bin is
    // floor((end-1)/W), so an interval ending exactly on a bin edge
    // does not spill into the next bin.
    val w = s"${binWidthMs}L"
    val binned = intervals
      .filter(col(endMs) > col(startMs))
      .withColumn("__bin",
        explode(sequence(expr(s"$startMs div $w"), expr(s"($endMs - 1) div $w"))))
    val pts = points.withColumn("__bin", expr(s"$pointMs div $w"))
    pts.join(binned, "__bin")
      .filter(col(pointMs) >= col(startMs) && col(pointMs) < col(endMs))
      .drop("__bin")
  }
}
