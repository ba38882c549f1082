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
    // the three time columns are spliced into expr() SQL — restrict them
    // to plain identifiers so dotted/quoted names fail loudly here
    // rather than parse as something else downstream
    Seq(pointMs, startMs, endMs).foreach(c =>
      require(c.matches("[A-Za-z_][A-Za-z0-9_]*"),
        s"time column '$c' must be a simple identifier (rename before joining)"))
    require(points.columns.toSet.intersect(intervals.columns.toSet).isEmpty,
      "point and interval column names collide — rename before joining")
    require(!(points.columns ++ intervals.columns).contains("__bin"),
      "column name __bin is reserved by pointInInterval")

    // exact long FLOOR division (`div` truncates toward zero, which
    // would make bin 0 span (-W, W) for pre-epoch times; floor(double/)
    // loses ulps past 2^53 ms) — uniform bins at every epoch. Half-open
    // end: the last covered bin is floor((end-1)/W), so an interval
    // ending exactly on a bin edge does not spill into the next bin.
    val w = s"${binWidthMs}L"
    def floorDiv(x: String) =
      expr(s"($x) div $w - (CASE WHEN ($x) % $w < 0 THEN 1 ELSE 0 END)")
    val binned = intervals
      .filter(col(endMs) > col(startMs))
      .withColumn("__bin",
        explode(sequence(floorDiv(startMs), floorDiv(s"$endMs - 1"))))
    val pts = points.withColumn("__bin", floorDiv(pointMs))
    pts.join(binned, "__bin")
      .filter(col(pointMs) >= col(startMs) && col(pointMs) < col(endMs))
      .drop("__bin")
  }

  /** Interval×interval OVERLAP join: pair every left interval with
    * every right interval it overlaps (half-open `[start, end)`,
    * `startL < endR && startR < endL`), optionally restricted to rows
    * agreeing on equi-key pairs.
    *
    * Same bin-bucketing idea as [[pointInInterval]], but BOTH sides
    * explode onto their covered bins, so an overlapping pair can meet
    * in many bins. Exactly-once emission without a dedup shuffle: a
    * pair is emitted only in its RESPONSIBILITY BIN — the bin holding
    * `max(startL, startR)`. Both sides provably cover that bin (each
    * interval covers its own start's bin, and the earlier-starting
    * interval covers it because its start ≤ maxStart < its end when
    * they overlap), and it is unique per pair, so the residual
    * `__bin == floorDiv(greatest(startL, startR))` keeps one copy.
    *
    * The join itself is an ordinary equi-join on (keys…, __bin) that
    * Catalyst shuffles/broadcasts/AQE-splits like any other — no
    * BroadcastNestedLoopJoin, no cartesian. `binWidth` trades fan-out
    * (rows per interval = len/binWidth + 1) against bin co-residency;
    * set it near the typical interval length.
    */
  def intervalOverlap(
      left: DataFrame,
      right: DataFrame,
      startL: String,
      endL: String,
      startR: String,
      endR: String,
      binWidth: Long,
      keys: Seq[(String, String)] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    Seq(startL, endL, startR, endR).foreach(c =>
      require(c.matches("[A-Za-z_][A-Za-z0-9_]*"),
        s"time column '$c' must be a simple identifier (rename before joining)"))
    require(left.columns.toSet.intersect(right.columns.toSet).isEmpty,
      "left and right column names collide — rename before joining")
    require(!(left.columns ++ right.columns).contains("__bin"),
      "column name __bin is reserved by intervalOverlap")

    val w = s"${binWidth}L"
    def floorDiv(x: String) =
      expr(s"($x) div $w - (CASE WHEN ($x) % $w < 0 THEN 1 ELSE 0 END)")
    def binned(df: DataFrame, s: String, e: String) = df
      .filter(col(e) > col(s))
      .withColumn("__bin", explode(sequence(floorDiv(s), floorDiv(s"$e - 1"))))

    val l = binned(left, startL, endL)
    val r = binned(right, startR, endR)
    val cond = keys.map { case (lk, rk) => l(lk) === r(rk) }
      .foldLeft(l("__bin") === r("__bin"))(_ && _)
    l.join(r, cond)
      .filter(col(startL) < col(endR) && col(startR) < col(endL))
      .filter(l("__bin") === floorDiv(s"greatest($startL, $startR)"))
      .drop("__bin")
  }
}
