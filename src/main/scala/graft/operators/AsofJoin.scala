package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join: enrich each left row with the most recent right row whose
  * time is at-or-before the left row's time, per key — the temporal
  * correlation the reference leaves to dashboard eyeballing ("logs ↔
  * metrics on (appId, stageId)", SURVEY §2.2 joins note) made into an
  * actual operator.
  *
  * Spark has no asof join; the scalable formulation is UNION + WINDOW,
  * not a range join: tag both sides, exchange ONCE on the key, sort each
  * partition by (time, side) and carry the right payload forward with
  * `last(_, ignoreNulls)` over a running frame. One shuffle total,
  * partition-local sort, no per-row range probe — at any key
  * cardinality this is the plan a range join would only reach after
  * binning, and it never degenerates to a broadcast-n² fallback.
  * Right rows sort BEFORE left rows at equal timestamps, giving the
  * inclusive (`left.time >= right.time`) match — DuckDB `ASOF JOIN`
  * semantics, which the oracle uses verbatim.
  *
  * `right` must be unique per (keys, rightTime) — pre-aggregate
  * otherwise (enforced here with a require on a cheap streaming-side
  * check being impossible, the caller owns it; duplicate right rows
  * would make "the" match nondeterministic on any engine).
  */
object AsofJoin {

  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payloadPrefix: String = ""): DataFrame = {
    val payload = right.columns.filterNot(c => keys.contains(c) || c == rightTime).toSeq
    require(payload.nonEmpty, "right side must carry at least one payload column")
    val outName = (c: String) => payloadPrefix + c
    require(payload.map(outName).toSet.intersect(left.columns.toSet).isEmpty,
      "right payload columns collide with left columns — pass a payloadPrefix")
    require(!(left.columns ++ right.columns).exists(Set("__t", "__side")),
      "column names __t/__side are reserved by asofJoin")

    // tag: right=0 sorts before left=1 at equal time (inclusive match)
    val l = left.withColumn("__t", col(leftTime)).withColumn("__side", lit(1))
    val leftCols = left.columns.toSeq
    val lAligned = payload.foldLeft(l)((df, c) =>
      df.withColumn(outName(c), lit(null).cast(right.schema(c).dataType)))
    val rAligned0 = right
      .withColumn("__t", col(rightTime)).withColumn("__side", lit(0))
    // null out / drop left-only columns, keep key + payload
    val rAligned = leftCols.filterNot(c => keys.contains(c))
      .foldLeft(payload.foldLeft(rAligned0)((df, c) =>
        if (c != outName(c)) df.withColumnRenamed(c, outName(c)) else df)) {
        (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
    val cols = (leftCols ++ payload.map(outName) ++ Seq("__t", "__side")).distinct
    val unioned = lAligned.select(cols.map(col): _*)
      .unionByName(rAligned.select(cols.map(col): _*))

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(unioned)((df, c) =>
      df.withColumn(outName(c), last(col(outName(c)), ignoreNulls = true).over(w)))
    carried.filter(col("__side") === 1).drop("__t", "__side")
  }
}
