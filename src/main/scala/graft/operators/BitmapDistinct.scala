package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bitmap-accelerated EXACT distinct counting — the segmented-bitmap
  * pattern (Doris/ClickHouse bitmap columns) on Spark's native bitmap
  * expressions. Ids are sharded into fixed 32k-bit buckets
  * (`bitmap_bucket_number`), each (group, bucket) builds one compact
  * bitmap in a single map-side-combinable hash agg
  * (`bitmap_construct_agg`), and a distinct count is then
  * `sum(bitmap_count(bm))` over a group's buckets — no row-per-id
  * shuffle ever happens after the first agg, and partial bitmaps are
  * REUSABLE: counting a coarser rollup is `bitmap_or_agg` over the
  * already-built partials instead of a second scan of the fact table.
  * That reuse is the 100 TB win over count(distinct): the raw scan
  * happens once, every rollup after it runs on bucket-sized state.
  */
object BitmapDistinct {

  /** Per-(groupCols, bucket) partial bitmaps of `id`. The returned
    * frame is the reusable intermediate: feed it to [[countPartials]]
    * for per-group exact distincts, or re-aggregate it with
    * `bitmap_or_agg` under coarser keys first.
    */
  def partials(df: DataFrame, groupCols: Seq[String], id: Column): DataFrame =
    df.select((groupCols.map(col) :+ id.as("__bm_id")): _*)
      .groupBy((groupCols.map(col) :+
        expr("bitmap_bucket_number(__bm_id)").as("__bkt")): _*)
      .agg(expr("bitmap_construct_agg(bitmap_bit_position(__bm_id))").as("__bm"))

  /** Exact distinct count per `groupCols` from a [[partials]] frame
    * (possibly re-grouped): one bounded agg over bucket rows.
    */
  def countPartials(partials: DataFrame, groupCols: Seq[String],
      as: String): DataFrame =
    partials.groupBy(groupCols.map(col): _*)
      .agg(sum(expr("bitmap_count(__bm)")).as(as))

  /** Merge partial bitmaps to a coarser grouping (still per bucket),
    * e.g. dropping a dimension: the rollup path that never rescans.
    */
  def merge(partials: DataFrame, groupCols: Seq[String]): DataFrame =
    partials.groupBy((groupCols.map(col) :+ col("__bkt")): _*)
      .agg(expr("bitmap_or_agg(__bm)").as("__bm"))
}
