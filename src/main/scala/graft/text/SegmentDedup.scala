package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-wide segment-level exact deduplication (C4-style "line
  * dedup"): split every document into fixed-width word segments, keep
  * only the FIRST occurrence of each distinct segment across the whole
  * corpus (ordered by doc id, then position), and rebuild documents from
  * their surviving segments. Removes boilerplate paragraphs that exact
  * whole-doc dedup (q17) and near-dup dedup (q18) both miss — the
  * standard pretraining-corpus cleanup between those two granularities.
  *
  * Scale shape: one `posexplode` (segments ≈ tokens/W rows), ONE
  * segment-keyed exchange for the first-occurrence window, then one
  * doc-keyed aggregation to reassemble — no self-joins, no windows over
  * undivided data. At 100 TB the segment exchange is the cost; it ships
  * each segment's text once (the dedup key IS the payload), exactly like
  * the exact-dedup hash-agg. Degenerate segments (empty docs) are
  * regular keys with bounded group size after the window's rank-1 cut.
  */
object SegmentDedup {

  /** Per-doc segment table: (docId, idx, seg) with `width`-word
    * segments in document order. The trailing segment keeps the
    * remainder words.
    */
  def segments(df: DataFrame, idCol: String, textCol: String,
      width: Int): DataFrame = {
    require(width >= 1, "segment width must be >= 1")
    val segs = expr(
      s"""transform(sequence(0, cast(ceil(size(split(trim($textCol), '\\\\s+')) / ${width}.0) as int) - 1),
         |  i -> array_join(slice(split(trim($textCol), '\\\\s+'), i * $width + 1, $width), ' '))""".stripMargin)
    df.select(col(idCol), posexplode(segs).as(Seq("idx", "seg")))
  }

  /** Deduplicate: returns one row per doc with `n_segs`, `n_kept`, and
    * `fp` = md5 of the rebuilt (space-joined surviving segments) text.
    */
  def dedupSegments(df: DataFrame, idCol: String, textCol: String,
      width: Int = 12): DataFrame = {
    val segs = segments(df, idCol, textCol, width)
    // first occurrence wins, globally: rank within identical segments by
    // (doc, position) — one exchange keyed on the segment text
    val w = Window.partitionBy(col("seg")).orderBy(col(idCol), col("idx"))
    val ranked = segs.withColumn("rn", row_number().over(w))
    ranked.groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_segs"),
        sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_kept"),
        md5(array_join(transform(array_sort(
            collect_list(when(col("rn") === 1, struct(col("idx"), col("seg"))))),
          x => x("seg")), " ").cast("binary")).as("fp"))
  }
}
