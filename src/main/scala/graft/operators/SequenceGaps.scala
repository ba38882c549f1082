package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence-gap detection: find the missing runs in a set of integer
  * ids that should be contiguous — the ingestion-integrity check
  * ("which offsets/sequence numbers never arrived?") that turns a
  * silent data loss into a row you can alert on.
  *
  * The naive form is `lead(k) OVER (ORDER BY k)` — a single-partition
  * global window, the classic funnel trap. Here the global order comes
  * from [[GlobalRank]] (range exchange + partition-local numbering),
  * and "next present id" is an equi-join of rank r against rank r+1 —
  * a uniform-key shuffle join, never one task. Interior gaps only:
  * anything before the first or after the last present id is
  * governed by an expected-range check the caller owns.
  */
object SequenceGaps {

  /** One row per maximal missing run between consecutive present ids:
    * (gap_start, gap_end, missing). Duplicates in `idCol` are
    * collapsed first.
    */
  def gaps(df: DataFrame, idCol: String): DataFrame = {
    val present = df.select(col(idCol).as("k")).distinct()
    val ranked = GlobalRank.rowNumber(present, Seq("k"), "r")
    ranked.as("x")
      .join(ranked.select((col("r") - 1L).as("r"), col("k").as("nk")).as("y"), "r")
      .filter(col("nk") > col("k") + 1L)
      .select((col("k") + 1L).as("gap_start"), (col("nk") - 1L).as("gap_end"),
        (col("nk") - col("k") - 1L).as("missing"))
  }
}
