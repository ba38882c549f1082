package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Floored running balance: per key, the balance process
  * b_i = max(0, b_{i−1} + d_i) — inventory that can't go negative,
  * prepaid credits, rate-limit token buckets. The recurrence looks
  * inherently sequential (each step depends on the clamp before it),
  * but it has an exact closed form over plain prefix aggregates:
  *
  *   b_i = cum_i − min(0, min_{k≤i} cum_k)
  *
  * (the running minimum absorbs exactly the mass the floor would have
  * discarded), so the whole process is TWO running-window aggregates
  * over one key-partitioned sort — fully parallel across keys, no
  * iterative/UDF state. A floor event (clamp actually engaged, i.e.
  * the RAW step b_{i−1}+d_i went strictly negative) has its own closed
  * form: raw_i = cum_i − min(0, runmin_{i−1}), so a hit is exactly a
  * row whose cum sets a new running minimum strictly below
  * min(0, previous runmin) — a withdrawal landing exactly on zero is
  * not a clamp.
  *
  * All integer (deltas pre-integerized by the caller), so the oracle
  * replays the identical windows bit-for-bit.
  */
object RunningBalance {

  /** Per key: final_balance, max_balance, floor_hits (rows where the
    * clamp engaged). `orderCols` must totally order each key's rows.
    * Ordering is pinned to ascending NULLS FIRST explicitly (engines
    * disagree on default NULL placement — Spark puts NULLs first
    * ascending, DuckDB last — and a NULL order key silently reorders
    * the prefix sums on one side only); cross-engine oracles must
    * spell `NULLS FIRST` in their window ORDER BYs to match. NULLS
    * FIRST also agrees with Spark's struct-max argmax below, which
    * compares a NULL field as smaller than any value.
    */
  def floored(df: DataFrame, keyCol: String, orderCols: Seq[String],
      deltaCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(orderCols.map(c => col(c).asc_nulls_first): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPrev = Window.partitionBy(col(keyCol))
      .orderBy(orderCols.map(c => col(c).asc_nulls_first): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val stepped = df
      .withColumn("__cum", sum(col(deltaCol)).over(w))
      .withColumn("__bal",
        col("__cum") - least(min(col("__cum")).over(w), lit(0L)))
      .withColumn("__hit", col("__cum") <
        least(coalesce(min(col("__cum")).over(wPrev), lit(0L)), lit(0L)))
    stepped.groupBy(col(keyCol))
      .agg(
        // last row in the order = max (ts, tie) struct — argmax, no
        // second window pass
        max(struct(orderCols.map(col) :+ col("__bal"): _*))("__bal")
          .as("final_balance"),
        max(col("__bal")).as("max_balance"),
        sum(when(col("__hit"), 1L).otherwise(0L)).as("floor_hits"))
  }
}
