package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Period-over-period contribution analysis: which segments drove the
  * total change of a metric between a baseline period A and a
  * comparison period B. Per segment: both sums, the delta, and the
  * segment's share of the TOTAL delta in signed ppm. The division is
  * written sign-explicitly — sign(delta·tot) × (|delta|·1e6 div
  * |tot|) — because engines disagree on NEGATIVE integer division
  * (Spark `div` truncates toward zero; DuckDB `//` has floored
  * semantics in some releases); with non-negative operands floor and
  * trunc coincide, so every engine computes the identical truncating
  * share. The root-cause triage view every metrics dashboard needs
  * when a topline moves.
  *
  * Scale shape: one conditional-sum hash-agg over the union (map-side
  * combinable — the period flag is a row-local predicate, so A and B
  * are never scanned separately), plus a broadcast of the 1-row total.
  * Share is null when the total delta is zero (nothing to attribute).
  */
object Contribution {

  /** `periodBCol` is a boolean column marking comparison-period rows.
    * Output: segmentCol, sum_a, sum_b, delta, share_ppm.
    */
  def deltaShares(df: DataFrame, segmentCol: String, valueCol: String,
      periodBCol: String): DataFrame = {
    val seg = df.groupBy(col(segmentCol)).agg(
      sum(when(!col(periodBCol), col(valueCol)).otherwise(0L)).as("sum_a"),
      sum(when(col(periodBCol), col(valueCol)).otherwise(0L)).as("sum_b"))
      .withColumn("delta", col("sum_b") - col("sum_a"))
    val tot = seg.agg(sum(col("delta")).as("__tot"))
    seg.crossJoin(broadcast(tot))
      .withColumn("share_ppm",
        when(col("__tot") === 0L, lit(null).cast("long"))
          .otherwise(
            when((col("delta") >= 0L) === (col("__tot") >= 0L), lit(1L))
              .otherwise(lit(-1L)) *
            expr("abs(delta) * 1000000 div abs(__tot)")))
      .drop("__tot")
  }
}
