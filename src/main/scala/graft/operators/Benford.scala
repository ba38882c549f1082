package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benford first-digit audit: the distribution of leading digits of a
  * positive numeric column against Benford's law — the classic
  * fraud/synthetic-data screen for financial-style measures. Expected
  * frequencies log10(1+1/d) are HARD-CODED ppm integer literals (not
  * computed with log(), whose last ulp differs across libm builds), so
  * the whole audit is exact integer arithmetic and hash-reproducible:
  * observed ppm uses one truncating div, deviation is an int subtract.
  *
  * Scale shape: leading-digit extraction is a row-local string op on
  * the integral part, then ONE 9-row hash-agg; the deviation math runs
  * on the 9-row frame. Map-side combine makes the heavy pass a single
  * scan. int64 ppm math is safe to 9.2e12 rows of headroom per digit
  * (n·10⁶ must fit int64 → n ≤ 9.2e12).
  */
object Benford {

  private val expectedPpm: Map[Int, Long] = Map(
    1 -> 301030L, 2 -> 176091L, 3 -> 124939L, 4 -> 96910L,
    5 -> 79181L, 6 -> 66947L, 7 -> 57992L, 8 -> 51153L, 9 -> 45757L)

  /** Rows with value < 1 are excluded (no stable leading digit in
    * integer terms). Output per digit: n, obs_ppm, expected_ppm,
    * dev_ppm = obs − expected.
    */
  def firstDigit(df: DataFrame, valueCol: String): DataFrame = {
    val expectedExpr = expectedPpm.toSeq.sortBy(_._1)
      .foldLeft(lit(0L)) { case (acc, (d, ppm)) =>
        when(col("digit") === d, lit(ppm)).otherwise(acc)
      }
    val digits = df
      .filter(col(valueCol) >= 1)
      .select(substring(floor(col(valueCol)).cast("string"), 1, 1)
        .cast("long").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val total = digits.agg(sum(col("n")).as("__tot"))
    digits.crossJoin(broadcast(total))
      .withColumn("obs_ppm", expr("(n * 1000000L) div __tot"))
      .withColumn("expected_ppm", expectedExpr)
      .withColumn("dev_ppm", col("obs_ppm") - col("expected_ppm"))
      .drop("__tot")
  }
}
