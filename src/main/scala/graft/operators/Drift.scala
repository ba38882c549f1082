package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Two-sample binned frequency drift — the distribution-shift gate a
  * training pipeline runs between a reference corpus snapshot and a new
  * ingest batch before mixing them: per-bin frequencies of both samples
  * in exact parts-per-million, their signed difference, and a drift
  * flag at a ppm threshold.
  *
  * Exact integers by construction: proportions are `(n·1e6) div total`
  * — nonnegative truncating division agrees between Spark's `div` and
  * DuckDB's integer `//`, and everything stays far inside Long range at
  * any scale (ppm ≤ 1e6 regardless of row counts), unlike cross-
  * multiplied chi-square terms which overflow 64 bits near 1e10-row
  * samples. Consumers wanting a specific statistic (PSI, chi², KL)
  * compute it from the emitted (n_a, n_b, ppm_a, ppm_b) pieces.
  *
  * Scale shape: one hash-agg per sample (map-side combinable), a
  * full-outer merge on the bin key, and a broadcast of the two 1-row
  * totals — no driver round-trip, no window, bin-key uniform shuffles.
  */
object Drift {

  /** Per-bin drift between samples `a` and `b` over `binCol`.
    * Output: bin, n_a, n_b, ppm_a, ppm_b, d_ppm (signed a−b), drifted
    * (1 when |d_ppm| > thresholdPpm).
    */
  def frequencyDrift(a: DataFrame, b: DataFrame, binCol: String,
      thresholdPpm: Long = 5000L): DataFrame = {
    val ca = a.groupBy(col(binCol)).agg(count(lit(1)).as("n_a"))
    val cb = b.groupBy(col(binCol)).agg(count(lit(1)).as("n_b"))
    val bins = ca.join(cb, Seq(binCol), "full_outer")
      .select(col(binCol),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
    val tot = bins.agg(sum(col("n_a")).as("__ta"), sum(col("n_b")).as("__tb"))
    bins.crossJoin(broadcast(tot))
      .select(col(binCol), col("n_a"), col("n_b"),
        expr("n_a * 1000000 div __ta").as("ppm_a"),
        expr("n_b * 1000000 div __tb").as("ppm_b"))
      .withColumn("d_ppm", col("ppm_a") - col("ppm_b"))
      .withColumn("drifted",
        when(abs(col("d_ppm")) > thresholdPpm, 1L).otherwise(0L))
  }
}
