package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exponentially time-decayed aggregates ("trending" counters) with a
  * DETERMINISTIC dyadic decay: a row aged `age` time-units contributes
  * weight 2^(−⌊age/halfLife⌋) — exact half-life semantics quantized to
  * half-life steps, so every weight is an exact power of two and the
  * whole aggregate runs in INTEGER units of 2^−maxK. No float sum ever
  * happens, so the result is a well-defined function of the data (not
  * of partial-aggregation order) and a cross-engine oracle replays it
  * bit-for-bit — the same reproducibility convention as [[AbTest]].
  *
  * Continuous exp(−λ·age) decay would differ across libm
  * implementations in the last ulp and make hash-exact verification
  * impossible; the step form keeps the operational meaning (halve the
  * weight every half-life) and stays exact.
  *
  * Scale shape: ONE hash aggregation over the rows (map-side
  * combinable sums of int64 units) — the decayed counter is algebraic,
  * so it parallelizes exactly like a plain sum. Ages beyond
  * maxK·halfLife saturate at weight 2^−maxK (≈1.5e-5 of a fresh row
  * for maxK=16): the tail stays monotone and the unit value never
  * underflows. Unit sums fit int64 up to 2^63−maxK rows — at 100 TB
  * (~10¹² rows × 2^16 units) headroom is ~10⁵×.
  */
object Decay {

  /** Per-group decayed counters. `ageCol` must be a non-negative
    * integral column in the same unit as `halfLife` (e.g. days);
    * `valueUnitsCol` an exact int64 metric (integerize floats with
    * floor/scale first). Output per group: n, decayed_units,
    * dec_value_units (int64-exact), and `decayed` — the convenience
    * double decayed_units/2^maxK (one division, deterministic).
    */
  def decayedCounts(df: DataFrame, groupCol: String, ageCol: String,
      valueUnitsCol: String, halfLife: Long, maxK: Int = 16): DataFrame = {
    require(halfLife > 0 && maxK >= 0 && maxK <= 62, "bad decay params")
    // `div`, not `/`: Column./ is DOUBLE division in Spark SQL.
    // (functions.shiftleft only takes a literal shift → expr form.)
    val w: Column = expr(
      s"shiftleft(1L, cast($maxK - least($ageCol div ${halfLife}L, ${maxK}L) as int))")
    df.withColumn("__w", w)
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        sum(col("__w")).as("decayed_units"),
        sum(col(valueUnitsCol) * col("__w")).as("dec_value_units"))
      .withColumn("decayed",
        col("decayed_units").cast("double") / lit(math.pow(2.0, maxK)))
  }
}
