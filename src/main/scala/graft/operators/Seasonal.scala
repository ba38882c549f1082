package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classical additive seasonal decomposition (trend / seasonal /
  * residual) of a daily series with weekly period, kept entirely in
  * scaled integers so both engines agree bit-for-bit: instead of
  * dividing by the window width and the per-weekday day count, every
  * component is carried as an exact scaled numerator —
  *
  *   trend_sum7 = Σ n over the centered 7-day RANGE window
  *   dev7       = 7·n − trend_sum7           (detrended, ×7)
  *   seas_num   = Σ dev7 over same weekday   (seasonal, ×7·seas_cnt)
  *   resid_num  = dev7·seas_cnt − seas_num   (residual, ×7·seas_cnt)
  *
  * The trend window is a RANGE frame over the integer day index, so
  * calendar gaps shrink the window's row count and the full-window
  * filter (exactly 7 days present) drops boundary and gap-adjacent
  * days — the standard centered-moving-average edge rule.
  *
  * Scale: one global-ordered RANGE window over the DAILY series — the
  * frame is |days| rows (3 orders of magnitude smaller than the event
  * stream), so the unpartitioned window is a deliberate post-agg
  * driver-scale step, same convention as TopK's final ranking.
  */
object Seasonal {

  /** Decompose a pre-aggregated daily frame (dayCol: integer day
    * index, nCol: the measure). Output per retained day: day, n,
    * trend_sum7, dev7, weekday (day mod 7), seas_num, seas_cnt,
    * resid_num — ordered by day.
    */
  def weekly(daily: DataFrame, dayCol: String, nCol: String): DataFrame = {
    val w = Window.orderBy(col(dayCol).cast("long"))
      .rangeBetween(-3L, 3L)
    val trended = daily
      .select(col(dayCol).cast("long").as("day"), col(nCol).cast("long").as("n"))
      .withColumn("trend_sum7", sum(col("n")).over(w))
      .withColumn("days_in", count(lit(1)).over(w))
      .filter(col("days_in") === 7L)
      .withColumn("dev7", lit(7L) * col("n") - col("trend_sum7"))
      .withColumn("weekday", pmod(col("day"), lit(7L)))
    val seasonal = trended.groupBy(col("weekday"))
      .agg(sum(col("dev7")).as("seas_num"), count(lit(1)).as("seas_cnt"))
    trended.join(broadcast(seasonal), "weekday")
      .select(col("day"), col("n"), col("trend_sum7"), col("dev7"),
        col("weekday"),
        col("seas_num"), col("seas_cnt"),
        (col("dev7") * col("seas_cnt") - col("seas_num")).as("resid_num"))
      .orderBy(col("day"))
  }
}
