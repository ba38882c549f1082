package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gini concentration per group: how unequally a non-negative measure
  * (tokens per document, revenue per customer, events per user) is
  * distributed — the corpus-audit number behind "10% of sources supply
  * 90% of tokens". Uses the rank form of the Gini coefficient on the
  * ascending-sorted values:
  *
  *   G = (2·Σ rᵢ·vᵢ − (n+1)·Σ vᵢ) / (n·Σ vᵢ)
  *
  * Numerator/denominator are EXACT integers (DECIMAL(38,0) for the
  * rank-weighted product sum — r·v then Σ overflows int64 at large n,
  * same HUGEINT-mirror convention as the PMI/AbTest operators); the
  * coefficient itself is one decimal division surfaced alongside.
  * Within a tie block of equal values the rank sum Σr is
  * order-independent, so a (value, tiebreak) sort makes the whole
  * statistic deterministic.
  *
  * Shape: one rank window + one sum window worth of state folded into
  * a single group-partitioned sort + one hash-agg — parallel across
  * groups; no global sort, no driver collect.
  */
object Gini {

  /** Per group: n, sum_v, gini_num, gini_den (int64 — the decimal
    * intermediates are cast down for output per the q134 HUGEINT
    * convention; document the ~9e18 output bound), gini (double from
    * the un-truncated decimals; null when n·Σv = 0).
    */
  def concentration(df: DataFrame, groupCol: String, valueCol: String,
      tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("__v"), col(tieCol))
    val ranked = df
      .select(col(groupCol), col(valueCol).cast("long").as("__v"),
        col(tieCol))
      .withColumn("__r", row_number().over(w).cast("long"))
    ranked.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        sum(col("__v")).as("sum_v"),
        // cast BEFORE the multiply: r·v in int64 overflows long before
        // the decimal sum would
        sum(col("__r").cast("decimal(38,0)") * col("__v")).as("__rw"))
      .withColumn("__num",
        lit(2).cast("decimal(38,0)") * col("__rw") -
          (col("n") + 1).cast("decimal(38,0)") * col("sum_v"))
      .withColumn("__den", col("n").cast("decimal(38,0)") * col("sum_v"))
      .withColumn("gini",
        when(col("__den") =!= 0,
          col("__num").cast("double") / col("__den").cast("double")))
      .withColumn("gini_num", col("__num").cast("long"))
      .withColumn("gini_den", col("__den").cast("long"))
      .select(col(groupCol), col("n"), col("sum_v"),
        col("gini_num"), col("gini_den"), col("gini"))
  }
}
