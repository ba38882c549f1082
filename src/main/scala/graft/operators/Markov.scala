package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-order Markov transition matrix over a per-key event sequence:
  * count (state → next state) steps and their row-normalized
  * probabilities. The "what do users do next" building block behind
  * journey analysis and sequence-model training data.
  *
  * Scale shape: one hash partitioning on the sequence key for the
  * lead() step, then a transition-pair aggregation whose cardinality
  * is |states|² — bounded, tiny — so the row-normalizing window runs
  * on the AGGREGATED frame, never on raw events. Counts are exact
  * longs; the probability is one double division + round(6), the same
  * fixed-shape FP step the q67 z-scores use.
  */
object Markov {

  /** (from_type, to_type, n, p) for every observed transition.
    * Events are ordered per key by (ts, tiebreak); sequences do not
    * cross keys. p sums to 1 per from_type (up to rounding).
    */
  def transitions(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      typeCol: String): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val steps = events
      .withColumn("__next", lead(col(typeCol), 1).over(byKey))
      .filter(col("__next").isNotNull)
    steps
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p",
        round(col("n").cast("double") /
          sum(col("n")).over(Window.partitionBy(col("from_type"))), 6))
  }

  /** Length-`n` state-sequence counts (the order-(n−1) generalization
    * of [[transitions]]): every run of n consecutive events per key,
    * counted by its (s1, …, sn) signature. Same single key
    * partitioning; the lead() chain stays in one window stage.
    */
  def sequenceCounts(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      typeCol: String,
      n: Int): DataFrame = {
    require(n >= 2, "sequences need length >= 2")
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val withLeads = (1 until n).foldLeft(
      events.withColumn("s1", col(typeCol))) { (df, i) =>
      df.withColumn(s"s${i + 1}", lead(col(typeCol), i).over(byKey))
    }
    val seqCols = (1 to n).map(i => col(s"s$i"))
    withLeads.filter(col(s"s$n").isNotNull)
      .groupBy(seqCols: _*)
      .agg(count(lit(1)).as("n"))
  }
}
