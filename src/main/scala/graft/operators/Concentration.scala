package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Market-concentration metrics per group: HHI (Herfindahl–Hirschman
  * index, Σ shareᵢ²) and CR-k (share of the top k holders) — the
  * antitrust-style "is this dimension dominated by a few keys" audit
  * that complements [[Gini]]'s inequality view (HHI weights the head,
  * Gini the whole curve).
  *
  * Shares are truncating-integer ppm of the group total, so HHI and
  * CR-k are EXACT integers (HHI in ppm² units, ≤ 10¹²·holders; CR-k
  * in ppm): hash-reproducible by construction. Holder revenue is
  * pre-aggregated (holders ≪ rows), totals broadcast back, and the
  * top-k rank runs on the holder frame partitioned by group — never
  * on raw rows.
  */
object Concentration {

  /** Per group: n_holders, total (value units), hhi_ppm2 (Σ of
    * per-holder ppm² shares), crk_ppm (summed ppm share of the top k
    * holders by value, ties broken on the holder key). Zero-total
    * groups are dropped (no defined shares).
    */
  def hhi(df: DataFrame, groupCol: String, holderCol: String,
      valueCol: String, k: Int): DataFrame = {
    val holders = df.groupBy(col(groupCol), col(holderCol))
      .agg(sum(col(valueCol).cast("long")).as("__v"))
    val totals = holders.groupBy(col(groupCol))
      .agg(sum(col("__v")).as("__tot"), count(lit(1)).as("n_holders"))
      .filter(col("__tot") > 0)
    val shared = holders.join(broadcast(totals), groupCol: String)
      .withColumn("__ppm", expr("(__v * 1000000L) div __tot"))
    val rk = Window.partitionBy(col(groupCol))
      .orderBy(col("__v").desc, col(holderCol))
    shared
      .withColumn("__rk", row_number().over(rk))
      .groupBy(col(groupCol))
      .agg(
        first(col("n_holders")).as("n_holders"),
        first(col("__tot")).as("total"),
        sum(col("__ppm") * col("__ppm")).as("hhi_ppm2"),
        sum(when(col("__rk") <= k, col("__ppm")).otherwise(0L)).as("crk_ppm"))
  }

  /** Pareto point per group: the smallest number of top holders (by
    * value desc, holder-key tiebreak) whose running mass reaches
    * `tNum/tDen` of the group total — "how many customers are 80% of
    * revenue". Exact integer test (tDen·running ≥ tNum·total), holder
    * pre-agg + rank/running windows on the holder frame only.
    * Output per group: n_holders, total, pareto_k.
    */
  def paretoK(df: DataFrame, groupCol: String, holderCol: String,
      valueCol: String, tNum: Int, tDen: Int): DataFrame = {
    require(tNum > 0 && tNum <= tDen, "threshold must be in (0, 1]")
    val holders = df.groupBy(col(groupCol), col(holderCol))
      .agg(sum(col(valueCol).cast("long")).as("__v"))
    val totals = holders.groupBy(col(groupCol))
      .agg(sum(col("__v")).as("__tot"), count(lit(1)).as("n_holders"))
      .filter(col("__tot") > 0)
    val rk = Window.partitionBy(col(groupCol))
      .orderBy(col("__v").desc, col(holderCol))
    val run = rk.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    holders.join(broadcast(totals), groupCol: String)
      .withColumn("__rk", row_number().over(rk).cast("long"))
      .withColumn("__run", sum(col("__v")).over(run))
      .filter(lit(tDen.toLong) * col("__run") >= lit(tNum.toLong) * col("__tot"))
      .groupBy(col(groupCol))
      .agg(first(col("n_holders")).as("n_holders"),
        first(col("__tot")).as("total"),
        min(col("__rk")).as("pareto_k"))
  }
}
