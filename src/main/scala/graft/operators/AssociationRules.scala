package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequent-pair mining with association-rule statistics (support,
  * confidence, lift) over (transaction, item) rows — market-basket
  * analysis, and in a training-data pipeline the "which sources/tags
  * co-occur in the same document" diagnostic.
  *
  * Scale shape — Apriori's pruning step IS the distributed plan:
  *
  *   1. item support counts (one hash-agg) and a semi-join keep only
  *      items with support >= minSupItem BEFORE any pair is formed —
  *      the candidate-pair join is quadratic per basket, so shrinking
  *      baskets first is what keeps it feasible at 100 TB;
  *   2. pair generation is a self equi-join ON THE TRANSACTION KEY
  *      (uniform hash) with `item_a < item_b` — per-basket fan-out is
  *      C(k,2) of the basket's SURVIVING size, never corpus-wide;
  *   3. pair support is a second hash-agg, then item supports and the
  *      1-row transaction total are broadcast back.
  *
  * Confidence and lift are reported as exact integer comparisons:
  * conf_pct = (100·sup_ab) div sup_a and lift_pos = [sup_ab·n_tx >
  * sup_a·sup_b] — no FP ratios to drift between engines.
  */
object AssociationRules {

  /** Mine pairs from `df`'s (txCol, itemCol) rows. Output: item_a,
    * item_b (item_a < item_b), sup_ab, sup_a, sup_b, n_tx, conf_pct
    * (of rule a→b), lift_pos.
    */
  def frequentPairs(df: DataFrame, txCol: String, itemCol: String,
      minSupItem: Long, minSupPair: Long): DataFrame = {
    val items = df.select(col(txCol).as("tx"), col(itemCol).as("item"))
      .distinct().persist()
    val itemSup = items.groupBy(col("item"))
      .agg(count(lit(1)).as("sup"))
      .filter(col("sup") >= minSupItem)
      .persist()
    // materialized ONCE and self-joined alias-only: the old renamed
    // item→item_a / item→item_b projections made the two join-side
    // subtrees canonically unequal, so the semi-join ran and the
    // surviving (tx, item) frame exchanged TWICE per run; a
    // checkpointed frame joined through .as() aliases shares one
    // exchange (ReusedExchange — the simhash band self-join lesson)
    val frequent = items.join(itemSup.select("item"), "item", "left_semi")
      .localCheckpoint(true)
    val pairs = frequent.as("fa")
      .join(frequent.as("fb"), col("fa.tx") === col("fb.tx"))
      .filter(col("fa.item") < col("fb.item"))
    val pairSup = pairs
      .groupBy(col("fa.item").as("item_a"), col("fb.item").as("item_b"))
      .agg(count(lit(1)).as("sup_ab"))
      .filter(col("sup_ab") >= minSupPair)
    val nTx = items.select(col("tx")).distinct()
      .agg(count(lit(1)).as("n_tx"))
    pairSup
      .join(itemSup.select(col("item").as("item_a"), col("sup").as("sup_a")), "item_a")
      .join(itemSup.select(col("item").as("item_b"), col("sup").as("sup_b")), "item_b")
      .crossJoin(broadcast(nTx))
      .select(col("item_a"), col("item_b"), col("sup_ab"),
        col("sup_a"), col("sup_b"), col("n_tx"),
        expr("100 * sup_ab div sup_a").as("conf_pct"),
        when(col("sup_ab") * col("n_tx") > col("sup_a") * col("sup_b"), 1L)
          .otherwise(0L).as("lift_pos"))
  }
}
