package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pairwise item-set overlap between groups — "how much of source A's
  * vocabulary is also in source B": cross-source contamination /
  * redundancy structure of a corpus, the between-groups complement of
  * the within-corpus dedup family.
  *
  * Scale contract: the GROUP cardinality is small and bounded (sources,
  * crawls, snapshots — tens to hundreds) while items are unbounded.
  * Everything shuffles on the uniformly-distributed item key; the only
  * quadratic object is the per-item group-set self-pairing, bounded by
  * |groups|². No item list is ever collected per group (a
  * collect_set-of-items per group would be the corpus in one row).
  */
object SetOverlap {

  /** Per group pair (a < b): n_shared (distinct items in both),
    * n_a / n_b (distinct items per side), jaccard_ppm (truncating).
    * Pairs sharing zero items are absent (an anti-join could list
    * them; the audit cares about overlap, not its absence).
    * `itemsCol` is an array column of items (e.g. hashed shingles).
    */
  def pairwise(df: DataFrame, groupCol: String, itemsCol: Column): DataFrame = {
    val pairs = df
      .select(col(groupCol).as("g"), explode(itemsCol).as("item"))
      .distinct()
    val sizes = pairs.groupBy(col("g")).agg(count(lit(1)).as("n"))
    val coGroups = pairs.groupBy(col("item"))
      .agg(collect_set(col("g")).as("gs"))
    val shared = coGroups
      .select(explode(col("gs")).as("ga"), col("gs"))
      .select(col("ga"), explode(col("gs")).as("gb"))
      .filter(col("ga") < col("gb"))
      .groupBy(col("ga"), col("gb"))
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(broadcast(sizes.withColumnRenamed("g", "ga").withColumnRenamed("n", "n_a")), "ga")
      .join(broadcast(sizes.withColumnRenamed("g", "gb").withColumnRenamed("n", "n_b")), "gb")
      .select(col("ga").as("source_a"), col("gb").as("source_b"),
        col("n_shared"), col("n_a"), col("n_b"),
        expr("(n_shared * 1000000L) div (n_a + n_b - n_shared)").as("jaccard_ppm"))
  }
}
