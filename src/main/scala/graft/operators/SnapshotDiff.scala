package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row-level diff between two snapshots of a keyed table — the
  * "what changed since yesterday's drop" audit: every key is labeled
  * added / removed / changed / unchanged.
  *
  * Change detection is a null-safe column-by-column comparison
  * (`<=>`), not a row hash — exact (no collision caveat), codegen'd,
  * and an oracle can replay it with IS DISTINCT FROM.
  *
  * Scale shape: one full-outer hash join on the key columns (each
  * side shuffles once on the same uniform key); the compare runs
  * row-local inside the join. No windows, no driver state.
  */
object SnapshotDiff {

  /** keyCols + `status` for every key present in either snapshot.
    * Keys must be unique per snapshot (it's a keyed-table diff, not
    * a multiset diff).
    */
  def diff(
      oldDf: DataFrame,
      newDf: DataFrame,
      keyCols: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val o = oldDf.select(
      (keyCols.map(col) :+ lit(1).as("__in_old")) ++
        compareCols.map(c => col(c).as(s"__o_$c")): _*)
    val n = newDf.select(
      (keyCols.map(col) :+ lit(1).as("__in_new")) ++
        compareCols.map(c => col(c).as(s"__n_$c")): _*)
    val same = compareCols
      .map(c => col(s"__o_$c") <=> col(s"__n_$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    o.join(n, keyCols, "full_outer")
      .withColumn("status",
        when(col("__in_old").isNull, lit("added"))
          .when(col("__in_new").isNull, lit("removed"))
          .when(!same, lit("changed"))
          .otherwise(lit("unchanged")))
      .select(keyCols.map(col) :+ col("status"): _*)
  }
}
