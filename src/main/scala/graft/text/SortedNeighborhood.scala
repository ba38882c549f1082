package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.GlobalRank

/** Sorted-neighborhood candidate generation — the classic MDM blocking
  * alternative to LSH ([[graft.dedup.Dedup]]): sort the corpus by a
  * blocking key, then compare only records within a fixed-width sliding
  * window of the sort order. Candidate volume is exactly `w·n` — linear,
  * tunable, and skew-immune (a degenerate blocking key still yields w
  * comparisons per row, unlike hash blocking where one hot block goes
  * quadratic).
  *
  * Scale shape: the sort is [[GlobalRank]]'s distributed range sort (no
  * single-partition window), and the window join is an equi-join on the
  * dense integer rank — perfectly uniform join keys by construction. An
  * `explode(1..w)` on the left side materializes each row's w probes;
  * shuffle volume is w·n rows of (rank, id, key), independent of any
  * content skew.
  */
object SortedNeighborhood {

  /** Candidate pairs within a window of `w` positions in the total order
    * `sortCols :+ idCol`. Output: (id_a, id_b, key_a, key_b) where id_a
    * precedes id_b in the sort order.
    */
  def candidatePairs(df: DataFrame, idCol: String, keyCol: String,
      sortCols: Seq[String], w: Int): DataFrame = {
    val ranked = GlobalRank.rowNumber(df, sortCols :+ idCol, "__rn")
      .persist()
    val left = ranked
      .withColumn("__d", explode(sequence(lit(1), lit(w))))
      .select((col("__rn") + col("__d")).as("__rn_b"),
        col(idCol).as("id_a"), col(keyCol).as("key_a"))
    val right = ranked.select(col("__rn").as("__rn_b"),
      col(idCol).as("id_b"), col(keyCol).as("key_b"))
    left.join(right, "__rn_b").drop("__rn_b")
  }

  /** Sorted-neighborhood near-duplicate pairs: block on `blockExpr`
    * (applied to `textCol`), verify with edit distance over the first
    * `verifyPrefix` chars at threshold `maxDist`.
    */
  def nearDupPairs(df: DataFrame, idCol: String, textCol: String,
      blockExpr: Column => Column, w: Int, verifyPrefix: Int,
      maxDist: Int): DataFrame = {
    val keyed = df.select(col(idCol), col(textCol),
      blockExpr(col(textCol)).as("__blk"))
    candidatePairs(keyed, idCol, textCol, Seq("__blk"), w)
      .withColumn("dist",
        levenshtein(substring(col("key_a"), 1, verifyPrefix),
          substring(col("key_b"), 1, verifyPrefix)).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
  }
}
