package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed-table writers — co-located joins without a per-query
  * shuffle (the brief's "bucketing for co-located joins"). Two tables
  * bucketed the SAME way on the join key sort-merge-join with ZERO
  * exchange: at 100 TB the shuffle you skip per query is the dominant
  * cost of a fact⋈fact join, paid once at write time instead.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted table registered in the session
    * catalog at an explicit path. `n` must match across tables meant to
    * co-join.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      path: String,
      bucketCol: String,
      n: Int): Unit =
    df.write
      .mode("overwrite")
      .option("path", path)
      .bucketBy(n, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)
}
