package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact trailing-window COUNT DISTINCT per bucket — "rolling MAU":
  * for every bucket d, the number of distinct entities active in
  * [d−k+1, d]. A windowed `count(distinct)` is not available as a
  * Spark window function, and the naive per-bucket self-join rescans
  * the activity table once per bucket.
  *
  * The credit-explosion formulation makes it one pass: each distinct
  * (entity, bucket) activity row credits the k buckets it keeps the
  * entity "active" in (`explode(sequence(b, b+k−1))`), the credits are
  * deduplicated per (entity, window-bucket) and counted. Cost is k×|A|
  * rows through two entity-keyed exchanges — linear in the activity
  * volume, embarrassingly parallel, no window function at all.
  *
  * Buckets beyond the observed range are clipped so the output covers
  * exactly [lo+…, hi]; buckets inside the range with no active entity
  * appear with n_distinct = 0 only if some activity credits them —
  * truly empty windows are absent (join a calendar for dense output).
  */
object RollingDistinct {

  /** Distinct `entityCol` count per `bucketCol` over the trailing `k`
    * buckets, clipped to the observed [min, max] bucket range.
    * Output: bucketCol, n_distinct.
    */
  def trailingDistinct(df: DataFrame, entityCol: String, bucketCol: String,
      k: Int): DataFrame = {
    val act = df.select(col(entityCol).as("__e"), col(bucketCol).as("__b"))
      .distinct()
    val bounds = act.agg(min(col("__b")).as("__lo"), max(col("__b")).as("__hi"))
    act.crossJoin(broadcast(bounds))
      .withColumn(bucketCol,
        explode(sequence(col("__b"), least(col("__b") + (k - 1L), col("__hi")))))
      .select(col("__e"), col(bucketCol))
      .distinct()
      .groupBy(col(bucketCol))
      .agg(count(lit(1)).as("n_distinct"))
  }
}
