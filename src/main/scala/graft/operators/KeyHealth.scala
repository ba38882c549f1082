package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join-key quality audits — the checks a pipeline runs BEFORE a big
  * join, because at 100 TB a bad key is cheaper to detect than to
  * join: null keys silently drop rows, unexpected duplicates multiply
  * them, and a skewed many-to-many key turns a join into a cross
  * product on one reducer.
  *
  * Both audits are two-level aggregations: a per-key count (one
  * shuffle on the key itself, the same partitioning the real join
  * would use — so the audit is strictly cheaper than the join it
  * guards), then a tiny rollup. Nothing is collected to the driver.
  */
object KeyHealth {

  /** One audited key: the frame, a display name, and the key column. */
  final case class KeySpec(df: DataFrame, table: String, key: String)

  /** Per audited key: n_rows, n_null (rows with a NULL key),
    * n_distinct (distinct non-null values), max_mult (highest
    * multiplicity of any value), dup_ppm (fraction of non-null rows
    * beyond the first per value, truncating ppm — 0 means unique).
    */
  def keyHealth(spark: SparkSession, keys: Seq[KeySpec]): DataFrame = {
    val audits = keys.map { case KeySpec(df, table, key) =>
      val k = col(key)
      val perValue = df.select(k.as("__k")).filter(col("__k").isNotNull)
        .groupBy(col("__k")).agg(count(lit(1)).as("__n"))
      val nulls = df.agg(
        count(lit(1)).as("n_rows"),
        sum(when(k.isNull, 1L).otherwise(0L)).as("n_null"))
      val rollup = perValue.agg(
        count(lit(1)).as("n_distinct"),
        coalesce(max(col("__n")), lit(0L)).as("max_mult"),
        coalesce(sum(col("__n") - 1L), lit(0L)).as("n_extra"))
      nulls.crossJoin(rollup)
        .select(
          lit(table).as("table_name"), lit(key).as("key_name"),
          col("n_rows"), col("n_null"), col("n_distinct"), col("max_mult"),
          expr("CASE WHEN n_rows - n_null > 0 THEN (n_extra * 1000000L) div (n_rows - n_null) ELSE 0L END")
            .as("dup_ppm"))
    }
    audits.reduce(_.union(_))
  }

  /** Join-fanout explosion detector: for an equi-join of `left` and
    * `right` on `lKey = rKey`, the per-key output cardinality is
    * n_left(k) · n_right(k). Returns the `topK` keys by that product
    * (ties on the key) — the keys that would dominate the join's
    * output and, when both sides are multi-valued, the reducers that
    * would blow up. Per-side pre-aggregation means the detector
    * shuffles counts, never rows; the count-join is on the already-
    * aggregated key frames.
    */
  def joinFanout(left: DataFrame, lKey: String, right: DataFrame,
      rKey: String, topK: Int): DataFrame = {
    val l = left.select(col(lKey).as("key")).filter(col("key").isNotNull)
      .groupBy(col("key")).agg(count(lit(1)).as("n_left"))
    val r = right.select(col(rKey).as("key")).filter(col("key").isNotNull)
      .groupBy(col("key")).agg(count(lit(1)).as("n_right"))
    l.join(r, "key")
      .withColumn("fanout", col("n_left") * col("n_right"))
      .orderBy(col("fanout").desc, col("key"))
      .limit(topK)
  }
}
