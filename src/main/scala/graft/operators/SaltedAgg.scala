package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe two-phase aggregation — the explicit form of the salting
  * pattern for hot group keys (the 100 TB answer when one key holds a
  * disproportionate share of rows and AQE skew handling doesn't apply,
  * e.g. a single hot appId receiving most task metrics).
  *
  * Phase 1 groups by (keys, salt) so the hot key's rows spread over
  * `buckets` reducers; phase 2 merges the per-salt partials. Only valid
  * for ALGEBRAIC aggregates (sum/count/min/max — anything with an
  * associative merge). The salt is derived from a value column hash, so
  * results are deterministic (no rand()) and the phase-1 distribution is
  * uniform.
  */
object SaltedAgg {

  final case class Agg(
      partial: Column => Column,
      merge: Column => Column,
      outName: String)

  def sum_(c: String): Agg = Agg(sum(_), sum(_), s"sum_$c")
  def count_(): Agg = Agg(_ => count(lit(1)), sum(_), "n")
  def min_(c: String): Agg = Agg(min(_), min(_), s"min_$c")
  def max_(c: String): Agg = Agg(max(_), max(_), s"max_$c")

  /** Aggregate `aggs` of `valueCol` grouped by `keys`, salted over
    * `buckets`. Result columns: keys ++ aggs.map(_.outName).
    *
    * The salt comes from ROW IDENTITY (partition id + per-partition
    * position), not from data values — a hot key whose rows all carry
    * the same value (the canonical skew case) still spreads over all
    * buckets. Salt assignment is not stable across retries, which is
    * fine: algebraic aggregates give the same final result under ANY
    * row-to-bucket assignment.
    */
  def apply(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      buckets: Int,
      aggs: Seq[Agg]): DataFrame = {
    require(buckets > 0 && aggs.nonEmpty)
    val salted = df.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(buckets)))
    val phase1 = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(
        aggs.head.partial(col(valueCol)).as(s"__p0"),
        aggs.tail.zipWithIndex.map { case (a, i) =>
          a.partial(col(valueCol)).as(s"__p${i + 1}")
        }: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(
        aggs.head.merge(col("__p0")).as(aggs.head.outName),
        aggs.tail.zipWithIndex.map { case (a, i) =>
          a.merge(col(s"__p${i + 1}")).as(a.outName)
        }: _*)
  }
}
