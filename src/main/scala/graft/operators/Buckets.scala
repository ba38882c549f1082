package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Range bucketing — the reference dashboards' `range` aggregation
  * (SURVEY §2.2 B9/B10: skewness buckets [0,0.1) [0.1,0.5) [0.5,0.8)
  * [0.8,1], data-skew.ndjson lines 8-9).
  *
  * A `when`-chain is codegen'd into a flat conditional — no UDF, no
  * Bucketizer ML dependency — and composes with any downstream groupBy.
  */
object Buckets {

  /** Label `c` by half-open ranges [lo, hi); the last bucket is closed
    * [lo, hi] to match OpenSearch's range-agg final bucket. Values outside
    * every bucket get label "other".
    */
  def label(c: Column, bounds: Seq[(Double, Double)], labels: Seq[String]): Column = {
    require(bounds.length == labels.length, "bounds/labels length mismatch")
    val branches = bounds.zip(labels).zipWithIndex.map { case (((lo, hi), lbl), i) =>
      val cond =
        if (i == bounds.length - 1) c >= lo && c <= hi
        else c >= lo && c < hi
      (cond, lbl)
    }
    branches.foldLeft[Option[Column]](None) {
      case (None, (cond, lbl)) => Some(when(cond, lbl))
      case (Some(acc), (cond, lbl)) => Some(acc.when(cond, lbl))
    }.get.otherwise("other")
  }

  /** The dashboards' skewness buckets (data-skew.ndjson lines 8-9). */
  def skewBuckets(c: Column): Column =
    label(
      c,
      Seq((0.0, 0.1), (0.1, 0.5), (0.5, 0.8), (0.8, 1.0)),
      Seq("0.0-0.1", "0.1-0.5", "0.5-0.8", "0.8-1.0"))
}
