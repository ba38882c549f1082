package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectation gates with quarantine routing: evaluate a
  * set of named boolean rules per row, route rows that fail ANY rule to
  * a quarantine side-table, and report per-rule violation counts — the
  * Delta-expectations / Deequ-style contract check that fronts every
  * production ingest, expressed as plain Catalyst predicates.
  *
  * Scale shape: rules are row-local codegen'd expressions evaluated in
  * ONE scan; the report is a single algebraic aggregation (conditional
  * sums — no per-rule passes, no explode), and routing is the same
  * two-sink filter split the ingest plane uses (`Transforms.route`). A
  * rule must be a deterministic function of the row — that's what makes
  * quarantined rows re-processable after a rule fix.
  */
object Expectations {

  /** Split into (passing rows, quarantined rows ++ `failed_rules`
    * array naming each violated rule).
    */
  def route(df: DataFrame, rules: Seq[(String, Column)]): (DataFrame, DataFrame) = {
    require(rules.nonEmpty, "need at least one rule")
    // NULL rule results are failures: an expectation that can't be
    // evaluated on a row has not been met by it
    val failed = array_compact(array(rules.map { case (name, pred) =>
      when(!coalesce(pred, lit(false)), lit(name))
    }: _*))
    val tagged = df.withColumn("failed_rules", failed)
    (tagged.filter(size(col("failed_rules")) === 0).drop("failed_rules"),
      tagged.filter(size(col("failed_rules")) > 0))
  }

  /** Per-rule violation counts plus total/ok/quarantined rows, one
    * aggregation pass: rows (rule, n_failed) ++ ("__total"/"__ok"/
    * "__quarantined", counts).
    */
  def report(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val anyFail = rules.map { case (_, p) => !coalesce(p, lit(false)) }
      .reduce(_ || _)
    val aggs = rules.map { case (name, pred) =>
      sum(when(!coalesce(pred, lit(false)), 1L).otherwise(0L)).as(s"f_$name")
    } ++ Seq(
      count(lit(1)).as("f___total"),
      sum(when(anyFail, 0L).otherwise(1L)).as("f___ok"),
      sum(when(anyFail, 1L).otherwise(0L)).as("f___quarantined"))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single wide row into (rule, n_failed) — bounded rows
    val names = rules.map(_._1) ++ Seq("__total", "__ok", "__quarantined")
    wide.select(explode(array(names.map(n =>
      struct(lit(n).as("rule"), col(s"f_$n").as("n_rows"))): _*)).as("r"))
      .select(col("r.rule").as("rule"), col("r.n_rows").as("n_rows"))
  }
}
