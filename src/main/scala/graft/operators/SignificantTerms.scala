package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Significant-terms aggregation: which terms are over-represented in a
  * foreground slice relative to the whole corpus — the "what is unusual
  * about the rows matching this filter" panel (cf. OpenSearch/ES
  * `significant_terms`, the drill-down agg the reference's dashboards
  * lean on for root-causing a metric spike; reference dashboard export:
  * deployment/infra/resources/lambda/opensearch-bootstrap/resources/
  * dashboards/data-skew.ndjson).
  *
  * Scoring is the JLH heuristic — (fg% − bg%) × (fg% / bg%) — rebuilt
  * in exact integer ppm so both engines agree bit-for-bit:
  *
  *   fg_ppm   = fg_n · 1e6 div fg_total
  *   bg_ppm   = bg_n · 1e6 div bg_total
  *   score    = sign(fg_ppm − bg_ppm) × (|fg_ppm − bg_ppm| · fg_ppm
  *              div bg_ppm)
  *
  * The division is sign-explicit (the q126 convention) because engines
  * disagree on negative integer division. Int64 envelope: both ppm
  * factors are ≤ 1e6, so the product is ≤ 1e12 — no overflow guard
  * needed. Background = the WHOLE frame (foreground included), the ES
  * default when no background filter is set; only terms present in the
  * foreground are returned, matching ES.
  *
  * Scale shape: ONE map-side-combinable hash aggregation over the full
  * frame (the foreground flag is a row-local predicate — fg and bg are
  * never scanned separately), a broadcast of the 1-row totals, and a
  * TakeOrdered for the top-k. No shuffle beyond the term agg.
  */
object SignificantTerms {

  /** Top-`topK` terms of `termCol` by JLH significance of the rows
    * where `fgCol` is true. Output: term, fg_n, bg_n, fg_ppm, bg_ppm,
    * score_ppm — ordered score desc, term asc. NULL terms are ignored
    * (ES drops unmapped terms).
    */
  def jlh(df: DataFrame, termCol: Column, fgCol: Column,
      topK: Int): DataFrame = {
    // persisted: the totals aggregate below references this frame a
    // second time, and an unpersisted agg re-runs its whole scan per
    // reference (the Triangles lesson). |terms|-bounded, tiny.
    val perTerm = df
      .filter(termCol.isNotNull)
      .groupBy(termCol.as("term"))
      .agg(
        sum(when(fgCol, 1L).otherwise(0L)).as("fg_n"),
        count(lit(1)).as("bg_n"))
      .persist()
    val totals = perTerm.agg(
      sum(col("fg_n")).as("__fg_tot"), sum(col("bg_n")).as("__bg_tot"))
    perTerm
      .filter(col("fg_n") > 0L)
      .crossJoin(broadcast(totals))
      .withColumn("fg_ppm", expr("fg_n * 1000000 div __fg_tot"))
      .withColumn("bg_ppm", expr("bg_n * 1000000 div __bg_tot"))
      .filter(col("bg_ppm") > 0L)
      .withColumn("score_ppm",
        when(col("fg_ppm") >= col("bg_ppm"), lit(1L)).otherwise(lit(-1L)) *
          expr("abs(fg_ppm - bg_ppm) * fg_ppm div bg_ppm"))
      .drop("__fg_tot", "__bg_tot")
      .orderBy(col("score_ppm").desc, col("term").asc)
      .limit(topK)
  }
}
