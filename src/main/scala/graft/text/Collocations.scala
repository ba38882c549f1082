package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PMI collocation mining: rank adjacent word pairs by pointwise
  * mutual information — the phrase-mining step that decides which
  * bigrams ("new york", "machine learning") deserve single tokens in
  * a tokenizer vocabulary, and a standard corpus-analysis probe.
  *
  * PMI = log( p(ab) / (p(a)·p(b)) ) with p(ab) = c(ab)/N_b over
  * adjacent pairs and p(w) = c(w)/N_u over all tokens. log is
  * monotone, so ranking needs only the LIFT ratio — kept exact as
  * integer parts-per-million:
  *
  *   lift_ppm = floor( c(ab) · N_u² · 10⁶ / (N_b · c(a) · c(b)) )
  *
  * computed in DECIMAL(38,0) (DuckDB: HUGEINT), whose 38 digits hold
  * the worst case c(ab)=N_b=N_u=10¹⁰ with room to spare — no double
  * rounding, no cross-engine log() drift.
  *
  * Scale shape: tokenize + explode are map-side; two hash-aggs
  * (unigrams, bigrams) on uniform word keys; unigram counts join back
  * onto bigrams twice — vocab-sized sides Catalyst broadcasts on its
  * own; totals ride a broadcast 1-row cross join; top-k is
  * TakeOrderedAndProject, never a global sort.
  */
object Collocations {

  /** Top-`k` bigrams with `c(ab) >= minCount`, ordered by
    * (lift_ppm DESC, w1, w2). Output: w1, w2, c_ab, c_a, c_b,
    * lift_ppm. Tokenization is the corpus convention: whitespace
    * split of trimmed text.
    */
  def pmiBigrams(docs: DataFrame, textCol: String, minCount: Long,
      k: Int): DataFrame = {
    val toks = docs.select(split(trim(col(textCol)), "\\s+").as("tk"))
    val uni = toks.select(explode(col("tk")).as("w"))
    val uc = uni.groupBy(col("w")).agg(count(lit(1)).as("c"))
    val bi = toks.filter(size(col("tk")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(tk) - 2), i -> struct(tk[i] AS w1, tk[i + 1] AS w2))"))
        .as("b"))
      .select(col("b.w1"), col("b.w2"))
    val bc = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_ab"))
    val totals = uc.agg(sum(col("c")).as("nu"))
      .crossJoin(bc.agg(sum(col("c_ab")).as("nb")))
    bc.filter(col("c_ab") >= minCount)
      .join(uc.select(col("w").as("w1"), col("c").as("c_a")), "w1")
      .join(uc.select(col("w").as("w2"), col("c").as("c_b")), "w2")
      .crossJoin(broadcast(totals))
      .withColumn("lift_ppm", expr(
        "CAST(c_ab AS DECIMAL(38,0)) * nu * nu * 1000000 div " +
          "(CAST(nb AS DECIMAL(38,0)) * c_a * c_b)"))
      .select(col("w1"), col("w2"), col("c_ab"), col("c_a"), col("c_b"),
        col("lift_ppm"))
      .orderBy(col("lift_ppm").desc, col("w1"), col("w2"))
      .limit(k)
  }
}
