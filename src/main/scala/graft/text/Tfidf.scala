package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TF-IDF ranked document search for a FIXED set of query terms — the
  * "find the docs most about X" retrieval staple.
  *
  * Scale shape: document frequencies are needed only for the query's
  * handful of terms, so the corpus is NEVER exploded token-wise (an
  * explode + groupBy(token) would shuffle every token of a 100 TB
  * corpus to rank 20 documents). Instead:
  *   1. one single-row aggregate computes N and df(term) via row-local
  *      `array_contains` sums (map-side partials, one tiny shuffle),
  *   2. that row is broadcast back (1-row nested-loop join, free),
  *   3. tf(term, doc) is a row-local array filter, the score a fixed
  *      left-to-right `+` chain (deterministic FP order — mirror the
  *      same chain in any SQL oracle),
  *   4. top-k is `orderBy().limit()` ⇒ TakeOrderedAndProject, never a
  *      global sort.
  */
object Tfidf {

  private def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** Smoothed idf: ln((N+1)/(df+1)) + 1 — strictly positive, so a term
    * present in every document still contributes its tf.
    */
  private def idf(n: Column, df: Column): Column =
    log((n.cast("double") + 1.0) / (df.cast("double") + 1.0)) + 1.0

  /** Top-k docs by summed tf·idf over `terms`; zero-score docs drop.
    * Output: (idCol, score) — score rounded to 6 for cross-engine
    * comparability.
    */
  def searchTopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      k: Int): DataFrame = {
    require(terms.nonEmpty && terms.distinct.size == terms.size,
      "query terms must be non-empty and distinct")
    val tk = tokens(col(textCol))
    val dfCols = count(lit(1)).cast("long").as("n_docs") +:
      terms.zipWithIndex.map { case (t, i) =>
        sum(array_contains(tk, t).cast("long")).as(s"df_$i")
      }
    val stats = docs.agg(dfCols.head, dfCols.tail: _*)
    val scored = docs.crossJoin(broadcast(stats))
    val score = terms.zipWithIndex.map { case (t, i) =>
      size(filter(tk, x => x === lit(t))).cast("double") *
        idf(col("n_docs"), col(s"df_$i"))
    }.reduceLeft(_ + _)
    scored
      .select(col(idCol), round(score, 6).as("score"))
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}
