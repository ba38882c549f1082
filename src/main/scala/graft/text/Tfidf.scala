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

  /** BM25 ranked search (Robertson/Spärck Jones; the Lucene-default
    * scoring) — same zero-explode shape as [[searchTopK]], but with
    * the saturating tf component and document-length normalization
    * that make BM25 the practical standard:
    *
    *   idf_t = ln(1 + (N − df + 0.5)/(df + 0.5))   (always positive)
    *   score = Σ_t idf_t · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    *
    * One extra statistic rides the same single-row aggregate (Σ dl for
    * avgdl). Every double step has a FIXED shape, mirrored verbatim in
    * the SQL oracle; terms add left-to-right.
    */
  def bm25TopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && terms.distinct.size == terms.size,
      "query terms must be non-empty and distinct")
    val tk = tokens(col(textCol))
    val aggCols = Seq(count(lit(1)).cast("long").as("n_docs"),
      sum(size(tk).cast("long")).as("sum_dl")) ++
      terms.zipWithIndex.map { case (t, i) =>
        sum(array_contains(tk, t).cast("long")).as(s"df_$i")
      }
    val stats = docs.agg(aggCols.head, aggCols.tail: _*)
    val scored = docs.crossJoin(broadcast(stats))
    val dl = size(tk).cast("double")
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val score = terms.zipWithIndex.map { case (t, i) =>
      val tf = size(filter(tk, x => x === lit(t))).cast("double")
      val idf = log(lit(1.0) +
        (col("n_docs").cast("double") - col(s"df_$i").cast("double") + 0.5) /
          (col(s"df_$i").cast("double") + 0.5))
      idf * (tf * (k1 + 1.0)) / (tf + lit(k1) * (lit(1.0) - b + lit(b) * dl / avgdl))
    }.reduceLeft(_ + _)
    scored
      .select(col(idCol), round(score, 6).as("score"))
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}
