package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train/eval decontamination: find corpus documents that share long
  * word n-grams with an evaluation set — the containment check run
  * before training so benchmark text leaking into the corpus can't
  * inflate eval scores. Distinct from near-dup dedup: the match is
  * CROSS-dataset, asymmetric (the corpus is huge, the eval set small),
  * and a single shared rare n-gram is already signal.
  *
  * Shape: explode each side's distinct n-grams, drop grams whose
  * corpus document frequency exceeds `maxDf` (ubiquitous boilerplate —
  * not contamination signal, and exactly the hot keys that would make
  * the gram join quadratic), then one equi-join on the gram and two
  * hash aggregations. Every shuffle key is a gram (uniform); the df cap
  * bounds per-key fan-out at `maxDf × eval-side df`. At production
  * scale the gram join key would be dictionary-hashed
  * ([[graft.plans.NgramHash]] does this for char grams); the string key
  * keeps the operator byte-exact against the cross-engine oracle.
  */
object Decontaminate {

  /** Per-(corpus doc, eval doc) contamination pairs:
    * (corpus_id, eval_id, shared) where `shared` is the number of
    * distinct rare `shingleK`-grams the two share, ≥ `minShared`.
    */
  def contaminationPairs(
      corpus: DataFrame,
      evalSet: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 8,
      minShared: Int = 1,
      maxDf: Int = 50): DataFrame = {
    require(shingleK >= 1 && minShared >= 1 && maxDf >= 1, "parameters must be positive")
    // NULL text produces no grams on either engine (DuckDB's comprehension
    // over a NULL token list is NULL); Spark's shingle pipeline would emit
    // a degenerate '' gram instead — filter it out so a NULL doc can never
    // be flagged
    // Spread the tokenize+explode work first: a small source file
    // arrives as ONE input partition, which serializes the (CPU-heavy)
    // shingle pipeline onto a single core ahead of the gram exchange —
    // measured as a 3.5 s single-task stage owning most of q58's wall.
    // The round-robin exchange moves raw doc rows (cheap); at cluster
    // scale the input already has many splits and this is a near-no-op
    // rebalance (the neardupPairs `spread` pattern).
    def grams(df: DataFrame, as: String): DataFrame = df
      .filter(col(textCol).isNotNull)
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as(as),
        explode(Dedup.shingles(col(textCol), shingleK)).as("gram"))
    val corpusGrams = grams(corpus, "corpus_id")
    val evalGrams = grams(evalSet, "eval_id")
    // document frequency over the CORPUS side (the big one) gates the
    // join — the oracle applies the identical cap, so the drop is part
    // of the operator's semantics, not silent recall loss. The df count
    // rides a window OVER THE SAME gram exchange the join needs (the
    // lshCandidatePairs bucket-size pattern): ONE corpus tokenize+
    // explode+shuffle total, no second aggregation pass and no rescan.
    // The eval side needs no filter of its own — it can only match
    // corpus grams that survived the cap.
    val dfWin = org.apache.spark.sql.expressions.Window.partitionBy(col("gram"))
    corpusGrams
      .withColumn("__df", count(lit(1)).over(dfWin))
      .filter(col("__df") <= maxDf)
      .drop("__df")
      .join(evalGrams, "gram")
      .groupBy(col("corpus_id"), col("eval_id"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /** Per-corpus-document contamination report: how many eval docs each
    * flagged corpus doc collides with, and the largest/total shared-gram
    * counts. One extra row-bounded aggregation over
    * [[contaminationPairs]].
    */
  def contaminationReport(
      corpus: DataFrame,
      evalSet: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 8,
      minShared: Int = 1,
      maxDf: Int = 50): DataFrame =
    contaminationPairs(corpus, evalSet, idCol, textCol, shingleK, minShared, maxDf)
      .groupBy(col("corpus_id"))
      .agg(
        count(lit(1)).as("n_eval_docs"),
        max(col("shared")).as("max_shared"),
        sum(col("shared")).as("total_shared"))
}
