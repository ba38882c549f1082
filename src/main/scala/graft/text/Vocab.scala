package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.GlobalRank

/** Tokenizer-vocabulary construction + out-of-vocabulary audit: pick
  * the top-V tokens by corpus frequency, assign contiguous stable ids
  * 1..V, and score every document's OOV rate against that vocab — the
  * two bookends of training a tokenizer (build the table, then measure
  * what the corpus loses through it).
  *
  * Id assignment uses [[GlobalRank]] over (count DESC, token) — a
  * distributed total-order row_number, so a 10⁹-type vocabulary never
  * funnels through one partition the way a bare
  * `row_number() OVER (ORDER BY …)` would. Coverage is one explode +
  * one join against the vocab (V rows — Catalyst broadcasts it) + one
  * doc-keyed hash-agg.
  */
object Vocab {

  /** (token, token_id, c): the `vocabSize` most frequent tokens,
    * ids 1..V dense in (count DESC, token ASC) order.
    */
  def build(docs: DataFrame, textCol: String, vocabSize: Int): DataFrame = {
    val counts = docs
      .select(explode(split(trim(col(textCol)), "\\s+")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("c"))
    GlobalRank.rowNumber(counts.withColumn("__negc", -col("c")),
        Seq("__negc", "token"), "token_id")
      .filter(col("token_id") <= vocabSize)
      .select(col("token"), col("token_id"), col("c"))
  }

  /** Per-doc OOV audit against `vocab` (a [[build]] result):
    * (idCol, n_tokens, n_oov, oov_ppm, id_sum) where id_sum is the sum
    * of matched token ids — pins id ASSIGNMENT, not just membership.
    */
  def coverage(docs: DataFrame, vocab: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(split(trim(col(textCol)), "\\s+")).as("token"))
    toks.join(vocab.select(col("token"), col("token_id")), Seq("token"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("token_id").isNull, 1L).otherwise(0L)).as("n_oov"),
        coalesce(sum(col("token_id")), lit(0L)).as("id_sum"))
      .withColumn("oov_ppm", expr("n_oov * 1000000 div n_tokens"))
      .select(col(idCol), col("n_tokens"), col("n_oov"), col("oov_ppm"),
        col("id_sum"))
  }
}
