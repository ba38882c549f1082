package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-column quality gate: the audit a pipeline runs before
  * trusting a vector column for ANN/dedup — wrong dimensionality,
  * non-finite components, and degenerate (near-zero-norm) vectors all
  * silently poison cosine math downstream.
  *
  * Norms are integerized per component (double-promote → ×1000 →
  * floor → int64) so the squared-norm is an EXACT integer and the
  * whole audit is hash-reproducible; float32→double promotion is
  * exact, and the fixed op sequence matches the oracle's. Everything
  * is row-local expression work folded into ONE hash-agg per group —
  * scan speed at any scale, no shuffle beyond the group agg.
  */
object EmbeddingAudit {

  /** Per group: n_vecs, n_bad_dim (length ≠ expectedDim), n_nonfinite
    * (any NaN/±Inf component), n_near_zero (finite, right-dim vectors
    * with integerized squared norm < minSqNorm), min/max squared norm
    * over clean vectors (null if none).
    */
  def audit(df: DataFrame, groupCol: String, vecCol: String,
      expectedDim: Int, minSqNorm: Long): DataFrame = {
    val v = col(vecCol)
    val badDim: Column = size(v) =!= expectedDim
    val nonFinite: Column = exists(v, x =>
      isnan(x) || x === lit(Float.PositiveInfinity) ||
        x === lit(Float.NegativeInfinity))
    // exact: float→double is value-preserving; ×1000/floor fixed shape
    val sqNorm: Column = aggregate(v, lit(0L),
      (acc, x) => {
        val q = floor(x.cast("double") * 1000d).cast("long")
        acc + q * q
      })
    val clean = !badDim && !nonFinite
    df.select(col(groupCol), badDim.as("__bad"), nonFinite.as("__nf"),
        when(clean, sqNorm).as("__sq"))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_vecs"),
        sum(when(col("__bad"), 1L).otherwise(0L)).as("n_bad_dim"),
        sum(when(col("__nf"), 1L).otherwise(0L)).as("n_nonfinite"),
        sum(when(col("__sq") < minSqNorm, 1L).otherwise(0L)).as("n_near_zero"),
        min(col("__sq")).as("min_sq_norm"),
        max(col("__sq")).as("max_sq_norm"))
  }
}
