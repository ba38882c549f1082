package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (RRF) — the standard way to combine a
  * lexical ranking (TF-IDF/BM25) with a vector ranking (ANN cosine)
  * into one hybrid result list: score(d) = Σ_sources 1/(k0 + rank_s(d)),
  * robust to incomparable source scores because only RANKS enter.
  *
  * Determinism note: the fusion sum is a FIXED left-to-right chain of
  * two-operand adds over the source list (a join-fold), never a
  * groupBy-sum — float addition isn't associative, and a partial-agg
  * order that floats with partitioning would make the score
  * unreplayable. Inputs are top-k lists (bounded frames), so the
  * full-outer join fold is dashboard-sized by construction.
  */
object RankFusion {

  /** (idCol, rrf, n_sources), top `topK` by fused score. Each ranking
    * frame carries (idCol, rankCol) with 1-based ranks.
    */
  def rrf(
      rankings: Seq[DataFrame],
      idCol: String,
      rankCol: String,
      k0: Int = 60,
      topK: Int = 20): DataFrame = {
    require(rankings.size >= 2, "fusion needs at least two rankings")
    require(k0 >= 1 && topK >= 1, "k0 and topK must be >= 1")
    val terms = rankings.zipWithIndex.map { case (r, i) =>
      r.select(col(idCol),
        (lit(1.0) / (lit(k0.toDouble) + col(rankCol).cast("double"))).as(s"__t$i"))
    }
    val joined = terms.reduce((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val score = rankings.indices
      .map(i => coalesce(col(s"__t$i"), lit(0.0))).reduceLeft(_ + _)
    val nSources = rankings.indices
      .map(i => col(s"__t$i").isNotNull.cast("long")).reduceLeft(_ + _)
    joined
      .select(col(idCol), round(score, 6).as("rrf"), nSources.as("n_sources"))
      .orderBy(col("rrf").desc, col(idCol))
      .limit(topK)
  }
}
