package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Record-linkage pair scoring in the Fellegi–Sunter style: candidate
  * pairs from equality blocking, then a weighted agreement score over
  * comparison fields, thresholded into match candidates. The
  * probabilistic weights of a real FS model arrive here as caller-
  * supplied integers (log-odds scaled); agreement is exact equality on
  * caller-DERIVED comparison keys (bucketed balances, name suffixes,
  * phonetic codes, ...), keeping the whole score integer-exact.
  *
  * Scale shape: pair generation is a self equi-join on the blocking
  * key — candidate volume is Σ C(block,2), controlled by blocking-key
  * cardinality, never corpus-quadratic. Audit block sizes with
  * [[KAnonymity.audit]] before running: an oversized block is both a
  * privacy smell and a join hot key (the same guard LSH gets from
  * `maxBucketSize`, and sorted-neighborhood from its fixed window).
  *
  * Blocking-key rule for growth (measured in the sf1 scale sweep): a
  * FIXED-cardinality block key (nation: 25 values) makes candidate
  * volume quadratic in SF — every 10× of corpus is 100× of pairs. Keep
  * block cardinality scaling with the corpus, and harvest free keys
  * from the SCORE ARITHMETIC first: any comparison field whose weight
  * is necessary to reach `minScore` (the others cannot sum there
  * without it) can move into `blockCols` with ZERO effect on the
  * output — q118 folds its balance bucket in exactly this way.
  */
object RecordLinkage {

  /** Score pairs under a UNION of blockings: candidates = pairs
    * agreeing on ALL columns of at least one blocking, deduplicated on
    * (id_a, id_b). This is the result-preserving escape from a
    * fixed-cardinality block key when no SINGLE extra field is
    * score-mandated but a DISJUNCTION is: if `minScore` is unreachable
    * without agreeing on (f1 OR f2 OR ...), then refining the base
    * blocking with EACH fi and unioning loses no qualifying pair —
    * every output pair agrees on some fi, so it surfaces in that fi's
    * blocking with identical agreement bits. Candidate volume drops
    * from Σ C(block,2) to (near) the output itself: a base-block pair
    * disagreeing on every fi is never generated. Measured on q118 at
    * the sf3 scale point (450k customers): candidates 1.90e8 → 4.58e7,
    * warm 103 → 70 s. The residual sf3 cost is the OUTPUT itself — 45M
    * qualifying pairs (replication makes the true match set quadratic),
    * whose dedup exchange and deterministic sort dominate. Regime
    * note: the union adds one output-sized exchange (the pair dedup),
    * so it wins whenever avoided candidates ≫ output — the realistic
    * sparse-match regime; under everything-matches-everything
    * replication both terms are the same quadratic.
    *
    * The duplicate-pair dedup is safe: agreement bits and score are
    * pure functions of the two rows, identical from whichever blocking
    * produced the pair.
    */
  def scorePairsUnionBlocked(df: DataFrame, idCol: String,
      blockings: Seq[Seq[String]], fields: Seq[(String, Long)],
      minScore: Long): DataFrame = {
    require(blockings.nonEmpty, "at least one blocking required")
    blockings.map(b => scorePairs(df, idCol, b, fields, minScore))
      .reduce(_ unionByName _)
      .dropDuplicates("id_a", "id_b")
  }

  /** Score blocked pairs of `df` rows. `fields` are (comparisonCol,
    * weight); score = Σ weight·[equal] over non-null equal fields.
    * Output: id_a, id_b (id_a < id_b), per-field agreement bits
    * (`agree_<col>`), score — pairs at or above `minScore` only.
    */
  def scorePairs(df: DataFrame, idCol: String, blockCols: Seq[String],
      fields: Seq[(String, Long)], minScore: Long): DataFrame = {
    val cols = (Seq(idCol) ++ blockCols ++ fields.map(_._1)).distinct
    val base = df.select(cols.map(col): _*)
    val a = base.select((Seq(col(idCol).as("id_a")) ++
      blockCols.map(col) ++
      fields.map { case (f, _) => col(f).as(s"__a_$f") }): _*)
    val b = base.select((Seq(col(idCol).as("id_b")) ++
      blockCols.map(col) ++
      fields.map { case (f, _) => col(f).as(s"__b_$f") }): _*)
    val agreeBits = fields.map { case (f, _) =>
      when(col(s"__a_$f").isNotNull && col(s"__b_$f").isNotNull &&
        col(s"__a_$f") === col(s"__b_$f"), 1L).otherwise(0L).as(s"agree_$f")
    }
    val score = fields.map { case (f, w) => col(s"agree_$f") * w }
      .reduce(_ + _).as("score")
    a.join(b, blockCols).filter(col("id_a") < col("id_b"))
      .select(Seq(col("id_a"), col("id_b")) ++ agreeBits: _*)
      .select(col("*"), score)
      .filter(col("score") >= minScore)
  }
}
