package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Deduplication operators for training-data pipelines: exact,
  * normalization-fingerprint, MinHash+LSH near-dup, SimHash.
  *
  * Scale design: signatures (minhash arrays, simhash longs) are computed
  * ROW-LOCALLY with higher-order array functions — no shuffle, no UDF —
  * so the only shuffles are (a) the band-bucket exchange, whose keys are
  * uniformly-distributed hashes (no skew), and (b) the final anti-join.
  * Candidate verification touches only bucket-colliding pairs, never the
  * n² cross product. Oversized buckets (degenerate content) are dropped
  * by `maxBucketSize` — the standard LSH skew guard at 100 TB.
  */
object Dedup {

  /** Exact dedup: one row per distinct key, keeping the lowest id.
    * Plain hash-aggregate: one shuffle on the key (map-side partials).
    * For very wide keys (full documents) dedup on md5(key) instead.
    */
  def exact(df: DataFrame, keyCols: Seq[String], idCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Word k-shingles of a text column (distinct, order-preserving input). */
  def shingles(c: Column, k: Int): Column = {
    val toks = split(trim(c), "\\s+")
    array_distinct(
      transform(
        sequence(lit(1), greatest(size(toks) - (k - 1), lit(1))),
        i => concat_ws(" ", slice(toks, i, lit(k)))))
  }

  /** MinHash signature: p pseudo-permutations h_i(s) = xxhash64(i, s);
    * signature[i] = min over shingles. Row-local (functions.transform +
    * array_min over the shingle array), codegen'd, no shuffle.
    */
  def minhashSignature(shinglesCol: Column, p: Int): Column =
    array((0 until p).map { i =>
      array_min(transform(shinglesCol, s => xxhash64(lit(i), s)))
    }: _*)

  /** LSH band keys: split the signature into `bands` bands of `rows`
    * hashes; band key = hash of the band slice (+ band index so buckets
    * from different bands never merge).
    */
  def lshBandKeys(sig: Column, bands: Int, rows: Int): Column =
    array((0 until bands).map { b =>
      xxhash64(lit(b), concat_ws(",", transform(slice(sig, b * rows + 1, rows), _.cast("string"))))
    }: _*)

  /** Candidate near-dup pairs from band-bucket collisions.
    * Input must carry `idCol` and `sigCol` (minhash signature).
    * Returns distinct (id_a, id_b) with id_a < id_b.
    *
    * `maxBucketSize` drops degenerate buckets (boilerplate/empty docs
    * that would explode quadratically) — at scale this is what keeps the
    * self-join bounded.
    */
  def lshCandidatePairs(
      df: DataFrame,
      idCol: String,
      sigCol: String,
      bands: Int,
      rows: Int,
      maxBucketSize: Int = 1000): DataFrame = {
    val keyed = df
      .select(col(idCol).as("id"), lshBandKeys(col(sigCol), bands, rows).as("bk"))
      .select(col("id"), posexplode(col("bk")).as(Seq("band", "bucket")))
    val sized = keyed
      .withColumn("bsz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("band"), col("bucket"))))
      .filter(col("bsz") <= maxBucketSize)
      .drop("bsz")
    val a = sized.select(col("band"), col("bucket"), col("id").as("id_a"))
    val b = sized.select(col("band"), col("bucket"), col("id").as("id_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** Exact Jaccard similarity between two (distinct-element) arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - inter)
  }

  /** Full MinHash near-dup dedup: returns the surviving rows of `df`
    * (a doc is dropped iff it has jaccard ≥ threshold with a
    * LOWER-id doc — deterministic keep-first policy).
    * candidates → exact-jaccard verify → anti-join.
    */
  def minhashDedup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 3,
      p: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.8): DataFrame = {
    require(p % bands == 0, "p must divide into bands evenly")
    val rows = p / bands
    val withSig = df
      .withColumn("__sh", shingles(col(textCol), shingleK))
      .withColumn("__sig", minhashSignature(col("__sh"), p))
    val cands = lshCandidatePairs(withSig, idCol, "__sig", bands, rows)
    val sh = withSig.select(col(idCol).as("__jid"), col("__sh"))
    val verified = cands
      .join(sh.withColumnRenamed("__sh", "sh_a"), cands("id_a") === sh("__jid")).drop("__jid")
      .join(sh.withColumnRenamed("__sh", "sh_b"), cands("id_b") === sh("__jid")).drop("__jid")
      .withColumn("jac", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jac") >= threshold)
    val drops = verified.select(col("id_b").as(idCol)).distinct()
    df.join(drops, Seq(idCol), "left_anti")
  }

  /** 64-bit SimHash over the token set: per-token 64-bit hash votes ±1
    * on each bit; the sign of the vote sum sets the output bit.
    * Entirely row-local higher-order functions (fold over tokens with a
    * 64-slot vote array) — no shuffle, no UDF.
    */
  def simhash(c: Column): Column = {
    val toks = array_distinct(split(trim(c), "\\s+"))
    val votes = aggregate(
      toks,
      array_repeat(lit(0L), 64),
      (acc, t) => {
        val h = xxhash64(t)
        zip_with(
          acc,
          transform(sequence(lit(0), lit(63)),
            i => when(call_function("shiftright", h, i).bitwiseAND(1) === 1, lit(1L))
              .otherwise(lit(-1L))),
          (a, v) => a + v)
      })
    aggregate(
      zip_with(votes, sequence(lit(0), lit(63)),
        (v, i) => when(v > 0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L),
      (acc, x) => acc.bitwiseOR(x))
  }

  /** Hamming distance between two simhash values. */
  def hammingDist(a: Column, b: Column): Column =
    call_function("bit_count", a.bitwiseXOR(b)).cast("long")
}
