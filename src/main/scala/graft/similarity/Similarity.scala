package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (Array[Float]).
  *
  * Two tiers:
  *  - brute-force cosine top-k: the exact baseline. Row-local dot
  *    products (zip_with + aggregate fold, codegen'd, no UDF) against a
  *    broadcast query vector, then TakeOrderedAndProject — at 100 TB this
  *    is one scan, zero shuffles, and a k-row driver merge.
  *  - LSH (random hyperplane / signed-random-projection) bucketing: each
  *    vector gets a b-bit signature; candidates share the signature
  *    bucket. Probing only the query's bucket turns full scans into
  *    bucket scans (~n/2^b rows). Hyperplanes are seeded-deterministic.
  */
object Similarity {

  def toDoubleVec(v: Column): Column = transform(v, _.cast("double"))

  /** Dot product of two double arrays — a native codegen'd expression
    * (graft.plans.ArrayDotProduct) computing the strict sequential left
    * fold, bit-identical to the oracle's list_dot_product and to
    * [[dotHof]], but running as a primitive loop inside whole-stage
    * codegen instead of interpreted lambda evaluation.
    */
  def dot(a: Column, b: Column): Column = graft.plans.GraftFunctions.dot(a, b)

  /** Reference higher-order-function form (interpreted); kept as the
    * cross-check twin for the native expression's spec.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k by cosine against one query vector (given as a 1-row
    * DataFrame with column `qvec`). The query side is crossJoin-broadcast:
    * no shuffle of the big side; orderBy+limit plans TakeOrdered.
    */
  def bruteForceTopK(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      query: DataFrame,
      k: Int): DataFrame = {
    val withCos = embeddings.crossJoin(broadcast(query))
      .withColumn("cos", cosine(toDoubleVec(col(vecCol)), toDoubleVec(col("qvec"))))
    withCos
      .select(col(idCol), round(col("cos"), 6).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic pseudo-random hyperplanes: `bits` planes × `dim`
    * weights in [-1, 1], derived from a seeded xorshift-style integer mix
    * (no RNG state, reproducible across runs/partitions).
    */
  def hyperplanes(bits: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] =
    Array.tabulate(bits, dim) { (b, d) =>
      var x = seed + b.toLong * 1000003L + d.toLong * 7919L
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      (math.floorMod(x, 2000001L) - 1000000L).toDouble / 1000000.0
    }

  /** Signed-random-projection signature: bit b set iff dot(v, plane_b)>0.
    * Row-local; the planes ship as a literal (they're tiny).
    */
  def srpSignature(vec: Column, planes: Array[Array[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val planeLit = typedlit(p.toSeq)
      when(dot(vec, planeLit) > 0, call_function("shiftleft", lit(1L), lit(i)))
        .otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Infer the (constant) embedding dimension from the data: one-row
    * scan, driver-side. Pass the known dim explicitly at scale to avoid
    * the extra job.
    */
  def dimOf(embeddings: DataFrame, vecCol: String): Int =
    embeddings.select(size(col(vecCol))).head().getInt(0)

  /** ANN top-k: restrict the scan to vectors whose SRP signature is
    * within `maxHamming` bits of the query's, then exact cosine + top-k
    * within the candidate set. Recall/cost trades on (bits, maxHamming).
    * `dim` must match the embedding width (≤ 0 → inferred via `dimOf`);
    * a mismatched plane width would zip_with-pad with nulls and
    * silently break the signature.
    */
  def lshTopK(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      query: DataFrame,
      k: Int,
      bits: Int = 12,
      maxHamming: Int = 3,
      dim: Int = -1): DataFrame = {
    val d = if (dim > 0) dim else dimOf(embeddings, vecCol)
    val planes = hyperplanes(bits, d)
    val sigged = embeddings
      .withColumn("__v", toDoubleVec(col(vecCol)))
      .withColumn("__sig", srpSignature(col("__v"), planes))
    val q = query
      .withColumn("__qv", toDoubleVec(col("qvec")))
      .withColumn("__qsig", srpSignature(col("__qv"), planes))
      .select(col("__qv"), col("__qsig"))
    sigged.crossJoin(broadcast(q))
      .filter(call_function("bit_count", col("__sig").bitwiseXOR(col("__qsig"))) <= maxHamming)
      .withColumn("cos", cosine(col("__v"), col("__qv")))
      .select(col(idCol), round(col("cos"), 6).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Driver-side SRP signature of one vector (same planes/semantics as
    * [[srpSignature]]) — used to target index partitions before any
    * Spark job runs.
    */
  def srpSignatureLocal(vec: Array[Double], planes: Array[Array[Double]]): Long =
    planes.zipWithIndex.foldLeft(0L) { case (acc, (p, i)) =>
      var d = 0.0
      var j = 0
      while (j < p.length && j < vec.length) { d += vec(j) * p(j); j += 1 }
      if (d > 0) acc | (1L << i) else acc
    }

  /** All signatures within `maxHamming` bit flips of `sig` (the probe
    * set). |ball| = Σ C(bits, r) for r ≤ maxHamming — e.g. 79 buckets
    * for bits=12, maxHamming=2.
    */
  def hammingBall(sig: Long, bits: Int, maxHamming: Int): Seq[Long] =
    (0 to maxHamming).flatMap {
      case 0 => Seq(sig)
      case r => (0 until bits).combinations(r).map(
        _.foldLeft(sig)((s, b) => s ^ (1L << b))).toSeq
    }

  /** Batched k-NN join: exact top-k neighbors for EVERY query vector in
    * `queries` (qid, qvec). The query side broadcasts (it's the small
    * side by construction); ranking is one window shuffle on qid. At
    * larger query cardinality, swap the crossJoin for per-query probes
    * of the partitioned LSH index ([[queryLshIndex]]).
    */
  def knnJoin(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      queries: DataFrame,
      k: Int): DataFrame = {
    // rank on the ROUNDED cosine so rank order is engine-portable
    // (unrounded ranking could disagree with an oracle that rounds)
    val withCos = embeddings.crossJoin(broadcast(queries))
      .withColumn("cos", round(cosine(toDoubleVec(col(vecCol)), toDoubleVec(col("qvec"))), 6))
    graft.operators.TopK.perGroup(
        withCos, Seq(col("qid")), Seq(col("cos").desc, col(idCol)), k)
      .select(col("qid"), col(idCol), col("cos"), col("rk").cast("long").as("rk"))
  }

  /** Embedding near-duplicate pairs: SRP signatures + Manku-style banded
    * candidate search (bands = maxHamming+1 ⇒ pigeonhole recall over the
    * Hamming ball) + exact cosine verification. The band-key exchange
    * is the only shuffle, but candidate volume is NOT free: unrelated
    * pairs collide in a band with probability ≈ 2^(−bits/bands), so
    * expected candidates ≈ bands · 2^(−bits/bands) · C(N,2) — still
    * quadratic in N with a tunable constant. The sf1 scale sweep
    * measured the old (16, 7) defaults at selectivity ~1 (2-bit bands:
    * every 4th pair a candidate — ×197 on a 10× scale-up); the (64, 6)
    * defaults put selectivity at ~1.3% (7 bands × 9-10 bits). Pick
    * (bits, maxHamming) so the TARGET similarity's hamming distribution
    * sits safely inside the ball (E[h] = bits·θ/π): 64/6 covers true
    * near-duplicates (cos ≳ 0.99 ⇒ E[h] ≈ 1); pairs only marginally
    * above a loose verification threshold may fall outside the ball.
    * For similarity SEARCH at scale (loose thresholds, huge N), this
    * scan form is the wrong tool — use the partitioned-index path
    * ([[writeLshIndex]]/[[indexedLshTopK]]), which prunes at file
    * listing instead of generating candidates.
    *
    * The banding and the threshold are VALIDATED against each other at
    * plan time — an EXPECTATION check, not a guarantee: the require
    * enforces E[hamming] = bits·acos(cos)/π ≤ maxHamming, and a pair
    * sitting exactly at the covered similarity has each plane flip
    * independently (Bernoulli θ/π), so roughly half its mass falls
    * OUTSIDE the ball — recall at the boundary is probabilistic
    * (σ = √(bits·p·(1−p)) ≈ 2-4 planes at these sizes; a pair a few σ
    * above the boundary is near-certainly recalled, one AT it is ~50%).
    * The check exists to catch bandings whose ball stops short of the
    * threshold ENTIRELY — the failure mode the old loose (16, 7)
    * defaults hid by covering everything; per-dataset recall remains
    * empirical (the repo convention: brute-force oracle at every SF).
    * Callers whose qualifying pairs sit far above the verification
    * threshold (near-duplicate detection verified at a loose floor)
    * state that with `recallCosine`: the ball must cover ITS
    * expectation, and the threshold stays a correctness filter below it.
    */
  def cosineNearDupPairs(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      bits: Int = 64,
      maxHamming: Int = 6,
      dim: Int = -1,
      recallCosine: Double = Double.NaN): DataFrame = {
    val target = if (recallCosine.isNaN) threshold else recallCosine
    require(target >= threshold,
      f"recallCosine ($target%.4f) below threshold ($threshold%.4f) is " +
        "meaningless — pairs under the threshold are filtered out anyway")
    val expectedH =
      bits * math.acos(math.max(-1.0, math.min(1.0, target))) / math.Pi
    require(expectedH <= maxHamming,
      f"banding (bits=$bits%d, maxHamming=$maxHamming%d) does not cover " +
        f"cosine $target%.4f even in expectation: E[hamming] = " +
        f"bits*acos(cos)/pi = $expectedH%.1f > maxHamming — typical pairs " +
        "at that similarity fall outside the Hamming ball and are " +
        "silently dropped (recall at the covered boundary itself stays " +
        "probabilistic, ~50% for a pair exactly AT it). Widen the ball " +
        "(more bands), shrink bits, or — if qualifying pairs are really " +
        "near-duplicates well above the verification threshold — pass " +
        "recallCosine with the similarity whose E[hamming] the ball must cover")
    val d = if (dim > 0) dim else dimOf(embeddings, vecCol)
    val planes = hyperplanes(bits, d)
    // localCheckpoint, not persist: the verify joins below exchange this
    // table twice with canonically-equal subtrees, and AQE only reuses
    // exchanges over checkpointed (LogicalRDD) sources (the Triangles
    // probe) — a persisted source defeats the dedup
    val sigged = embeddings
      .repartition(embeddings.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("id"), toDoubleVec(col(vecCol)).as("__v"))
      .withColumn("__sig", srpSignature(col("__v"), planes))
      .localCheckpoint(true)
    // intactBands auto-derived from the corpus size (the volume-side
    // twin of the recall require above): the banding choice never
    // changes the OUTPUT — pigeonhole recall holds at every r and the
    // cosine filter below re-verifies exactly — only the candidate cost
    val cands = graft.dedup.Dedup.simhashNearDupPairsAuto(
      sigged, "id", "__sig", maxHamming, bits)
    // alias-only disambiguation (renames deferred): both verify sides
    // join the identical projection so the second signature-table
    // exchange is reused instead of re-run
    val side = sigged.select(col("id").as("__jid"), col("__v"))
    cands
      .join(side.as("va"), cands("id_a") === col("va.__jid"))
      .join(side.as("vb"), cands("id_b") === col("vb.__jid"))
      .filter(cosine(col("va.__v"), col("vb.__v")) >= threshold)
      .select(col("id_a"), col("id_b"),
        round(cosine(col("va.__v"), col("vb.__v")), 6).as("cos"))
  }

  /** THE 100 TB shape: write the embedding table PARTITIONED BY its SRP
    * signature — the signature is the physical cluster key, so an ANN
    * probe prunes partitions at file-listing time instead of scanning
    * and filtering (the non-indexed [[lshTopK]] filter is still a full
    * scan; this one reads only the probed buckets).
    */
  def writeLshIndex(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      bits: Int = 12,
      dim: Int = -1): Unit = {
    val d = if (dim > 0) dim else dimOf(embeddings, vecCol)
    val planes = hyperplanes(bits, d)
    embeddings
      .withColumn("sig_bucket", srpSignature(toDoubleVec(col(vecCol)), planes))
      // co-locate each bucket before the partitioned write: without this
      // every input task writes a file into every bucket dir it touches
      // (tasks × 2^bits small files); with it each bucket is one
      // writer's output — the standard small-files guard for a
      // partitioned index build
      .repartition(col("sig_bucket"))
      .write.mode("overwrite").partitionBy("sig_bucket").parquet(path)
  }

  /** Streaming maintenance of the partitioned LSH index: append a
    * micro-batched embedding stream into the SAME layout
    * [[writeLshIndex]] builds — signatures computed row-locally per
    * batch, rows landing in their `sig_bucket=` partition directories
    * through the checkpointed file sink (exactly-once, restart-safe).
    * [[queryLshIndex]] probes the growing index unchanged: partition
    * pruning works on whatever has been committed, so the index stays
    * queryable WHILE ingesting — embedding tables grow continuously in
    * a production corpus and a full rebuild per delivery is the 100 TB
    * anti-pattern. `dim` is explicit (a stream has no rows to probe for
    * it at plan time). Per batch each bucket is written by the task that
    * owns it after the in-batch repartition — the same small-files
    * guard as the batch build, amortized over deliveries.
    */
  def appendLshIndexStream(
      stream: DataFrame,
      vecCol: String,
      path: String,
      checkpoint: String,
      dim: Int,
      bits: Int = 12): org.apache.spark.sql.streaming.StreamingQuery = {
    val planes = hyperplanes(bits, dim)
    stream
      .withColumn("sig_bucket", srpSignature(toDoubleVec(col(vecCol)), planes))
      .repartition(col("sig_bucket"))
      .writeStream.format("parquet")
      .partitionBy("sig_bucket")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
  }

  /** ANN top-k against a written LSH index: compute the query signature
    * driver-side, enumerate the Hamming probe ball, and read ONLY those
    * partitions (`sig_bucket IN (...)` is a partition filter — check
    * `PartitionFilters` in the scan node). Exact cosine re-ranks the
    * candidates.
    */
  def queryLshIndex(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      idCol: String,
      vecCol: String,
      queryVec: Array[Double],
      k: Int,
      bits: Int = 12,
      maxHamming: Int = 2): DataFrame = {
    val planes = hyperplanes(bits, queryVec.length)
    val qsig = srpSignatureLocal(queryVec, planes)
    val ball = hammingBall(qsig, bits, maxHamming)
    val qlit = typedlit(queryVec.toSeq)
    spark.read.parquet(path)
      .filter(col("sig_bucket").isin(ball: _*))
      .withColumn("cos", cosine(toDoubleVec(col(vecCol)), qlit))
      .select(col(idCol), round(col("cos"), 6).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  // -------------------------------------------------------------------
  // IVF (inverted-file) ANN — the coarse-quantizer alternative to SRP.

  /** Deterministic unit-norm pseudo-centroids (seeded directions — a
    * k-means|| refinement can replace them without changing the index
    * layout or query path).
    */
  def ivfCentroids(n: Int, dim: Int, seed: Long = 7L): Array[Array[Double]] =
    hyperplanes(n, dim, seed).map { c =>
      val norm = math.sqrt(c.map(x => x * x).sum)
      if (norm == 0) c else c.map(_ / norm)
    }

  /** Cell assignment: index (0-based) of the max-dot centroid; ties go
    * to the lowest index (array_position finds the first occurrence).
    */
  def ivfAssign(vec: Column, centroids: Array[Array[Double]]): Column = {
    val dots = array(centroids.map(c => dot(vec, typedlit(c.toSeq))): _*)
    (array_position(dots, array_max(dots)) - 1).cast("int")
  }

  /** Write the embedding table partitioned by IVF cell — same 100 TB
    * story as [[writeLshIndex]]: the coarse quantizer is the physical
    * partition key, probes prune at file listing.
    */
  def writeIvfIndex(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      nCentroids: Int = 16,
      dim: Int = -1): Unit = {
    val d = if (dim > 0) dim else dimOf(embeddings, vecCol)
    val cents = ivfCentroids(nCentroids, d)
    embeddings
      .withColumn("ivf_cell", ivfAssign(toDoubleVec(col(vecCol)), cents))
      .repartition(col("ivf_cell")) // same small-files guard as writeLshIndex
      .write.mode("overwrite").partitionBy("ivf_cell").parquet(path)
  }

  /** Probe the `nProbe` nearest cells (computed driver-side), exact
    * cosine re-rank within them — partition pruning on `ivf_cell`.
    */
  def queryIvfIndex(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      idCol: String,
      vecCol: String,
      queryVec: Array[Double],
      k: Int,
      nCentroids: Int = 16,
      nProbe: Int = 3): DataFrame = {
    val cents = ivfCentroids(nCentroids, queryVec.length)
    val probed = cents.zipWithIndex.map { case (c, i) =>
      i -> c.zip(queryVec).map { case (a, b) => a * b }.sum
    }.sortBy { case (i, d) => (-d, i) }.take(nProbe).map(_._1)
    val qlit = typedlit(queryVec.toSeq)
    spark.read.parquet(path)
      .filter(col("ivf_cell").isin(probed: _*))
      .withColumn("cos", cosine(toDoubleVec(col(vecCol)), qlit))
      .select(col(idCol), round(col("cos"), 6).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }
}
