package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data partitioning operators: deterministic train/val/test
  * splitting, stratified sampling, and token-budget sharding. The
  * reference has no train-pipeline surface (its demo workload is TPC-DS,
  * emr_serverless_stack.py:174); these are the dataset-preparation steps
  * a corpus this engine's dedup/similarity operators feed would need.
  *
  * Everything is a pure function of row content (md5-derived uniforms,
  * exact prefix sums) — NO rand()/sample(): resampling a grown corpus
  * keeps previous assignments stable, re-runs are reproducible across
  * cluster sizes, and every operator has an exact cross-engine oracle.
  */
object Datasplit {

  /** Deterministic uniform in [0,1): the first 8 md5 hex chars of
    * (value ++ salt) as a 32-bit value / 2^32. Identical in DuckDB:
    * `CAST(concat('0x', substring(md5(v || salt), 1, 8)) AS BIGINT)
    * / 4294967296.0`. A salt gives independent uniforms for independent
    * decisions (split vs sample) over the same key.
    */
  def hashUniform(v: Column, salt: String = ""): Column =
    conv(substring(md5(concat(v.cast("string"), lit(salt)).cast("binary")), 1, 8), 16, 10)
      .cast("long").cast("double") / lit(4294967296.0)

  /** Leakage-safe split assignment: the split label is a pure function
    * of `keyCol` — every row of a key (user, domain, source) lands in
    * the same split, so near-duplicate rows sharing a key can never
    * straddle train/test. `fractions` are (label, weight) with weights
    * summing to ~1; rows fall into cumulative [0,1) intervals in the
    * given order. Row-local (scan-speed, no shuffle).
    */
  def hashSplit(df: DataFrame, keyCol: String,
      fractions: Seq[(String, Double)], salt: String = ""): DataFrame = {
    require(fractions.nonEmpty && math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      "split fractions must sum to 1")
    val u = hashUniform(col(keyCol), salt)
    val cuts = fractions.scanLeft(0.0)(_ + _._2).tail
    // last label is the otherwise-branch: u < 1.0 always
    val expr = fractions.init.zip(cuts).foldRight(lit(fractions.last._1): Column) {
      case (((label, _), cut), rest) => when(u < cut, label).otherwise(rest)
    }
    df.withColumn("split", expr)
  }

  /** Stratified downsampling at per-stratum rates (corpus mixing: keep
    * 50% of `en`, 10% of everything else, …): a row survives iff its
    * key's uniform falls under its stratum's rate. Deterministic — the
    * sample is stable under appends and re-runs. Row-local.
    */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double,
      salt: String = ""): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate): Column) {
      case (rest, (stratum, r)) => when(col(strataCol) === stratum, r).otherwise(rest)
    }
    df.filter(hashUniform(col(keyCol), salt) < rate)
  }

  /** Deterministic weighted sampling without replacement (the
    * Efraimidis–Spirakis A-ES scheme): each row draws the key
    * `u^(1/w)` from its id's deterministic uniform and the `k` largest
    * keys are the sample — inclusion odds scale with weight, so a
    * token-weighted draw over a corpus samples text mass, not document
    * count. `orderBy(desc).limit(k)` plans as TakeOrderedAndProject:
    * every partition keeps its local top-k and only k rows per
    * partition reach the driver merge — the distributed reservoir, no
    * global sort materialization. Rows with non-positive weight are
    * excluded (the key is undefined there). Ties (and the u=0 edge)
    * break by id, so for UNIQUE ids the sample is unique and replayable
    * cross-engine (duplicate ids share the tie-break key and make the
    * k-boundary pick arbitrary — dedup first). Cross-engine exactness
    * note: pow() may differ by 1 ulp between libms, but adjacent key
    * order statistics are separated by ~range/n — astronomically wider
    * than an ulp for any real corpus — and the empirical oracle gate at
    * both SFs is the repo's actual convention for hash/FP boundaries.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int, salt: String = ""): DataFrame = {
    require(k > 0, "sample size k must be positive")
    require(!df.columns.contains("__wkey"),
      "column name __wkey is reserved by weightedSample")
    df.filter(col(weightCol) > 0)
      .withColumn("__wkey",
        pow(hashUniform(col(idCol), salt), lit(1.0) / col(weightCol).cast("double")))
      .orderBy(col("__wkey").desc, col(idCol))
      .limit(k)
      .drop("__wkey")
  }

  /** Token-budget shard assignment: documents ordered by `idCol` are
    * laid out contiguously and cut every `capacity` tokens; a document
    * belongs to the shard where it STARTS (floor(startOffset/capacity)).
    * Returns (idCol, weightCol, cum_tokens, shard).
    *
    * The global running sum is a DISTRIBUTED two-phase prefix sum, not a
    * single-partition global window (which would serialize the whole
    * corpus through one task — the classic 100 TB scale-killer):
    *   1. range-repartition by id (disjoint ORDERED ranges, so global
    *      cumsum = sum of earlier partitions + intra-partition cumsum);
    *   2. per-partition totals (one tiny row per partition) get a
    *      driver-sized cumulative offset via a window over partition
    *      ids — O(partitions), not O(rows);
    *   3. offsets broadcast-join back; the intra-partition running sum
    *      is a window PARTITIONED by partition id — every partition
    *      scans in parallel.
    * The persist() freezes the (sampled) range boundaries so both
    * consumers of the partition-id column see identical assignments;
    * shard ids are boundary-independent either way.
    */
  def tokenShards(df: DataFrame, idCol: String, weightCol: String,
      capacity: Long, numPartitions: Int = 0): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
      else spark.sparkContext.defaultParallelism
    val parts = df.select(col(idCol), col(weightCol))
      .repartitionByRange(n, col(idCol))
      .withColumn("__pid", spark_partition_id())
      .persist()
    val offsets = parts.groupBy(col("__pid"))
      .agg(sum(col(weightCol)).as("__ptotal"))
      .withColumn("__offset",
        coalesce(sum(col("__ptotal"))
          .over(Window.orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__ptotal")
    val intra = Window.partitionBy(col("__pid")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    parts
      .join(broadcast(offsets), "__pid")
      .withColumn("cum_tokens", (col("__offset") + sum(col(weightCol)).over(intra)).cast("long"))
      .withColumn("__start", col("cum_tokens") - col(weightCol))
      // integral `div`, not floor(double /): past 2^53 total tokens a
      // double quotient silently loses ulps
      .withColumn("shard", expr(s"__start div ${capacity}L"))
      .drop("__pid", "__offset", "__start")
  }

  /** Per-class example cap ("at most k per label" corpus balancing):
    * keep the k rows of each label that sort first by the md5 hash of
    * their id (+salt) — deterministic, stable under appends (a new row
    * only displaces rows it out-hashes), and uncorrelated with any
    * data attribute, unlike "first k by id". One window partitioned by
    * label; per-task work is bounded by the largest class — for a
    * billion-row single class, Bernoulli-prefilter at ~1.2·k/n first
    * and cap the survivors.
    */
  def classCap(
      df: DataFrame,
      labelCol: String,
      idCol: String,
      k: Int,
      salt: String = ""): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val order = md5(concat(col(idCol).cast("string"), lit(salt)).cast("binary"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(labelCol)).orderBy(order, col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Temperature-based corpus mixing: downsample each stratum (source /
    * language) so kept mass scales with n^alpha instead of n — the
    * standard multiplier for flattening a skewed pretraining mixture
    * (alpha=1 keeps the natural mix, alpha→0 approaches uniform).
    * Realized as per-stratum keep rates r_s = (n_min/n_s)^(1-alpha):
    * the rarest stratum keeps everything, bigger strata are thinned,
    * and a row survives iff its id's deterministic uniform falls under
    * its stratum's rate — stable under re-runs, replayable in SQL.
    *
    * Scale shape: stratum counts are one algebraic aggregation over a
    * column that's typically low-cardinality (languages, sources), the
    * tiny rate table broadcasts back, and the keep decision is
    * row-local — one small shuffle total, no windows over raw rows.
    */
  def temperatureMix(df: DataFrame, idCol: String, strataCol: String,
      alpha: Double, salt: String = ""): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__n"))
    val rates = counts
      .withColumn("__nmin", min(col("__n")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .select(col(strataCol),
        pow(col("__nmin").cast("double") / col("__n").cast("double"),
          lit(1.0 - alpha)).as("__rate"))
    df.join(broadcast(rates), Seq(strataCol))
      .filter(hashUniform(col(idCol), salt) < col("__rate"))
      .drop("__rate")
  }
}
