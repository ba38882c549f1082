package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Token-partitioned inverted index over a document corpus — the
  * full-text analog of the partitioned LSH/IVF vector indexes: build
  * once (the one corpus-wide token shuffle happens offline, at index
  * time), then every term query prunes to its token's hash bucket at
  * FILE LISTING time. At 100 TB a 2-term search touches 2 of
  * `buckets` partition directories instead of the whole corpus.
  */
object InvertedIndex {

  /** Uniform token bucket. Used both at write (partition column) and at
    * query time on LITERAL terms, where constant folding collapses it
    * so the comparison lands in PartitionFilters.
    */
  def bucketOf(token: Column, buckets: Int): Column =
    pmod(xxhash64(token), lit(buckets.toLong))

  /** Posting lists (token, id, tf) written under tok_bucket=… dirs.
    * The explode + groupBy is the intrinsic index-build shuffle; the
    * repartition co-locates each bucket into its own files so queries
    * read exactly the buckets they probe.
    */
  def writeIndex(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      path: String,
      buckets: Int = 64): Unit = {
    val tk = split(trim(col(textCol)), "\\s+")
    docs.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol), explode(tk).as("token"))
      .groupBy(col("token"), col(idCol))
      .agg(count(lit(1)).as("tf"))
      .withColumn("tok_bucket", bucketOf(col("token"), buckets))
      .repartition(col("tok_bucket"))
      .write.partitionBy("tok_bucket").mode("overwrite").parquet(path)
  }

  /** Conjunctive (all-terms) search: per-term posting reads pruned to
    * the term's bucket, one id-keyed aggregation enforces the AND and
    * sums tf. Output: (idCol, tf_sum).
    */
  def searchAnd(
      spark: SparkSession,
      path: String,
      idCol: String,
      terms: Seq[String],
      buckets: Int = 64): DataFrame = {
    require(terms.nonEmpty && terms.distinct.size == terms.size,
      "terms must be non-empty and distinct")
    val idx = spark.read.parquet(path)
    // bucketOf(lit(term)) is foldable -> becomes a PartitionFilter
    val probe = terms.map { t =>
      (col("tok_bucket") === bucketOf(lit(t), buckets)) && (col("token") === t)
    }.reduce(_ || _)
    idx.filter(probe)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_terms"), sum(col("tf")).as("tf_sum"))
      // postings are (token,id)-unique by construction, so count(*)
      // counts matched DISTINCT terms without a distinct aggregate
      .filter(col("n_terms") === terms.size)
      .select(col(idCol), col("tf_sum"))
  }
}
