package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter semi-join pruning — the shuffle-volume killer for the
  * "fact ⋉ big dim" case where the dim's key set is too large to
  * broadcast exactly but its BLOOM fits in memory: build a fixed-size
  * bloom over the dim keys (one pass, mergeable sketch partials), ship
  * it as a literal, and drop fact rows at the SCAN, before they ever
  * reach the join shuffle. False positives are removed by the exact
  * semi-join that follows, so results are exact; the bloom only
  * decides how many rows pay the shuffle.
  *
  * Uses Spark's own codegen'd `BloomFilterAggregate` /
  * `BloomFilterMightContain` (the expressions behind AQE runtime
  * filtering) wired through the same Column bridge as the graft
  * custom expressions — not a Scala UDF, so the probe stays inside
  * whole-stage codegen.
  */
object BloomJoin {

  /** Optimal bit count for `n` items at false-positive rate `fpp`. */
  def optimalNumBits(n: Long, fpp: Double): Long =
    math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong

  /** One-pass bloom of the build side's key hashes, serialized. */
  def buildFilter(
      build: DataFrame,
      keyCol: String,
      expectedItems: Long,
      numBits: Long): Array[Byte] = {
    val child = GraftSqlBridge.expression(xxhash64(col(keyCol)))
    val agg = new BloomFilterAggregate(child,
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    build.select(GraftSqlBridge.column(agg).as("bf"))
      .head().getAs[Array[Byte]]("bf")
  }

  /** Codegen'd probe: true if `c`'s hash might be in the serialized
    * bloom (never false-negative).
    */
  def mightContain(bloom: Array[Byte], c: Column): Column =
    GraftSqlBridge.column(BloomFilterMightContain(
      Literal.create(bloom, BinaryType),
      GraftSqlBridge.expression(xxhash64(c))))

  /** Exact semi-join with bloom pre-pruning: fact rows failing the
    * bloom never reach the join exchange. `fpp` trades bloom size for
    * shuffle savings (bits ≈ -n·ln(fpp)/ln²2).
    */
  def semiJoin(
      fact: DataFrame,
      factKey: String,
      dim: DataFrame,
      dimKey: String,
      expectedItems: Long,
      fpp: Double = 0.03): DataFrame = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1)
    val bf = buildFilter(dim, dimKey, expectedItems,
      optimalNumBits(expectedItems, fpp))
    val keys = dim.select(col(dimKey).as("__bj_key")).distinct()
    fact.filter(mightContain(bf, col(factKey)))
      .join(keys, col(factKey) === col("__bj_key"), "leftsemi")
  }
}
