package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering: interleave the bits of two
  * dimensions into one sort key so that range-partitioning + sorting
  * on it co-locates rows that are close in BOTH dimensions. Files
  * then carry tight min/max bounding boxes over either column, and a
  * predicate on either dimension (or both) skips most files/row
  * groups — the multi-dimensional counterpart of date-partitioning,
  * and the standard layout trick for two-filter tables at 100 TB.
  *
  * The z-value is pure integer bit math (the classic spread-bits
  * ladder), so any engine can replay it — no UDF, fully codegen'd,
  * exact.
  */
object ZOrder {

  /** Bits of `x` (16-bit, pre-masked) spread to even positions. */
  private def spread16(x: Column): Column = {
    val s0 = x.bitwiseAND(lit(0xFFFFL))
    val s1 = (s0.bitwiseOR(shiftleft(s0, 8))).bitwiseAND(lit(0x00FF00FFL))
    val s2 = (s1.bitwiseOR(shiftleft(s1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val s3 = (s2.bitwiseOR(shiftleft(s2, 2))).bitwiseAND(lit(0x33333333L))
    (s3.bitwiseOR(shiftleft(s3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit dimensions (low 16 bits of each
    * input are used; callers clamp/quantize upstream). `a` occupies
    * the even bit positions, `b` the odd ones.
    */
  def zValue2(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1)).as("zkey")

  /** Rewrite `df` clustered by the z-curve over (colA, colB): adds
    * `zkey`, range-partitions on it, and sorts within partitions — the
    * exact write layout a `write.parquet` of the result preserves.
    */
  def cluster(
      df: DataFrame,
      colA: String,
      colB: String,
      numPartitions: Int): DataFrame = {
    val keyed = df.withColumn("zkey", zValue2(col(colA), col(colB)))
    keyed.repartitionByRange(numPartitions, col("zkey"))
      .sortWithinPartitions(col("zkey"))
  }
}
