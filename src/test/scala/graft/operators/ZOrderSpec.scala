package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  /** Serial Morton reference: interleave bit-by-bit. */
  private def morton(a: Long, b: Long): Long = {
    var z = 0L
    for (i <- 0 until 16) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("zValue2 matches the bit-by-bit reference across the 16-bit range") {
    val samples = Seq(0L, 1L, 2L, 3L, 255L, 256L, 4095L, 21845L, 43690L, 65535L)
    val pairs = for (a <- samples; b <- samples) yield (a, b)
    val out = pairs.toDF("a", "b")
      .select($"a", $"b", ZOrder.zValue2($"a", $"b"))
      .as[(Long, Long, Long)].collect()
    out.foreach { case (a, b, z) => assert(z == morton(a, b), s"($a,$b)") }
  }

  test("inputs wider than 16 bits use only their low 16 bits") {
    val out = Seq((65536L + 5L, (1L << 40) + 7L)).toDF("a", "b")
      .select(ZOrder.zValue2($"a", $"b")).as[Long].head()
    assert(out == morton(5L, 7L))
  }

  test("prunes selective filters on BOTH dimensions; 1-d sort only on its own") {
    // uniform grid: the two dims are independent, the worst case for 1-d sort
    val rows = for (a <- 0L until 64L; b <- 0L until 64L)
      yield (a * 1024L + b, a, b)
    val df = rows.toDF("id", "x", "y")
    def touched(layout: org.apache.spark.sql.DataFrame,
        pred: org.apache.spark.sql.Column): Long =
      layout.withColumn("pid", spark_partition_id())
        .filter(pred).select($"pid").distinct().count()
    val z = ZOrder.cluster(df, "x", "y", 16)
    val lin = df.repartitionByRange(16, $"x").sortWithinPartitions($"x")
    // x-selective: both layouts prune
    assert(touched(lin, $"x" < 8L) <= 2L)
    assert(touched(z, $"x" < 8L) <= 8L)
    // y-selective: the 1-d layout reads EVERYTHING, the z-curve half or less
    assert(touched(lin, $"y" < 8L) == 16L)
    assert(touched(z, $"y" < 8L) <= 8L)
  }

  test("z-range scan on one dimension touches a minority of partitions") {
    val rows = for (a <- 0L until 64L; b <- 0L until 64L)
      yield (a * 1024L + b, a, b)
    val clustered = ZOrder.cluster(rows.toDF("id", "x", "y"), "x", "y", 16)
    val touched = clustered.withColumn("pid", spark_partition_id())
      .filter($"x" < 8L) // 1/8th of the x-range
      .select($"pid").distinct().count()
    assert(touched <= 8L, s"touched=$touched of 16")
  }
}
