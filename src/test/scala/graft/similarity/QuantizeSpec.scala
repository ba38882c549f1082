package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class QuantizeSpec extends SparkTestBase {
  import spark.implicits._

  test("int8 quantization: codes bounded, reconstruction within half a step, zero-vector safe") {
    val vecs = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.125f)),
      (2L, Array(100.0f, -100.0f, 3.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 0.0f, 0.0f)), // all-zero guard
      (4L, Array(1e-6f, -1e-6f, 5e-7f, 0.0f))).toDF("id", "v")
    val scale = Quantize.int8Scale($"v")
    val out = vecs
      .withColumn("s", scale)
      .withColumn("c", Quantize.int8Codes($"v", $"s"))
      .withColumn("cmax", array_max(transform($"c", abs(_))))
      .withColumn("err", Quantize.maxReconError($"v", $"c", $"s"))
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Double]("s"), r.getAs[Long]("cmax"), r.getAs[Double]("err"))).toMap

    out.foreach { case (id, (s, cmax, err)) =>
      assert(cmax <= 127L, s"id=$id codes exceed int8: $cmax")
      assert(err <= 0.5 / s + 1e-12, s"id=$id reconstruction err $err > half-step ${0.5 / s}")
    }
    // the max |x| element always hits ±127 exactly (symmetric scaling)
    assert(out(1)._2 == 127L && out(2)._2 == 127L)
    // all-zero vector: scale 1, zero codes, exact reconstruction
    assert(out(3)._1 == 1.0 && out(3)._2 == 0L && out(3)._3 == 0.0)
  }
}
