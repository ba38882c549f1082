package graft.ingest

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase
import graft.ingest.StatefulStageAgg.TaskLite

class StatefulStageAggSpec extends SparkTestBase {
  import spark.implicits._

  private val T0 = 1767225600000L // 2026-01-01T00:00:00Z

  private def task(stageId: Int, in: Long, sh: Long, offMs: Long) =
    TaskLite("fixture-app", "app-001", "1", stageId, in, sh, new Timestamp(T0 + offMs))

  test("stage state emits exact skew on inactivity timeout, sentinel stays open") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[TaskLite]
    val q = StatefulStageAgg(input.toDF(), watermarkDelay = "1 minute", inactivityMs = 60000L)
      .writeStream.format("memory").queryName("stage_agg_stateful")
      .outputMode("append").start()
    try {
      // FIXTURES.md stage 2 (skewed) + stage 3 (uniform, range-0 guard)
      input.addData(
        task(2, 1000000L, 0L, 1000),
        task(2, 1000000L, 0L, 2000),
        task(2, 98000000L, 0L, 9000),
        task(3, 5000L, 4096L, 11000),
        task(3, 5000L, 4096L, 12000))
      q.processAllAvailable()
      // sentinel two hours later pushes the watermark past both stages
      input.addData(task(99, 1L, 0L, 7200L * 1000))
      q.processAllAvailable()

      val out = spark.table("stage_agg_stateful")
        .collect().map(r => r.getAs[Int]("stageId") -> r).toMap
      assert(out.keySet == Set(2, 3), s"expected stages 2,3; got ${out.keySet}")
      val expSkew = (98000000.0 - (1000000.0 + 1000000.0 + 98000000.0) / 3) / 97000000.0
      assert(out(2).getAs[Double]("inputBytesReadSkewness") == expSkew)
      assert(out(2).getAs[Long]("maxInputBytesRead") == 98000000L)
      assert(out(3).getAs[Double]("inputBytesReadSkewness") == 0.0)
      assert(out(3).getAs[Double]("shuffleBytesReadSkewness") == 0.0)
      assert(out(3).getAs[Timestamp]("metricTime") == new Timestamp(T0 + 12000))
    } finally q.stop()
  }
}
