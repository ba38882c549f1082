package graft.ingest

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase
import graft.ingest.StatefulStageAgg.TaskLite

class TwsStageAggSpec extends SparkTestBase {

  private val T0 = 1767225600000L // 2026-01-01T00:00:00Z

  private def task(stageId: Int, in: Long, sh: Long, offMs: Long) =
    TaskLite("fixture-app", "app-001", "1", stageId, in, sh, new Timestamp(T0 + offMs))

  test("transformWithState emits the same exact skew rows as the GroupState variant") {
    // transformWithState requires the RocksDB state store provider — set
    // on a cloned session so the shared test session stays untouched
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    import s.implicits._
    val input = MemoryStream[TaskLite]
    val q = TwsStageAgg(input.toDF(), watermarkDelay = "1 minute", inactivityMs = 60000L)
      .writeStream.format("memory").queryName("stage_agg_tws")
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

      val out = s.table("stage_agg_tws")
        .collect().map(r => r.getAs[Int]("stageId") -> r).toMap
      assert(out.keySet == Set(2, 3), s"expected stages 2,3; got ${out.keySet}")
      val expSkew = (98000000.0 - (1000000.0 + 1000000.0 + 98000000.0) / 3) / 97000000.0
      assert(out(2).getAs[Double]("inputBytesReadSkewness") == expSkew)
      assert(out(2).getAs[Long]("maxInputBytesRead") == 98000000L)
      assert(out(3).getAs[Double]("inputBytesReadSkewness") == 0.0)
      assert(out(3).getAs[Double]("shuffleBytesReadSkewness") == 0.0)
      assert(out(3).getAs[Timestamp]("metricTime") == new Timestamp(T0 + 12000))
      // a straggler on an already-open stage re-arms the timer rather
      // than emitting twice: stage 99 (the sentinel) never closed
      assert(!out.contains(99))
    } finally q.stop()
  }
}
