package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.model.TaskMetricLite

/** Reference-semantics tests for the relative-distance skewness aggregate
  * (FIXTURES.md §1 expected values; guard paths of
  * CustomMetricsListener.scala:155-158,168-171).
  */
class SkewnessSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val tasks = Seq(
    // skewed stage 2: 1MB, 1MB, 98MB
    TaskMetricLite("app", "app-001", "1", 2, "10.0", 1000000L, 0L, ts("2026-01-01 00:00:01")),
    TaskMetricLite("app", "app-001", "1", 2, "11.0", 1000000L, 0L, ts("2026-01-01 00:00:02")),
    TaskMetricLite("app", "app-001", "1", 2, "12.0", 98000000L, 0L, ts("2026-01-01 00:00:09")),
    // uniform stage 3: range 0 → guard → skew 0
    TaskMetricLite("app", "app-001", "1", 3, "20.0", 5000L, 4096L, ts("2026-01-01 00:00:11")),
    TaskMetricLite("app", "app-001", "1", 3, "21.0", 5000L, 4096L, ts("2026-01-01 00:00:12")),
    // single-task stage 4 (reference would crash on empty buffer; we don't)
    TaskMetricLite("app", "app-001", "2", 4, "30.0", 777L, 1L, ts("2026-01-01 00:00:13"))
  )

  test("stageAgg reproduces reference skew values (FIXTURES.md §1)") {
    val got = Skewness.stageAgg(tasks.toDF())
      .orderBy($"stageId")
      .collect()
    assert(got.length == 3)

    val s2 = got(0)
    val avg2 = (1000000L + 1000000L + 98000000L) / 3.0
    val expSkew2 = (98000000L - avg2) / (98000000L - 1000000L)
    assert(math.abs(s2.getAs[Double]("inputBytesReadSkewness") - expSkew2) < 1e-12)
    assert(s2.getAs[Long]("maxInputBytesRead") == 98000000L)
    assert(math.abs(expSkew2 - 0.6666666666666666) < 1e-9)
    // shuffle bytes all 0 → range guard → 0
    assert(s2.getAs[Double]("shuffleBytesReadSkewness") == 0.0)

    val s3 = got(1)
    assert(s3.getAs[Double]("inputBytesReadSkewness") == 0.0)
    assert(s3.getAs[Double]("shuffleBytesReadSkewness") == 0.0)

    val s4 = got(2)
    assert(s4.getAs[Double]("inputBytesReadSkewness") == 0.0)
    assert(s4.getAs[Long]("maxInputBytesRead") == 777L)
    // metricTime = max task time in stage
    assert(s4.getAs[Timestamp]("metricTime") == ts("2026-01-01 00:00:13"))
  }

  test("random groups: operator == serial identity form == reference's per-task form") {
    val rnd = new scala.util.Random(66L)
    (1 to 25).foreach { trial =>
      val rows = Seq.fill(1 + rnd.nextInt(60))((
        rnd.nextInt(5).toLong,
        // mix tight clusters and wild outliers, incl. all-equal groups
        if (rnd.nextInt(4) == 0) 5000L else rnd.nextLong(100000000L)))
      val got = Skewness.relativeSkew(rows.toDF("g", "v"), Seq("g"), Seq("v"))
        .select($"g", $"v_skewness").as[(Long, Double)].collect().toMap
      rows.groupBy(_._1).foreach { case (g, grp) =>
        val vs = grp.map(_._2)
        val avg = vs.sum.toDouble / vs.length // exact: Σ < 2^53
        val range = if (vs.max == vs.min) 1.0 else (vs.max - vs.min).toDouble
        // the operator's algebraic identity, evaluated serially
        val identity = math.max(vs.max - avg, avg - vs.min) / range
        // the reference's per-task form (CustomMetricsListener.scala:163)
        val perTask = vs.map(x => math.abs(x - avg) / range).max
        assert(got(g) == identity, s"trial $trial g=$g operator vs identity")
        assert(identity == perTask, s"trial $trial g=$g identity vs per-task")
      }
    }
  }

  test("skew is within [0,1] for arbitrary data (property)") {
    val df = spark.range(0, 1000)
      .select(
        (col("id") % 7).as("g"),
        (pmod(hash(col("id")), lit(100000)).cast("long")).as("v"))
    val skews = Skewness.relativeSkew(df, Seq("g"), Seq("v"))
      .select("v_skewness").as[Double].collect()
    assert(skews.forall(x => x >= 0.0 && x <= 1.0))
  }
}
