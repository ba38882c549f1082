package graft.operators

import java.sql.Timestamp

import graft.SparkTestBase

class AsofJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(ms: Long) = new Timestamp(ms)

  test("asofJoin: inclusive most-recent match per key, null before first right row") {
    val left = Seq(
      ("k1", ts(50)), ("k1", ts(100)), ("k1", ts(150)), ("k1", ts(300)),
      ("k2", ts(100)), ("k3", ts(100))).toDF("k", "t")
    val right = Seq(
      ("k1", ts(100), 1.0), ("k1", ts(200), 2.0),
      ("k2", ts(100), 9.0)).toDF("k", "rt", "v")
    val out = AsofJoin.asofJoin(left, right, Seq("k"), "t", "rt")
      .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime,
        Option(r.get(2)).map(_.asInstanceOf[Double]))).toSet
    assert(out == Set(
      ("k1", 50L, None),        // before any right row
      ("k1", 100L, Some(1.0)),  // INCLUSIVE: equal timestamps match
      ("k1", 150L, Some(1.0)),
      ("k1", 300L, Some(2.0)),  // most recent of several
      ("k2", 100L, Some(9.0)),  // keys don't cross-contaminate
      ("k3", 100L, None)))      // key absent from right
  }

  test("asofJoin: payload prefix resolves collisions; plan has one exchange") {
    val left = Seq(("k1", ts(10), 7L)).toDF("k", "t", "v")
    val right = Seq(("k1", ts(5), 3L)).toDF("k", "rt", "v")
    intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(left, right, Seq("k"), "t", "rt")
    }
    val out = AsofJoin.asofJoin(left, right, Seq("k"), "t", "rt", payloadPrefix = "r_")
    assert(out.columns.toSeq == Seq("k", "t", "v", "r_v"))
    assert(out.collect().head.getAs[Long]("r_v") == 3L)
    // union + window shape: no join operator anywhere (a range join or
    // broadcast-nested-loop would be the n² trap), exactly one Window
    val plan = out.queryExecution.executedPlan.toString()
    assert(!plan.toLowerCase.contains("join"), s"unexpected join in plan:\n$plan")
    assert(plan.contains("Window [") && plan.contains("Union"), plan)
  }
}
