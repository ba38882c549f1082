package graft.queries

import graft.SparkTestBase

/** Smoke + shape tests for every declared query at sf0.001; full value
  * verification is the driver's DuckDB-oracle tier (and was replicated
  * locally at sf0.01 during development).
  */
class AnalyticsSpec extends SparkTestBase {

  test("oracle map covers every query") {
    assert(Analytics.all.keySet == Analytics.oracle.keySet)
  }

  for ((name, fn) <- Analytics.all.toSeq.sortBy(_._1)) {
    test(s"$name runs and returns rows on sf0.001") {
      val df = fn(spark, sfSmoke)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("q01 aggregates match the flagship-entry contract (rows>0)") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("q05 ranks never exceed k and restart per group") {
    val rows = Analytics.q05TopKPerGroup(spark, sfSmoke).collect()
    val byNation = rows.groupBy(_.getAs[String]("n_name"))
    byNation.foreach { case (_, rs) =>
      val ranks = rs.map(_.getAs[Long]("rk")).sorted.toSeq
      assert(ranks == (1L to ranks.length))
      assert(ranks.length <= 3)
    }
  }

  test("q11 plans broadcast joins for every dimension") {
    val plan = Analytics.q11JoinEnrich(spark, sfSmoke)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"),
      "dimension joins must broadcast, not sort-merge")
  }
}
