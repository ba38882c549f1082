package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class BloomJoinSpec extends SparkTestBase {
  import spark.implicits._

  private val fact = (1L to 1000L).map(i => (i, i % 10)).toDF("k", "v")
  private val dim = Seq(3L, 7L, 500L, 999L).toDF("dk")

  test("semiJoin is exact: bloom false positives are removed by the join") {
    val got = BloomJoin.semiJoin(fact, "k", dim, "dk", expectedItems = 4)
      .select($"k").as[Long].collect().sorted.toSeq
    assert(got == Seq(3L, 7L, 500L, 999L))
  }

  test("bloom probe never false-negatives and prunes most of the fact") {
    val bf = BloomJoin.buildFilter(dim, "dk", 4, BloomJoin.optimalNumBits(4, 0.03))
    val passed = fact.filter(BloomJoin.mightContain(bf, $"k")).count()
    assert(passed >= 4, "members must always pass")
    assert(passed <= 100, s"~3% fpp should pass ~4+30 of 1000, got $passed")
  }

  test("plan: might_contain filters the scan below the join, codegen'd") {
    // parquet-backed fact: over a LocalRelation the optimizer evaluates
    // the filter eagerly and it would not appear in the plan
    val factP = graft.sources.Tables.lineitem(spark, sfSmoke)
    val dimP = graft.sources.Tables.orders(spark, sfSmoke)
      .filter($"o_totalprice" > 100000).select($"o_orderkey")
    val plan = BloomJoin.semiJoin(factP, "l_orderkey", dimP, "o_orderkey", 1000)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan)
    assert(plan.indexOf("might_contain") > plan.indexOf("Join"),
      "bloom probe must sit below the join:\n" + plan)
  }
}
