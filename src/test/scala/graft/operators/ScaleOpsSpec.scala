package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.sources.{Bucketing, Tables}

class ScaleOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("SaltedAgg equals the direct aggregation (sum/count/min/max)") {
    val ev = Tables.events(spark, sfSmoke)
    val direct = ev.groupBy($"event_type")
      .agg(count(lit(1)).as("n"), min($"user_id").as("min_user_id"),
        max($"user_id").as("max_user_id"))
      .orderBy($"event_type")
      .as[(String, Long, Long, Long)].collect().toSeq
    val salted = SaltedAgg(ev, Seq("event_type"), "user_id", buckets = 8,
        Seq(SaltedAgg.count_(), SaltedAgg.min_("user_id"), SaltedAgg.max_("user_id")))
      .select($"event_type", $"n", $"min_user_id", $"max_user_id")
      .orderBy($"event_type")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(salted == direct && direct.nonEmpty)
  }

  test("SaltedAgg phase-1 spreads a hot key even when its values are constant") {
    // the canonical skew case: one hot key, ALL rows carry the same value
    val hot = Seq.fill(1000)(("hot", 1L)) ++ Seq(("cold", 2L))
    val df = spark.createDataFrame(hot).toDF("k", "v").repartition(4)
    val phase1Groups = df
      .withColumn("__salt", pmod(xxhash64(monotonically_increasing_id()), lit(8)))
      .groupBy($"k", $"__salt").count()
      .filter($"k" === "hot").count()
    assert(phase1Groups > 4, s"hot key only spread over $phase1Groups salt buckets")
    // and the salted aggregate over constant values is still exact
    val got = SaltedAgg(df, Seq("k"), "v", buckets = 8,
        Seq(SaltedAgg.count_(), SaltedAgg.max_("v")))
      .orderBy($"k").select($"k", $"n", $"max_v")
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("cold", 1L, 2L), ("hot", 1000L, 1L)))
  }

  test("co-bucketed tables sort-merge-join with zero exchange") {
    val root = Files.createTempDirectory("graft-buckets")
    val orders = Tables.orders(spark, sfSmoke)
    val customer = Tables.customer(spark, sfSmoke)
    Bucketing.writeBucketed(orders.select($"o_orderkey", $"o_custkey", $"o_totalprice"),
      "orders_b", s"$root/orders_b", "o_custkey", 8)
    Bucketing.writeBucketed(customer.select($"c_custkey", $"c_name"),
      "customer_b", s"$root/customer_b", "c_custkey", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"), $"o_custkey" === $"c_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
