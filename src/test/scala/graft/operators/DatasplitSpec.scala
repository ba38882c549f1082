package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class DatasplitSpec extends SparkTestBase {
  import spark.implicits._

  test("hashSplit: label is a pure function of the key, fractions roughly hold") {
    val df = (1 to 4000).map(i => (i.toLong, s"key-${i % 400}")).toDF("id", "k")
    val out = Datasplit.hashSplit(df, "k", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    // leakage-safety: every key maps to exactly one split
    assert(out.groupBy("k").agg(countDistinct("split").as("n"))
      .filter($"n" > 1).count() == 0)
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    // 400 keys at 10 rows each; binomial 3σ over keys ≈ ±6% of total
    assert(math.abs(counts("train") - 3200.0) < 400, s"train=${counts("train")}")
    assert(counts("val") > 100 && counts("test") > 100)
    // deterministic across invocations
    assert(Datasplit.hashSplit(df, "k", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .except(out).count() == 0)
  }

  test("stratifiedSample: deterministic and monotone in the rate") {
    val df = (1 to 2000).map(i => (i.toLong, if (i % 3 == 0) "en" else "de")).toDF("id", "lang")
    val small = Datasplit.stratifiedSample(df, "id", "lang", Map("en" -> 0.2), 0.1)
    val big = Datasplit.stratifiedSample(df, "id", "lang", Map("en" -> 0.5), 0.3)
    // same salt ⇒ a lower rate selects a SUBSET of a higher rate (stable
    // under rate changes — no resampling churn)
    assert(small.except(big).count() == 0)
    assert(small.count() < big.count())
    assert(Datasplit.stratifiedSample(df, "id", "lang", Map("en" -> 0.2), 0.1)
      .except(small).count() == 0)
  }

  test("tokenShards: distributed prefix sum matches the serial cumsum at any partitioning") {
    val docs = (1 to 999).map(i => (i.toLong, (i % 37 + 1).toLong)).toDF("id", "w")
    val serial = docs.orderBy("id").collect()
      .scanLeft((0L, 0L, 0L)) { case ((_, _, cum), r) =>
        (r.getLong(0), r.getLong(1), cum + r.getLong(1))
      }.tail.map { case (id, w, cum) => (id, w, cum, (cum - w) / 100L) }
    for (nParts <- Seq(1, 7, 32)) {
      val out = Datasplit.tokenShards(docs, "id", "w", capacity = 100L, numPartitions = nParts)
        .orderBy("id")
        .select($"id", $"w", $"cum_tokens", $"shard")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(out.toSeq == serial.toSeq, s"mismatch at numPartitions=$nParts")
    }
    spark.catalog.clearCache()
  }

  test("weightedSample: matches the serial A-ES draw, drops w<=0, plans as TakeOrdered") {
    // serial reference: same md5-uniform + u^(1/w) key computed on the driver
    def u(id: Long, salt: String): Double = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest((id.toString + salt).getBytes("UTF-8"))
      val hex = d.take(4).map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0
    }
    val rows = (1L to 300L).map(i => (i, (i % 23).toLong - 2)) // weights -2..20, some <=0
    val expected = rows.filter(_._2 > 0)
      .map { case (id, w) => (id, math.pow(u(id, "s7"), 1.0 / w)) }
      .sortBy { case (id, k) => (-k, id) }.take(40).map(_._1).toSet

    val df = rows.toDF("id", "w")
    val out = Datasplit.weightedSample(df, "id", "w", k = 40, salt = "s7")
    val got = out.select("id").as[Long].collect().toSet
    assert(got == expected)
    // deterministic across invocations
    assert(Datasplit.weightedSample(df, "id", "w", k = 40, salt = "s7")
      .select("id").as[Long].collect().toSet == got)
    // distributed top-k, not a global sort materialization
    val plan = out.queryExecution.executedPlan.toString()
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("classCap: at most k per label, deterministic, append-stable") {
    val df = (1L to 100L).map(i => (i, s"lang${i % 3}")).toDF("id", "label")
    val capped = Datasplit.classCap(df, "label", "id", k = 10)
      .as[(Long, String)].collect().toSet
    val sizes = capped.groupBy(_._2).view.mapValues(_.size)
    assert(sizes.values.forall(_ == 10) && capped.size == 30)
    // determinism
    assert(Datasplit.classCap(df, "label", "id", k = 10)
      .as[(Long, String)].collect().toSet == capped)
    // append stability: adding rows only displaces rows they out-hash —
    // survivors of the bigger corpus that existed before are a subset
    // of {old survivors} ∪ {new rows}
    val bigger = (1L to 130L).map(i => (i, s"lang${i % 3}")).toDF("id", "label")
    val capped2 = Datasplit.classCap(bigger, "label", "id", k = 10)
      .as[(Long, String)].collect().toSet
    assert(capped2.forall(r => r._1 > 100L || capped.contains(r)))
    // a label with fewer than k rows keeps everything
    val sparse = Seq((1L, "rare"), (2L, "rare")).toDF("id", "label")
    assert(Datasplit.classCap(sparse, "label", "id", 10).count() == 2)
  }

  test("temperatureMix: rarest stratum kept whole, bigger strata thinned toward n^alpha") {
    val rows = (1L to 800L).map(i => (i, if (i <= 640) "big" else if (i <= 760) "mid" else "small"))
    val df = rows.toDF("id", "s")
    val kept = Datasplit.temperatureMix(df, "id", "s", alpha = 0.5)
      .groupBy("s").count().as[(String, Long)].collect().toMap
    // rate_small = 1 → all 40 survive
    assert(kept("small") == 40L)
    // rate_big = sqrt(40/640) = 0.25, rate_mid = sqrt(40/120) ≈ 0.577 —
    // realized counts are deterministic md5 draws near n*rate
    assert(kept("big") > 640 * 0.15 && kept("big") < 640 * 0.35)
    assert(kept("mid") > 120 * 0.45 && kept("mid") < 120 * 0.72)
    // alpha=1 keeps the natural mix entirely
    assert(Datasplit.temperatureMix(df, "id", "s", alpha = 1.0).count() == 800)
    // deterministic across invocations
    val again = Datasplit.temperatureMix(df, "id", "s", alpha = 0.5)
      .select("id").as[Long].collect().toSet
    val first = Datasplit.temperatureMix(df, "id", "s", alpha = 0.5)
      .select("id").as[Long].collect().toSet
    assert(again == first)
  }
}
