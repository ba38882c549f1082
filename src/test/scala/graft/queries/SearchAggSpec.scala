package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.{Composite, SignificantTerms}

class SearchAggSpec extends SparkTestBase {
  import spark.implicits._

  test("oracle map covers every search-agg query") {
    assert(SearchAggQueries.all.keySet == SearchAggQueries.oracle.keySet)
  }

  for ((name, fn) <- SearchAggQueries.all.toSeq.sortBy(_._1)) {
    test(s"$name runs and returns rows on sf0.001") {
      assert(fn(spark, sfSmoke).count() > 0, s"$name returned no rows")
    }
  }

  test("q221 boxplot quartiles match a brute-force local recount") {
    val vals = graft.sources.Tables.events(spark, sfSmoke)
      .filter($"value".isNotNull)
      .select($"event_type", floor($"value" * 100).cast("long").as("cents"))
      .as[(String, Long)].collect().toList.groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted).toMap
    val got = SearchAggQueries.q221Boxplot(spark, sfSmoke)
      .select($"event_type", $"n", $"q1", $"q2", $"q3", $"n_outliers")
      .as[(String, Long, Long, Long, Long, Long)].collect().toList
    assert(got.nonEmpty)
    got.foreach { case (t, n, q1, q2, q3, nOut) =>
      val xs = vals(t)
      assert(n == xs.length.toLong)
      // type-1 lower quantile: value at rank ceil(p*n), 1-indexed
      def rank(r: Long): Long = xs((r - 1).toInt)
      assert(q1 == rank((n + 3) / 4) && q2 == rank((n + 1) / 2) &&
        q3 == rank((3 * n + 3) / 4), s"quartiles of $t")
      val iqr = q3 - q1
      val (lo, hi) = (q1 - 3 * iqr / 2, q3 + 3 * iqr / 2)
      assert(nOut == xs.count(v => v < lo || v > hi).toLong, s"outliers of $t")
    }
  }

  test("SignificantTerms.jlh scores a hand-computed fixture exactly") {
    // term x: 2 of 4 fg rows, 2 of 10 total; term y: 1 fg, 5 total;
    // term z: 1 fg, 3 total — fg 4, bg 10
    val df = Seq(
      ("x", true), ("x", true), ("y", true), ("z", true),
      ("y", false), ("y", false), ("y", false), ("y", false),
      ("z", false), ("z", false)).toDF("t", "fg")
    val got = SignificantTerms.jlh(df, col("t"), col("fg"), 10)
      .select($"term", $"fg_ppm", $"bg_ppm", $"score_ppm")
      .as[(String, Long, Long, Long)].collect().toList
    // fg_ppm = fg*1e6 div 4, bg_ppm = bg*1e6 div 10
    // x: 500000 vs 200000 -> 300000*500000 div 200000 = 750000
    // z: 250000 vs 300000 -> -(50000*250000 div 300000) = -41666
    // y: 250000 vs 500000 -> -(250000*250000 div 500000) = -125000
    assert(got == List(
      ("x", 500000L, 200000L, 750000L),
      ("z", 250000L, 300000L, -41666L),
      ("y", 250000L, 500000L, -125000L)))
  }

  test("SignificantTerms.jlh drops null terms and bg-only terms") {
    val df = Seq((Option("a"), true), (Option("b"), false), (None, true))
      .toDF("t", "fg")
    val got = SignificantTerms.jlh(df, col("t"), col("fg"), 10)
      .select($"term").as[String].collect().toList
    assert(got == List("a"))
  }

  test("Composite after-key paging equals global-rank paging") {
    val buckets = (1 to 137).map(i => (s"k${i % 7}", i.toLong, i * 3L))
      .toDF("a", "b", "n")
    val paged = Composite.pages(buckets, Seq("a", "b"), 25, 4)
      .select($"page", $"a", $"b", $"n")
      .as[(Long, String, Long, Long)].collect().toList
    val want = (1 to 137).map(i => (s"k${i % 7}", i.toLong, i * 3L))
      .sortBy(r => (r._1, r._2)).take(100).zipWithIndex
      .map { case ((a, b, n), ix) => (ix.toLong / 25, a, b, n) }.toList
    assert(paged.sorted == want.sorted)
  }

  test("Composite.pages stops early when the bucket space is exhausted") {
    val buckets = Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("k", "n")
    val got = Composite.pages(buckets, Seq("k"), 2, 5)
      .select($"page", $"k").as[(Long, String)].collect().toList.sorted
    assert(got == List((0L, "a"), (0L, "b"), (1L, "c")))
  }

  test("PanelSpec moving_avg and serial_diff pipelines over a tiny series") {
    import graft.search.PanelSpec
    val ts = (0 until 10).flatMap(d => Seq.fill(d + 1)(d)).map(d =>
      (java.sql.Timestamp.valueOf(f"2024-01-${d + 1}%02d 12:00:00"), 1.0))
      .toDF("ts", "value")
    // daily counts 1..10
    val mv = PanelSpec.run(ts,
        """{"panel":"m","agg":"date_histogram","field":"ts","pipeline":"moving_avg"}""")
      .orderBy($"bucket".cast("long"))
      .select($"n", $"val").as[(Long, Long)].collect().toList
    // trailing-3 truncating means over 1..10
    assert(mv.map(_._2) == List(1L, 1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L))
    val sd = PanelSpec.run(ts,
        """{"panel":"s","agg":"date_histogram","field":"ts","pipeline":"serial_diff","lag":3}""")
      .orderBy($"bucket".cast("long"))
      .select($"val").as[Long].collect().toList
    assert(sd == List(0L, 0L, 0L, 3L, 3L, 3L, 3L, 3L, 3L, 3L))
  }

  test("PanelSpec interval:auto resolves through the normalized ladder") {
    import graft.search.PanelSpec
    // 24 samples 5 minutes apart: span 6900 s -> the 300 s rung, one
    // bucket each; a fixed-daily default would collapse to ONE bucket
    val ts = (0 until 24).map(i =>
      (new java.sql.Timestamp(1767225600000L + i * 300000L), 1.0))
      .toDF("ts", "value")
    val out = PanelSpec.run(ts,
      """{"panel":"a","agg":"date_histogram","field":"ts","interval":"auto"}""")
    assert(out.count() == 24L)
    // interval_ms alone keeps the fixed default
    assert(PanelSpec.run(ts,
      """{"panel":"a","agg":"date_histogram","field":"ts"}""").count() == 1L)
  }

  test("PanelSpec full panel vocabulary on a hand-computable frame") {
    import graft.search.PanelSpec
    // 7 rows; cents domain {100, 200, 500, 1000}
    val df = Seq(
      ("a", 1L, 1.0), ("a", 1L, 1.0), ("a", 1L, 1.0), ("a", 2L, 5.0),
      ("b", 1L, 2.0), ("b", 1L, 2.0), ("c", 1L, 10.0))
      .toDF("k", "sub", "value")
    def rows(json: String): List[(String, Long, Long)] =
      PanelSpec.run(df, json).orderBy($"bucket")
        .select($"bucket", $"n", $"val").as[(String, Long, Long)]
        .collect().toList
    // cardinality: exact distinct of k
    assert(rows("""{"panel":"c","agg":"cardinality","field":"k"}""") ==
      List(("all", 7L, 3L)))
    // percentiles: type-1 lower quantile of cents; p50 rank 4 -> 200
    assert(rows(
      """{"panel":"p","agg":"percentiles","metric":"value","percents":[50,100]}""")
      .sortBy(_._1) == List(("p100", 7L, 1000L), ("p50", 7L, 200L)))
    // range: [lo,hi) buckets; 7.0 in no bucket vanishes, 100-* is empty
    assert(rows(
      """{"panel":"r","agg":"range","field":"value",
        | "ranges":[{"to":2},{"from":2,"to":6},{"from":100}]}""".stripMargin)
      == List(("*-2", 3L, 300L), ("100-*", 0L, 0L), ("2-6", 3L, 900L)))
    // terms with avg / max metric_agg
    assert(rows(
      """{"panel":"t","agg":"terms","field":"k","size":2,"metric_agg":"avg"}""")
      == List(("a", 4L, 200L), ("b", 2L, 200L)))
    assert(rows(
      """{"panel":"t","agg":"terms","field":"k","size":1,"metric_agg":"max"}""")
      == List(("a", 4L, 500L)))
    // nested_terms: level-1 top-2 by max cents = c(1000), a(500);
    // level-2 top-1 within each survivor
    assert(rows(
      """{"panel":"nt","agg":"nested_terms","fields":["k","sub"],"sizes":[2,1]}""")
      == List(("a/2", 1L, 500L), ("c/1", 1L, 1000L)))
    // dispatch rejects stay loud
    intercept[IllegalArgumentException] {
      PanelSpec.run(df, """{"panel":"x","agg":"geo_bounds","field":"k"}""")
    }
    intercept[IllegalArgumentException] {
      rows("""{"panel":"x","agg":"terms","field":"k","metric_agg":"median"}""")
    }
  }

  test("PanelSpec randomized differential vs local brute force") {
    import graft.search.PanelSpec
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 1 to 5) {
      val data = List.fill(30 + rnd.nextInt(120))(
        (s"k${rnd.nextInt(6)}", rnd.nextInt(40) / 4.0))
      val df = data.toDF("k", "value")
      def cents(v: Double) = math.floor(v * 100).toLong
      // percentiles: type-1 lower quantile over all cents
      val ps = List(10, 50, 90, 100)
      val gotP = PanelSpec.run(df,
          s"""{"panel":"p","agg":"percentiles","metric":"value",
             | "percents":[${ps.mkString(",")}]}""".stripMargin)
        .select($"bucket", $"val").as[(String, Long)].collect().toMap
      val sorted = data.map(t => cents(t._2)).sorted
      ps.foreach { p =>
        val want = sorted((math.ceil(p * sorted.length / 100.0) - 1).toInt.max(0))
        assert(gotP(s"p$p") == want, s"trial $trial p$p")
      }
      // range: [lo,hi) buckets incl. an always-empty one
      val gotR = PanelSpec.run(df,
          """{"panel":"r","agg":"range","field":"value",
            | "ranges":[{"to":3},{"from":3,"to":7},{"from":999}]}""".stripMargin)
        .select($"bucket", $"n", $"val").as[(String, Long, Long)]
        .collect().map { case (b, n, v) => b -> ((n, v)) }.toMap
      def bucket(lo: Double, hi: Double) = {
        val xs = data.filter(t => t._2 >= lo && t._2 < hi)
        (xs.length.toLong, xs.map(t => cents(t._2)).sum)
      }
      assert(gotR("*-3") == bucket(Double.MinValue, 3))
      assert(gotR("3-7") == bucket(3, 7))
      assert(gotR("999-*") == ((0L, 0L)), s"trial $trial empty bucket")
      // nested_terms: per-level top-k by max cents, key tie asc
      val data2 = data.map { case (k, v) => (k, s"s${rnd.nextInt(4)}", v) }
      val gotN = PanelSpec.run(data2.toDF("k", "sub", "value"),
          """{"panel":"nt","agg":"nested_terms","fields":["k","sub"],
            | "sizes":[2,2]}""".stripMargin)
        .select($"bucket", $"val").as[(String, Long)].collect().toMap
      val leaf = data2.groupBy(t => (t._1, t._2))
        .view.mapValues(_.map(t => cents(t._3)).max).toMap
      val l1 = leaf.groupBy(_._1._1).view.mapValues(_.values.max).toList
        .sortBy { case (k, m) => (-m, k) }.take(2).map(_._1)
      val want = l1.flatMap { k =>
        leaf.filter(_._1._1 == k).toList
          .sortBy { case ((_, s), m) => (-m, s) }.take(2)
          .map { case ((_, s), m) => s"$k/$s" -> m }
      }.toMap
      assert(gotN == want, s"trial $trial nested")
    }
  }
}
