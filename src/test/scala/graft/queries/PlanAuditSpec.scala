package graft.queries

import graft.SparkTestBase

/** Plan-shape audits: the properties that make these queries survive a
  * 100× scale-up, asserted so a regression (lost pushdown, lost
  * broadcast, unbounded sort) fails CI rather than a cluster.
  */
class PlanAuditSpec extends SparkTestBase {

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, sfSmoke)
      .queryExecution.executedPlan.toString

  /** Union of EVERY executed plan the query runs while being built,
    * plus the final frame's plan. Operators that eagerly materialize
    * intermediates (localCheckpoint'ed signature tables — the exchange-
    * reuse shape) run their interesting subplans during construction,
    * so the final plan alone no longer shows them.
    */
  private def allPlans(name: String): String = {
    val buf = new scala.collection.mutable.ArrayBuffer[String]()
    val l = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit = {
        buf.synchronized { buf += qe.executedPlan.toString }; ()
      }
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    try {
      val df = graft.SparkEntry.queries(name)(spark, sfSmoke)
      val fin = df.queryExecution.executedPlan.toString
      // listener events ride the async bus — flush before reading
      graft.operators.GuardMetrics.drainListenerBus(spark, 10000)
      buf.synchronized(buf.mkString("\n")) + "\n" + fin
    } finally spark.listenerManager.unregister(l)
  }

  test("q10: filter-control predicates reach the parquet scan") {
    val p = plan("q10_filtered_agg")
    assert(p.contains("PushedFilters:") && p.contains("o_orderstatus"),
      s"expected pushed o_orderstatus filter:\n$p")
  }

  test("q09: log-search equality predicate is pushed; projection pruned") {
    val p = plan("q09_log_search")
    assert(p.contains("PushedFilters:") && p.contains("EqualTo(lang,en)"), p)
    assert(!p.contains("ReadSchema: struct<doc_id:bigint,text:string,lang:string,source:string,n_chars:bigint>")
      || p.contains("text"), "text needed for contains(); other cols pruned")
  }

  test("q14: routed output is heap-bounded, not globally sorted") {
    val p = plan("q14_route")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Sort ["), s"no full sort expected:\n$p")
  }

  test("q22: brute-force ANN is broadcast + TakeOrdered (zero shuffle)") {
    val p = plan("q22_cosine_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q01: grouped sums run partial (map-side) aggregation") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("partial_sum") || p.contains("partial"), p)
  }

  test("q11: every dimension join is broadcast — fact side never shuffles") {
    val p = plan("q11_join_enrich")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q18/q36: minhash signatures run the native codegen'd expression") {
    // the signature table is checkpointed at build time (exchange-reuse
    // shape), so the native expression executes in a construction-time
    // action — audit the union of executed plans
    assert(allPlans("q18_neardup_pairs").contains("graft_minhash"))
    assert(allPlans("q36_minhash_dedup").contains("graft_minhash"))
  }

  test("q19: simhash signatures run the native codegen'd expression") {
    assert(allPlans("q19_simhash_pairs").contains("graft_simhash"))
  }

  test("q34/q35: index probes prune partitions at file listing") {
    val lsh = plan("q34_ann_lsh_index")
    assert(lsh.contains("PartitionFilters") && lsh.contains("sig_bucket"), lsh)
    val ivf = plan("q35_ann_ivf_index")
    assert(ivf.contains("PartitionFilters") && ivf.contains("ivf_cell"), ivf)
  }

  test("q152: dimension joins broadcast; share windows never SMJ the fact side") {
    val p = plan("q152_share_of_parent")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q157: novelty grams are codegen-hashed, and the pair set is scanned once") {
    val p = plan("q157_ngram_novelty")
    assert(p.contains("graft_word_shingle_hashes"), p)
    // the window-min form has no self-join: a second scan of the
    // explode subtree would show two parquet scans of documents
    assert("Scan parquet".r.findAllIn(p).size == 1, p)
  }

  test("q159: fanout top-k is heap-bounded (TakeOrdered), counts not rows") {
    val p = plan("q159_join_fanout")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q161: keyset page is cursor-broadcast + TakeOrdered, never a global sort") {
    val p = plan("q161_search_after")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
  }

  test("q162: the trailing-window spine joins as a broadcast, not a shuffle") {
    val p = plan("q162_rolling_p95")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q164: per-side totals broadcast back onto the pair frame") {
    val p = plan("q164_source_overlap")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q226: the ALL rollup reads persisted bitmap partials, never a second events scan") {
    val p = plan("q226_bitmap_distinct")
    assert(p.contains("InMemoryTableScan"), p)
    // physical form is static_invoke(BitmapExpressionUtils.bitmapCount)
    assert(p.contains("bitmapCount") || p.contains("bitmap_count"), p)
  }

  test("q244: TPC-H Q5 joins broadcast every dim; no cartesian anywhere") {
    val p = plan("q244_local_supplier_volume")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q243: date filters push to the orders and lineitem scans; top-10 is TakeOrdered") {
    val p = plan("q243_shipping_priority")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("PushedFilters"), p)
  }

  test("q228: percolation over 6 stored queries is ONE corpus scan") {
    val p = plan("q228_percolate")
    assert("Scan parquet".r.findAllIn(p).size == 1, p)
  }

  test("q165: geo pairs join on grid cells — never a cartesian product") {
    val p = plan("q165_geo_pairs")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q172: percentile ranks run on the distinct-cents frame, not raw events") {
    val p = plan("q172_group_percentiles")
    // the window's input must be an aggregate (the (type, cents) count),
    // so a partial/final HashAggregate pair appears BELOW the Window
    val widx = p.indexOf("Window")
    assert(widx > 0, p)
    assert(p.indexOf("HashAggregate", widx) > 0 ||
      p.substring(widx).contains("Aggregate"), p)
  }

  test("q176: PMF overlap totals broadcast back onto the count frame") {
    val p = plan("q176_hist_overlap")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q169: KS argmax is heap-bounded (TakeOrdered), not a global sort") {
    val p = plan("q169_value_drift")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q181: compiled kuery predicates push to the parquet scan") {
    val p = plan("q181_kuery_search")
    assert(p.contains("EqualTo(lang,en)"), p)
    assert(p.contains("StringContains(text,slow)"), p)
    // only the referenced columns are read
    assert(p.contains("ReadSchema: struct<text:string,lang:string,n_chars:bigint>"), p)
  }

  test("q183: packing groups by shard with a spillable in-group sort") {
    val p = plan("q183_next_fit_pack")
    // flatMapSortedGroups plans MapGroups over a Sort WITHIN the
    // shard-keyed exchange — not a global sort, not an in-memory buffer
    assert(p.contains("MapGroups"), p)
    assert(p.contains("Sort ["), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q184/q187: prefix-sum offsets broadcast; no single-partition data window") {
    for (q <- Seq("q184_budget_select", "q187_quality_sweep")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), s"$q:\n$p")
      assert(!p.contains("SortMergeJoin"), s"$q:\n$p")
    }
  }

  test("q192: exact and ANN sides both broadcast the query set") {
    val p = plan("q192_ann_recall")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q207/q209: fg/bg and rare-term totals ride ONE scan + a 1-row broadcast") {
    for (q <- Seq("q207_significant_terms", "q209_rare_terms")) {
      val p = plan(q)
      // the foreground/threshold split is a row-local predicate and the
      // term-count frame is cached — both references hit the cache, the
      // events scan runs once (the plan STRING prints the cached subtree
      // under each InMemoryTableScan, so assert the cache, not the count)
      assert(p.contains("InMemoryTableScan"), s"$q:\n$p")
      assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
        s"$q:\n$p")
      assert(!p.contains("SortMergeJoin"), s"$q:\n$p")
    }
  }

  test("q207: top-k significance is heap-bounded, not globally sorted") {
    val p = plan("q207_significant_terms")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q208/q210: matrix cells and rate metrics are one partial hash agg") {
    for (q <- Seq("q208_adjacency_matrix", "q210_rate_weighted")) {
      val p = plan(q)
      assert("Scan parquet".r.findAllIn(p).size == 1, s"$q:\n$p")
      assert(p.contains("partial"), s"$q:\n$p")
    }
  }

  test("q214: pair explosion stays row-local; top-20 is heap-bounded") {
    val p = plan("q214_bpe_pairs")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("Generate"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q216: per-lang ranks come from a range sort + broadcast offsets") {
    val p = plan("q216_curriculum_interleave")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
    assert(p.contains("TakeOrderedAndProject") || p.contains("Sort ["), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q188: straggler windows run on the (stage, dur) aggregate, not raw events") {
    val p = plan("q188_straggler_audit")
    val widx = p.indexOf("Window")
    assert(widx > 0, p)
    assert(p.indexOf("HashAggregate", widx) > 0 ||
      p.substring(widx).contains("Aggregate"), p)
  }

  test("q275: panel survivor joins broadcast; no sort-merge, no cartesian") {
    val p = plan("q275_panel_full")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q276: imported panels reuse the persisted leaf frame per metric branch") {
    val p = plan("q276_saved_objects")
    assert(p.contains("InMemoryTableScan") || p.contains("InMemoryRelation"),
      s"leaf/kept persist lost — each union branch re-runs the fact agg:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q275: the global percentile rank never windows the raw value domain") {
    val p = plan("q275_panel_full")
    // the two-phase shape: intra-bucket running sum partitions by the
    // deterministic coarse bucket id; the only unpartitioned windows
    // run over the ≤1025-row per-bucket totals
    assert(p.contains("windowspecdefinition(__bk"),
      s"expected the PrefixSum.valueDomainCumsum intra window:\n$p")
    assert(!"windowspecdefinition\\(v#\\d+".r.findFirstIn(p).isDefined,
      s"distinct-cents frame must not funnel through one task:\n$p")
  }

  test("q276: per-path percentile cumsum partitions by (path, value bucket)") {
    val p = plan("q276_saved_objects")
    // keyed valueDomainCumsum: the intra running sum partitions by the
    // full label path PLUS the coarse value bucket — a single hot
    // path's distinct-value domain never funnels through one task
    assert("windowspecdefinition\\(__b0#\\d+, __b1#\\d+, __bk#\\d+L?, __v#"
      .r.findFirstIn(p).isDefined,
      s"expected the keyed valueDomainCumsum intra window:\n$p")
    assert("windowspecdefinition\\(__b0#\\d+, __b1#\\d+, __v#"
      .r.findFirstIn(p).isEmpty,
      s"per-path window over the raw value domain is the hot-path trap:\n$p")
  }

  test("q278: timeRange panels stay broadcast-only; no sort-merge, no cartesian") {
    val p = plan("q278_panel_timerange")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q279: the saved-search docs table is a single filtered scan") {
    val p = plan("q279_saved_search")
    assert(p.contains("PushedFilters:") &&
      p.contains("EqualTo(event_type,purchase)"),
      s"saved-search kuery must reach the parquet scan:\n$p")
    assert(!p.contains("Exchange"), s"a docs-table projection needs no shuffle:\n$p")
  }

  test("q277: the dashboard phrase filter is pushed into every member panel's scan") {
    val p = plan("q277_dashboard_import")
    assert(p.contains("PushedFilters:") &&
      p.contains("EqualTo(event_type,click)"), p)
    // both member panels (hourly + top_users) scan under the filter
    assert("EqualTo\\(event_type,click\\)".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q281: declared pipeline routes compile to pushed scan filters") {
    val p = plan("q281_pipeline_yaml")
    // the OR'd multi-route sink and the null-safe != both reach parquet
    assert(p.contains(
      "Or(EqualTo(event_type,purchase),EqualTo(event_type,click))"),
      s"multi-route OR must push to the scan:\n$p")
    assert(p.contains("Not(EqualNullSafe(event_type,purchase))"),
      s"null-safe != must push to the scan:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }
}
