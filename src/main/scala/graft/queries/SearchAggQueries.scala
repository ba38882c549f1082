package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.operators.{Composite, SignificantTerms}
import graft.sources.Tables

/** OpenSearch/ES aggregation-parity pack: the dashboard aggs beyond
  * plain terms/date_histogram that the reference's OpenSearch query
  * surface exposes — significant_terms, adjacency_matrix, rare_terms,
  * rate + weighted_avg, moving_fn/serial_diff pipelines, and composite
  * paging. Each rebuilt as exact-integer Spark plans with DuckDB
  * oracles (reference dashboards export:
  * deployment/infra/resources/lambda/opensearch-bootstrap/resources/
  * dashboards/data-skew.ndjson).
  */
object SearchAggQueries {

  // ---------------------------------------------------------------- q207

  // Significant terms: which props-k deciles are over-represented among
  // error events vs the whole stream — the root-cause drill-down agg.
  // JLH score in exact ppm (see SignificantTerms). One hash agg + a
  // 1-row broadcast; top-10 TakeOrdered.
  def q207SignificantTerms(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .withColumn("k", get_json_object($"props", "$.k").cast("long"))
    SignificantTerms.jlh(ev, expr("k div 10"), $"event_type" === "error", 10)
  }

  // ---------------------------------------------------------------- q208

  // Adjacency-matrix agg: named filters a/b/c and every pairwise
  // intersection, counted in ONE conditional-aggregation pass (the ES
  // adjacency_matrix agg; filters are row-local booleans so no filter
  // is ever a separate scan). stack() emits the matrix cells as rows.
  def q208AdjacencyMatrix(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select(
        ($"event_type" === "purchase").as("a"),
        ($"value" >= 100.0).as("b"),
        (get_json_object($"props", "$.k").cast("long") >= 50L).as("c"))
      .agg(
        sum(when($"a", 1L).otherwise(0L)).as("na"),
        sum(when($"b", 1L).otherwise(0L)).as("nb"),
        sum(when($"c", 1L).otherwise(0L)).as("nc"),
        sum(when($"a" && $"b", 1L).otherwise(0L)).as("nab"),
        sum(when($"a" && $"c", 1L).otherwise(0L)).as("nac"),
        sum(when($"b" && $"c", 1L).otherwise(0L)).as("nbc"))
      .select(expr(
        "stack(6, 'a', na, 'a&b', nab, 'a&c', nac, 'b', nb, 'b&c', nbc, 'c', nc)")
        .as(Seq("cell", "n")))
      .orderBy($"cell")
  }

  // ---------------------------------------------------------------- q209

  // Rare-terms agg: the long-tail counterpart of top-k terms — buckets
  // whose doc count is AT MOST max_doc_count. Thresholds are scale-free
  // fractions of the total (half/quarter/full mean over the 100-value
  // term domain) so the query is meaningful at every SF. One term agg
  // (101 rows), a 1-row broadcast total, one stacked conditional pass.
  def q209RareTerms(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // persisted: the total below references the term counts a second
    // time; unpersisted, each reference re-runs the events scan
    val counts = Tables.events(s, dir)
      .withColumn("k", get_json_object($"props", "$.k").cast("long"))
      .filter($"k".isNotNull)
      .groupBy($"k").agg(count(lit(1)).as("c"))
      .persist()
    val tot = counts.agg(sum($"c").as("__tot"))
    val cuts = Seq(400, 200, 100) // divisor → max_doc_count = total div d
    val aggs = cuts.flatMap(d => Seq(
      sum(when($"c" <= expr(s"__tot div $d"), 1L).otherwise(0L)).as(s"t$d"),
      coalesce(sum(when($"c" <= expr(s"__tot div $d"), $"c")), lit(0L)).as(s"s$d"),
      max(expr(s"__tot div $d")).as(s"m$d")))
    val stacked = cuts.map(d => s"m$d, t$d, s$d").mkString(", ")
    counts.crossJoin(broadcast(tot))
      .agg(aggs.head, aggs.tail: _*)
      .select(expr(s"stack(${cuts.size}, $stacked)")
        .as(Seq("max_doc_count", "n_rare_terms", "n_rare_docs")))
      .orderBy($"max_doc_count")
  }

  // ---------------------------------------------------------------- q210

  // Rate + weighted_avg metrics per calendar month of lineitem
  // shipments: the ES rate agg (count normalized per day, here exact
  // ppm over the true month length) and weighted_avg (discount in
  // basis points weighted by quantity, cross-multiplied integer
  // division). One map-side-combinable hash agg.
  def q210RateWeighted(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .select(
        date_format(date_trunc("month", $"l_shipdate"), "yyyy-MM").as("month"),
        dayofmonth(last_day($"l_shipdate")).cast("long").as("days"),
        floor($"l_discount" * 10000).cast("long").as("disc_bp"),
        $"l_quantity".cast("long").as("qty"))
      .groupBy($"month", $"days")
      .agg(
        count(lit(1)).as("n"),
        sum($"disc_bp" * $"qty").as("__dw"),
        sum($"qty").as("__q"))
      .select($"month", $"n",
        expr("n * 1000000 div days").as("rate_per_day_ppm"),
        expr("__dw div __q").as("w_avg_disc_bp"))
      .orderBy($"month")
  }

  // ---------------------------------------------------------------- q211

  // moving_fn / serial_diff pipeline aggs from panel specs: a trailing
  // 3-day moving average of view traffic and a lag-7 serial difference
  // of clicks (the week-over-week daily delta), both over the daily
  // bucket series — windows never see raw rows.
  def q211PanelMoving(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val specs = Seq(
      """{"panel": "p1_view_movavg", "kuery": "event_type.keyword: view",
        | "agg": "date_histogram", "field": "ts", "pipeline": "moving_avg"}""".stripMargin,
      """{"panel": "p2_click_wow", "kuery": "event_type.keyword: click",
        | "agg": "date_histogram", "field": "ts", "pipeline": "serial_diff",
        | "lag": 7}""".stripMargin)
    specs.map(graft.search.PanelSpec.run(ev, _))
      .reduce(_.unionAll(_))
      .orderBy($"panel", $"bucket")
  }

  // ---------------------------------------------------------------- q212

  // Composite-agg paging: (event_type, day) buckets walked in keyset
  // order, 3 pages of 40 resuming from each page's after-key — the agg
  // that scales past one response. The page walk is a bounded driver
  // round-trip (≤ 40 rows per collect) over a persisted bucket frame;
  // the oracle replays it as a global rank, which is equivalent iff the
  // after-key filter is correct.
  def q212CompositePages(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val buckets = Tables.events(s, dir)
      .groupBy($"event_type",
        expr("unix_millis(ts) div 86400000").as("day"))
      .agg(count(lit(1)).as("n"),
        coalesce(sum(floor($"value" * 100).cast("long")), lit(0L)).as("cents"))
    Composite.pages(buckets, Seq("event_type", "day"), 40, 3)
      .orderBy($"page", $"event_type", $"day")
  }

  // ---------------------------------------------------------------- q218

  // Geo-grid bucket agg at two zoom levels (the ES geohash_grid
  // precision ladder) over the deterministic user lattice (q165's
  // coordinates): ONE data-scale aggregation to the fine grid, the
  // coarse level re-aggregated from the fine CELL frame (coarse cell =
  // fine cell div 3 — cells nest exactly), top-10 cells per level.
  // Windows only ever see the bounded cell frame.
  def q218GeoGridBuckets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val fine = Tables.events(s, dir)
      .filter($"user_id".isNotNull && $"user_id" >= 0)
      .select($"user_id").distinct()
      .select(expr("((user_id * 7919) % 180000) div 10000").as("cx"),
        expr("((user_id * 104729) % 360000) div 20000").as("cy"))
      .groupBy($"cx", $"cy").agg(count(lit(1)).as("n"))
      .persist() // referenced by both zoom levels
    val coarse = fine
      .groupBy(expr("cx div 3").as("cx"), expr("cy div 3").as("cy"))
      .agg(sum($"n").as("n"))
    val w = Window.partitionBy($"precision")
      .orderBy($"n".desc, $"cx", $"cy")
    fine.withColumn("precision", lit("fine"))
      .unionAll(coarse.withColumn("precision", lit("coarse")))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 10).drop("rk")
      .select($"precision", $"cx", $"cy", $"n")
      .orderBy($"precision", $"n".desc, $"cx", $"cy")
  }

  // ---------------------------------------------------------------- q220

  // Cumulative-cardinality pipeline agg: total distinct users seen up
  // to each day. NEVER a per-window distinct (that re-counts every
  // prefix): each user collapses to their FIRST day in one hash agg,
  // then a running sum over the bounded daily bucket frame — the only
  // shape that survives 100 TB (state = one row per user, then one row
  // per day). Days with no new users still emit a bucket.
  def q220CumulativeCardinality(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .filter($"user_id".isNotNull)
      .select($"user_id", expr("unix_millis(ts) div 86400000").as("day"))
    val firsts = ev.groupBy($"user_id").agg(min($"day").as("day"))
      .groupBy($"day").agg(count(lit(1)).as("new_users"))
    val w = Window.orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.select($"day").distinct()
      .join(firsts, Seq("day"), "left")
      .withColumn("new_users", coalesce($"new_users", lit(0L)))
      .withColumn("cum_users", sum($"new_users").over(w))
      .orderBy($"day")
  }

  // ---------------------------------------------------------------- q221

  // Boxplot agg per event type over value cents: exact type-1 lower
  // quantiles (q_p = value at rank ceil(p·n), integer rank arithmetic —
  // the q172 two-phase shape: quantiles read the (type × distinct-cent)
  // COUNT frame, never a row-per-event window), Tukey fences at
  // q1/q3 ∓ (3·IQR) div 2, and the outlier count outside them.
  def q221Boxplot(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val counts = Tables.events(s, dir)
      .filter($"value".isNotNull)
      .groupBy($"event_type", floor($"value" * 100).cast("long").as("cents"))
      .agg(count(lit(1)).as("c"))
      .persist() // read twice: quantile ranks + outlier recount
    val wc = Window.partitionBy($"event_type").orderBy($"cents")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ns = counts.groupBy($"event_type").agg(sum($"c").as("n"))
    val fences = counts.withColumn("cum", sum($"c").over(wc))
      .join(broadcast(ns), "event_type")
      .groupBy($"event_type", $"n").agg(
        min($"cents").as("vmin"),
        min(when($"cum" >= expr("(n + 3) div 4"), $"cents")).as("q1"),
        min(when($"cum" >= expr("(n + 1) div 2"), $"cents")).as("q2"),
        min(when($"cum" >= expr("(3 * n + 3) div 4"), $"cents")).as("q3"),
        max($"cents").as("vmax"))
      .withColumn("iqr", $"q3" - $"q1")
      .withColumn("lo", $"q1" - expr("(3 * iqr) div 2"))
      .withColumn("hi", $"q3" + expr("(3 * iqr) div 2"))
    val outliers = counts
      .join(broadcast(fences.select($"event_type", $"lo", $"hi")), "event_type")
      .groupBy($"event_type").agg(
        coalesce(sum(when($"cents" < $"lo" || $"cents" > $"hi", $"c")),
          lit(0L)).as("n_outliers"))
    fences.join(outliers, Seq("event_type"))
      .select($"event_type", $"n", $"vmin", $"q1", $"q2", $"q3", $"vmax",
        $"iqr", $"n_outliers")
      .orderBy($"event_type")
  }

  // ---------------------------------------------------------------- q222

  // multi_terms agg ORDERED BY A SUB-AGG METRIC: top-10 composite
  // (event_type, k-decile) buckets by total revenue cents — the ES
  // multi_terms + order:{metric:desc} form. One map-side-combinable
  // hash agg, then a global TakeOrdered 10 (never a full sort).
  def q222MultiTerms(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .withColumn("k", get_json_object($"props", "$.k").cast("long"))
      .filter($"k".isNotNull)
      .groupBy($"event_type", expr("k div 10").as("k_decile"))
      .agg(count(lit(1)).as("n"),
        coalesce(sum(floor($"value" * 100).cast("long")), lit(0L)).as("cents"))
      .orderBy($"cents".desc, $"event_type", $"k_decile")
      .limit(10)
  }

  // ---------------------------------------------------------------- q223

  // Filters agg + bucket_script: three NAMED predicate buckets counted
  // per day in ONE conditional-aggregation scan (a filters agg never
  // becomes three scans), then a bucket_script sibling metric — errors
  // per purchase in ppm, NULL where the denominator bucket is empty.
  def q223FiltersBucketScript(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy(expr("unix_millis(ts) div 86400000").as("day"))
      .agg(
        sum(when($"event_type" === "error", 1L).otherwise(0L)).as("errors"),
        sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("purchases"),
        sum(when($"value" >= 500.0, 1L).otherwise(0L)).as("high_value"))
      .withColumn("err_per_purchase_ppm",
        expr("CASE WHEN purchases > 0 THEN errors * 1000000 div purchases END"))
      .orderBy($"day")
  }

  // ---------------------------------------------------------------- q224

  // Moving-extrema pipeline aggs over the daily purchase-revenue
  // series: running peak, drawdown from peak in ppm, and trailing-7-day
  // max/min (the moving_fn max/min panel family). Windows only ever
  // see the bounded daily bucket frame; revenue is exact cents.
  def q224MovingExtrema(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = Tables.events(s, dir)
      .filter($"event_type" === "purchase" && $"value".isNotNull)
      .groupBy(expr("unix_millis(ts) div 86400000").as("day"))
      .agg(sum(floor($"value" * 100).cast("long")).as("cents"))
    val wAll = Window.orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val w7 = Window.orderBy($"day")
      .rowsBetween(-6, Window.currentRow)
    daily
      .withColumn("peak", max($"cents").over(wAll))
      .withColumn("drawdown_ppm",
        expr("(peak - cents) * 1000000 div peak"))
      .withColumn("hi7", max($"cents").over(w7))
      .withColumn("lo7", min($"cents").over(w7))
      .orderBy($"day")
  }

  // ---------------------------------------------------------------- q231

  // significant_text agg: which TOKENS are over-represented in the
  // German slice of the corpus vs the whole corpus — q207's JLH scorer
  // fed doc-distinct tokens (ES counts a term once per doc, so terms
  // explode through array_distinct before the one hash agg).
  def q231SignificantText(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = Tables.documents(s, dir)
      .select($"lang",
        explode(array_distinct(split(trim($"text"), "\\s+"))).as("term"))
    SignificantTerms.jlh(toks, $"term", $"lang" === "de", 10)
  }

  // ---------------------------------------------------------------- q232

  // top_hits agg: the 3 most recent full event rows per event type.
  // NEVER a row-per-event window partitioned by the 5-value type (the
  // low-cardinality-partition trap): phase 1 finds each type's 3rd-
  // latest distinct timestamp on the (type × distinct-ts) COUNT frame
  // (q172's value-domain shape), phase 2 joins the broadcast threshold
  // back and keeps rows at-or-after it — a bounded frame on which the
  // final rank window is exact (ties broken by event_id desc).
  def q232TopHits(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .select($"event_type", $"event_id", $"user_id",
        expr("unix_millis(ts)").as("ms"))
    val wc = Window.partitionBy($"event_type").orderBy($"ms".desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cut = ev.groupBy($"event_type", $"ms").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum($"c").over(wc))
      .groupBy($"event_type")
      .agg(min(when($"cum" >= 3L, $"ms")).as("cut_ms"))
    val w = Window.partitionBy($"event_type")
      .orderBy($"ms".desc, $"event_id".desc)
    ev.join(broadcast(cut), Seq("event_type"))
      .filter($"ms" >= coalesce($"cut_ms", lit(Long.MinValue)))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= 3L)
      .select($"event_type", $"rk", $"event_id", $"user_id", $"ms")
      .orderBy($"event_type", $"rk")
  }

  // ---------------------------------------------------------------- q236

  // Term suggester (did-you-mean): each misspelled query term gets the
  // best vocabulary correction within edit distance 1, ranked by
  // (distance, corpus frequency desc, term). Candidates come from the
  // deletion-neighborhood join (never |Q|×|V|); the ranking window
  // sees only the tiny candidate frame. Oracle brute-forces
  // levenshtein over the whole vocabulary.
  def q236Suggest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val vocab = Tables.documents(s, dir)
      .select(explode(split(trim($"text"), "\\s+")).as("term"))
      .filter(length($"term") > 0)
      .groupBy($"term").agg(count(lit(1)).as("freq"))
      .persist() // candidate join + frequency lookup
    val qs = Seq("spak", "vectr", "merg", "windw", "quer").toDF("query")
    val cands = graft.text.FuzzyJoin
      .editDistance1Join(qs, "query", vocab.select($"term"), "term")
      .withColumnRenamed("q", "query")
      .join(broadcast(vocab), $"v" === $"term")
    val w = Window.partitionBy($"query")
      .orderBy($"dist", $"freq".desc, $"term")
    cands.withColumn("rk", row_number().over(w))
      .filter($"rk" === 1)
      .select($"query", $"term".as("suggestion"),
        $"dist".cast("long").as("dist"), $"freq")
      .orderBy($"query")
  }

  // ---------------------------------------------------------------- q237

  // terms_set query (minimum_should_match ladder): documents matching
  // at least m of the 3 given terms, for every m, counted in ONE scan —
  // the match count is a row-local sum of contains flags, the ladder a
  // stacked conditional agg (q209's shape).
  def q237TermsSet(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tk = array_distinct(split(trim($"text"), "\\s+"))
    val m = Seq("spark", "join", "merge")
      .map(t => array_contains(tk, t).cast("long"))
      .reduce(_ + _)
    Tables.documents(s, dir)
      .select(m.as("m"), $"n_chars")
      .agg(
        sum(when($"m" >= 1L, 1L).otherwise(0L)).as("n1"),
        coalesce(sum(when($"m" >= 1L, $"n_chars")), lit(0L)).as("s1"),
        sum(when($"m" >= 2L, 1L).otherwise(0L)).as("n2"),
        coalesce(sum(when($"m" >= 2L, $"n_chars")), lit(0L)).as("s2"),
        sum(when($"m" >= 3L, 1L).otherwise(0L)).as("n3"),
        coalesce(sum(when($"m" >= 3L, $"n_chars")), lit(0L)).as("s3"))
      .select(expr(
        "stack(3, CAST(1 AS BIGINT), n1, s1, CAST(2 AS BIGINT), n2, s2, " +
          "CAST(3 AS BIGINT), n3, s3)")
        .as(Seq("min_match", "n_docs", "sum_chars")))
      .orderBy($"min_match")
  }

  // ---------------------------------------------------------------- q241

  // span_near proximity search: doc matches (a, b, k) iff some
  // occurrence of b follows an occurrence of a within k tokens —
  // ordered, in_order=true. Three span configs evaluated in ONE scan:
  // per-term position lists and the pair-gap existence check are
  // row-local nested HOFs; the oracle replays positions as rows and
  // joins (no nested-lambda dependence on the DuckDB side).
  def q241SpanNear(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val configs = Seq(("merge", "join", 3), ("batch", "stream", 2),
      ("slow", "query", 5))
    def positions(t: String) =
      s"""filter(transform(sequence(0, size(toks) - 1),
         |  i -> CASE WHEN toks[i] = '$t' THEN i END), x -> x IS NOT NULL)"""
        .stripMargin
    val flagged = configs.zipWithIndex.foldLeft(
      Tables.documents(s, dir)
        .withColumn("toks", split(trim($"text"), "\\s+"))) {
      case (df, ((a, b, k), i)) =>
        df.withColumn(s"m$i", expr(
          s"exists(${positions(b)}, j -> exists(${positions(a)}, " +
            s"i2 -> j - i2 >= 1 AND j - i2 <= $k))"))
    }
    val aggs = configs.indices.flatMap(i => Seq(
      sum(when(col(s"m$i"), 1L).otherwise(0L)).as(s"n$i"),
      min(when(col(s"m$i"), $"doc_id")).as(s"f$i")))
    val stacked = configs.zipWithIndex.map { case ((a, b, k), i) =>
      s"'$a>$b~$k', n$i, coalesce(f$i, CAST(-1 AS BIGINT))"
    }.mkString(", ")
    flagged.agg(aggs.head, aggs.tail: _*)
      .select(expr(s"stack(${configs.size}, $stacked)")
        .as(Seq("span", "n_docs", "first_doc")))
      .orderBy($"span")
  }

  // ---------------------------------------------------------------- q242

  // Search-hit highlighting: for every doc containing 'spark', the
  // 0-based position of its FIRST occurrence and the ±2-token snippet
  // around it (compared by md5 — the exact highlight window, clamped
  // at both document edges). Row-local; the only shuffle is the
  // output sort.
  def q242Highlight(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .withColumn("toks", split(trim($"text"), "\\s+"))
      .withColumn("pos", expr(
        """array_min(filter(transform(sequence(0, size(toks) - 1),
          |  i -> CASE WHEN toks[i] = 'spark' THEN i END),
          |  x -> x IS NOT NULL))""".stripMargin))
      .filter($"pos".isNotNull)
      .withColumn("lo", greatest($"pos" - 2, lit(0)))
      .withColumn("hi", least($"pos" + 2, size($"toks") - 1))
      .select($"doc_id", $"pos".cast("long").as("pos"),
        md5(expr(
          "array_join(transform(sequence(lo, hi), i -> toks[i]), ' ')"))
          .as("snippet_md5"))
      .orderBy($"doc_id")
  }

  // ---------------------------------------------------------------- q251

  // more_like_this: for each of 3 seed documents, the top-5 other docs
  // by shared-distinct-token count. Seed token sets are 3 bounded
  // driver rows (metadata scale) re-broadcast as literals, overlap is
  // a row-local array_intersect over one corpus scan per seed, and
  // each per-seed top-5 is a TakeOrdered — NEVER a 3-partition window
  // over the whole corpus.
  def q251MoreLikeThis(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
      .select($"doc_id", array_distinct(split(trim($"text"), "\\s+")).as("tk"))
    val seedIds = Seq(3L, 17L, 42L)
    seedIds.map { id =>
      val stk = docs.filter($"doc_id" === id)
        .select($"tk").as[Seq[String]].head() // 1-row driver literal
      docs.filter($"doc_id" =!= id)
        .select(lit(id).as("seed_id"), $"doc_id",
          size(array_intersect($"tk", typedLit(stk))).cast("long").as("shared"))
        .filter($"shared" > 0L)
        .orderBy($"shared".desc, $"doc_id")
        .limit(5)
    }.reduce(_.unionAll(_)).orderBy($"seed_id", $"shared".desc, $"doc_id")
  }

  // ---------------------------------------------------------------- q253

  // date_range agg with keyed ranges + the missing bucket: events
  // bucketed into named [from, to) day ranges relative to the stream's
  // first day (scale-free), plus the ES `missing` bucket for rows with
  // no user — all from ONE conditional-agg pass against a 1-row
  // broadcast origin.
  def q253DateRange(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .select(expr("unix_millis(ts) div 86400000").as("day"), $"user_id")
    val origin = ev.agg(min($"day").as("d0"))
    val ranges = Seq(("week1", 0, 7), ("week2", 7, 14), ("rest", 14, 100000))
    val aggs = ranges.map { case (nm, lo, hi) =>
      sum(when($"day" - $"d0" >= lo && $"day" - $"d0" < hi, 1L)
        .otherwise(0L)).as(s"n_$nm")
    } :+ sum(when($"user_id".isNull, 1L).otherwise(0L)).as("n_missing")
    val stacked = (ranges.map { case (nm, _, _) => s"'$nm', n_$nm" } :+
      "'zz_missing_user', n_missing").mkString(", ")
    ev.crossJoin(broadcast(origin))
      .agg(aggs.head, aggs.tail: _*)
      .select(expr(s"stack(${ranges.size + 1}, $stacked)")
        .as(Seq("bucket", "n")))
      .orderBy($"bucket")
  }

  // ---------------------------------------------------------------- q254

  // Counter-reset-aware rate (the PromQL increase() primitive): each
  // user's running cents counter is sampled modulo 100 000 (a rollover
  // counter — every synthetic event is < $1000, so one event can never
  // wrap a full cycle), and increase() reconstructs the true total
  // from consecutive samples: delta if the counter advanced, the new
  // value after a reset. The reconstruction must equal the true sum
  // EXACTLY — emitted as a per-user match flag the oracle asserts.
  // Per-user lag windows partition on the high-cardinality user key.
  def q254CounterRate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ms", $"event_id")
    val wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sampled = Tables.events(s, dir)
      .filter($"user_id".isNotNull && $"value".isNotNull)
      .select($"user_id", $"event_id", unix_millis($"ts").as("ms"),
        floor($"value" * 100).cast("long").as("cents"))
      .withColumn("counter", expr("sum(cents) OVER (PARTITION BY user_id " +
        "ORDER BY ms, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND " +
        "CURRENT ROW) % 100000"))
      .withColumn("prev", lag($"counter", 1).over(w))
    sampled
      .withColumn("inc", expr(
        """CASE WHEN prev IS NULL THEN counter
          |     WHEN counter >= prev THEN counter - prev
          |     ELSE counter + 100000 - prev END""".stripMargin))
      .groupBy($"user_id")
      .agg(sum($"cents").as("true_total"),
        sum($"inc").as("reconstructed"))
      .withColumn("exact", $"true_total" === $"reconstructed")
      .orderBy($"user_id")
  }

  // ---------------------------------------------------------------- q275

  // The reference dashboards' FULL panel vocabulary replayed from saved
  // specs (data-skew.ndjson lines 3-4, 8-11, 18-20, 24-25): cardinality,
  // percentiles, range buckets (with an empty bucket emitted n=0), a
  // max-metric date_histogram, 3-level nested terms with per-level top-k
  // order, and an avg-metric terms panel — six JSON panel definitions
  // structurally identical to the reference's saved objects, interpreted
  // by search.PanelSpec into one normalized (panel, bucket, n, val)
  // frame. The oracle replays every panel as plain SQL.
  def q275PanelFull(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val specs = Seq(
      """{"panel": "p1_click_users", "kuery": "event_type.keyword: click",
        | "agg": "cardinality", "field": "user_id"}""".stripMargin,
      """{"panel": "p2_value_pct", "agg": "percentiles", "metric": "value",
        | "percents": [50, 95, 99]}""".stripMargin,
      """{"panel": "p3_value_ranges", "agg": "range", "field": "value",
        | "ranges": [{"to": 100}, {"from": 100, "to": 500}, {"from": 500}]}""".stripMargin,
      """{"panel": "p4_daily_max", "agg": "date_histogram", "field": "ts",
        | "interval_ms": 86400000, "metric_agg": "max"}""".stripMargin,
      """{"panel": "p5_nested", "kuery": "user_id >= 0",
        | "agg": "nested_terms", "fields": ["event_type", "user_id", "event_id"],
        | "sizes": [3, 2, 2]}""".stripMargin,
      """{"panel": "p6_type_avg", "agg": "terms", "field": "event_type",
        | "size": 4, "metric_agg": "avg"}""".stripMargin)
    specs.map(graft.search.PanelSpec.run(ev, _))
      .reduce(_.unionAll(_))
      .orderBy($"panel", $"bucket")
  }

  // ---------------------------------------------------------------- q276

  // Saved-object IMPORT: four ndjson lines in the exported-dashboard
  // format (type/attributes/visState-as-JSON-string/searchSourceJSON —
  // the reference's data-skew.ndjson schema) plus an index-pattern and
  // an input_control_vis line that must skip gracefully, executed by
  // search.SavedObjects.runNdjson into one normalized
  // (panel, bucket, metric, val) frame. Covers the export's whole agg
  // vocabulary: metric-only cardinality, cardinality-over-range (pie),
  // sum+max+avg+percentiles under 2-level metric-ordered terms (table),
  // and cardinality over an auto-interval date_histogram (line — the
  // 30-day span resolves to the ladder's daily rung; the oracle
  // REPLAYS the ladder selection from the data span — both the fixed
  // rungs and the month/quarter/year calendar fallback — so a
  // dataset-generation change can't silently break the gate).
  def q276SavedObjects(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val lines = Seq(
      """{"type":"index-pattern","attributes":{"title":"events*"}}""",
      """{"type":"visualization","attributes":{"title":"ctl","visState":"{\"type\":\"input_control_vis\",\"params\":{\"controls\":[]}}"}}""",
      """{"type":"visualization","attributes":{"title":"n1_purchasers","visState":"{\"type\":\"metric\",\"aggs\":[{\"id\":\"1\",\"enabled\":true,\"type\":\"cardinality\",\"params\":{\"field\":\"user_id\",\"customLabel\":\"purchasers\"},\"schema\":\"metric\"}]}","kibanaSavedObjectMeta":{"searchSourceJSON":"{\"query\":{\"query\":\"event_type.keyword: purchase\",\"language\":\"kuery\"},\"filter\":[]}"}}}""",
      """{"type":"visualization","attributes":{"title":"n2_value_ranges","visState":"{\"type\":\"pie\",\"aggs\":[{\"id\":\"1\",\"enabled\":true,\"type\":\"cardinality\",\"params\":{\"field\":\"user_id\"},\"schema\":\"metric\"},{\"id\":\"3\",\"enabled\":true,\"type\":\"range\",\"params\":{\"field\":\"value\",\"ranges\":[{\"from\":0,\"to\":100},{\"from\":100,\"to\":500},{\"from\":500}]},\"schema\":\"segment\"}]}","kibanaSavedObjectMeta":{"searchSourceJSON":"{\"query\":{\"query\":\"\",\"language\":\"kuery\"},\"filter\":[]}"}}}""",
      """{"type":"visualization","attributes":{"title":"n3_breakdown","visState":"{\"type\":\"table\",\"aggs\":[{\"id\":\"1\",\"enabled\":true,\"type\":\"sum\",\"params\":{\"field\":\"value\",\"customLabel\":\"total\"},\"schema\":\"metric\"},{\"id\":\"2\",\"enabled\":true,\"type\":\"max\",\"params\":{\"field\":\"value\",\"customLabel\":\"peak\"},\"schema\":\"metric\"},{\"id\":\"3\",\"enabled\":true,\"type\":\"percentiles\",\"params\":{\"field\":\"value\",\"percents\":[50,99],\"customLabel\":\"pct\"},\"schema\":\"metric\"},{\"id\":\"6\",\"enabled\":true,\"type\":\"avg\",\"params\":{\"field\":\"value\",\"customLabel\":\"mean\"},\"schema\":\"metric\"},{\"id\":\"4\",\"enabled\":true,\"type\":\"terms\",\"params\":{\"field\":\"event_type\",\"orderBy\":\"1\",\"order\":\"desc\",\"size\":3},\"schema\":\"bucket\"},{\"id\":\"5\",\"enabled\":true,\"type\":\"terms\",\"params\":{\"field\":\"user_id\",\"orderBy\":\"1\",\"order\":\"desc\",\"size\":2},\"schema\":\"bucket\"}]}"}}""",
      """{"type":"visualization","attributes":{"title":"n4_daily_users","visState":"{\"type\":\"line\",\"aggs\":[{\"id\":\"1\",\"enabled\":true,\"type\":\"cardinality\",\"params\":{\"field\":\"user_id\"},\"schema\":\"metric\"},{\"id\":\"2\",\"enabled\":true,\"type\":\"date_histogram\",\"params\":{\"field\":\"@timestamp\",\"interval\":\"auto\"},\"schema\":\"segment\"}]}"}}""")
    graft.search.SavedObjects.runNdjson(ev, lines,
        fieldAliases = Map("@timestamp" -> "ts"))
      .orderBy($"panel", $"bucket", $"metric")
  }

  // ---------------------------------------------------------------- q277

  // DASHBOARD-granularity import: a `type:"dashboard"` saved object in
  // the exported format (appState match_phrase filter array +
  // panelsJSON references — the reference export's data-skew.ndjson
  // lines 16/34 shape, which scope every member panel to one
  // application) resolved through its panel_N → id references and
  // executed by search.SavedObjects.runDashboards. Gates three round-7
  // behaviors at once: the dashboard phrase filter composes onto every
  // member panel; `"interval":"auto"` resolves through the normalized
  // OpenSearch ladder from the FILTERED frame's time range (the 2-day
  // panel kuery forces the 1-hour rung — fixed daily would emit 2
  // buckets, not ~48; the oracle replays the ladder selection itself so
  // the gate is scale-free); and avg metrics divide by the non-null
  // count with Σsum/Σcount ordering. The unreferenced visualization
  // (id v9) must NOT run at dashboard granularity.
  def q277DashboardImport(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val lines = Seq(
      """{"type":"index-pattern","attributes":{"title":"events*"}}""",
      """{"type":"dashboard","attributes":{"title":"skew","kibanaSavedObjectMeta":{"searchSourceJSON":"{\"query\":{\"query\":\"\",\"language\":\"kuery\"},\"filter\":[{\"meta\":{\"negate\":false,\"disabled\":false,\"key\":\"event_type.keyword\",\"type\":\"phrase\"},\"query\":{\"match_phrase\":{\"event_type.keyword\":\"click\"}}},{\"meta\":{\"negate\":false,\"disabled\":true},\"query\":{\"match_phrase\":{\"event_type.keyword\":\"ignored-disabled\"}}}]}"}},"references":[{"id":"ip1","name":"kibanaSavedObjectMeta.searchSourceJSON.filter[0].meta.index","type":"index-pattern"},{"id":"v1","name":"panel_0","type":"visualization"},{"id":"v2","name":"panel_1","type":"visualization"}]}""",
      """{"type":"visualization","id":"v1","attributes":{"title":"hourly","visState":"{\"type\":\"histogram\",\"aggs\":[{\"id\":\"1\",\"enabled\":true,\"type\":\"sum\",\"params\":{\"field\":\"value\",\"customLabel\":\"total\"},\"schema\":\"metric\"},{\"id\":\"2\",\"enabled\":true,\"type\":\"date_histogram\",\"params\":{\"field\":\"@timestamp\",\"interval\":\"auto\",\"useNormalizedOpenSearchInterval\":true},\"schema\":\"segment\"}]}","kibanaSavedObjectMeta":{"searchSourceJSON":"{\"query\":{\"query\":\"ts >= 2024-01-03 and ts < 2024-01-05\",\"language\":\"kuery\"},\"filter\":[]}"}}}""",
      """{"type":"visualization","id":"v2","attributes":{"title":"top_users","visState":"{\"type\":\"table\",\"aggs\":[{\"id\":\"1\",\"enabled\":true,\"type\":\"avg\",\"params\":{\"field\":\"value\",\"customLabel\":\"mean\"},\"schema\":\"metric\"},{\"id\":\"2\",\"enabled\":true,\"type\":\"min\",\"params\":{\"field\":\"value\",\"customLabel\":\"low\"},\"schema\":\"metric\"},{\"id\":\"3\",\"enabled\":true,\"type\":\"terms\",\"params\":{\"field\":\"user_id\",\"orderBy\":\"1\",\"order\":\"desc\",\"size\":3},\"schema\":\"bucket\"}]}"}}""",
      """{"type":"visualization","id":"v9","attributes":{"title":"orphan","visState":"{\"type\":\"metric\",\"aggs\":[{\"id\":\"1\",\"enabled\":true,\"type\":\"count\",\"params\":{},\"schema\":\"metric\"}]}"}}""")
    graft.search.SavedObjects.runDashboards(ev, lines,
        fieldAliases = Map("@timestamp" -> "ts"))
      .orderBy($"panel", $"bucket", $"metric")
  }

  // ---------------------------------------------------------------- q278

  // Saved panel-level timeRange import: the reference's four
  // time-series panels embed a RELATIVE window inside the
  // date_histogram agg params (`"timeRange":{"from":"now-6M","to":
  // "now"}` — data-skew.ndjson lines 19/20/24/25) that must cut the
  // data to [now − interval, now] AND drive the auto-interval rung
  // from the RANGE's span (pure arithmetic — no min/max scan), not the
  // full data span. Two panels against an injected now (2024-01-10
  // over the 30-day events period, so the window cuts on both sides):
  // "recent" (now-7d, sum metric) — 7 d span → need 12096 s → the
  // 12 h rung, where the data-span resolution would pick daily; and
  // "longview" (now-1y, implied count) — 365 d span → need 630720 s
  // overflows the fixed ladder → the calendar month rung. The oracle
  // replays the window cut (same INTERVAL arithmetic) and the ladder
  // selection from the range literals.
  def q278PanelTimerange(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val now = java.sql.Timestamp.from(
      java.time.Instant.parse("2024-01-10T00:00:00Z"))
    val lines = Seq(
      """{"type":"visualization","attributes":{"title":"recent","visState":"{\"type\":\"histogram\",\"aggs\":[{\"id\":\"1\",\"enabled\":true,\"type\":\"sum\",\"params\":{\"field\":\"value\",\"customLabel\":\"total\"},\"schema\":\"metric\"},{\"id\":\"2\",\"enabled\":true,\"type\":\"date_histogram\",\"params\":{\"field\":\"@timestamp\",\"interval\":\"auto\",\"timeRange\":{\"from\":\"now-7d\",\"to\":\"now\"},\"useNormalizedOpenSearchInterval\":true,\"drop_partials\":false},\"schema\":\"segment\"}]}"}}""",
      """{"type":"visualization","attributes":{"title":"longview","visState":"{\"type\":\"line\",\"aggs\":[{\"id\":\"2\",\"enabled\":true,\"type\":\"date_histogram\",\"params\":{\"field\":\"@timestamp\",\"interval\":\"auto\",\"timeRange\":{\"from\":\"now-1y\",\"to\":\"now\"}},\"schema\":\"segment\"}]}"}}""")
    graft.search.SavedObjects.runNdjson(ev, lines,
        fieldAliases = Map("@timestamp" -> "ts"), now = Some(now))
      .orderBy($"panel", $"bucket", $"metric")
  }

  // ---------------------------------------------------------------- q279

  // Saved-search DOCS TABLE: a `type:"search"` line in the exported
  // format (the reference's "Spark Logs" object, data-skew.ndjson line
  // 14, is a Kibana docs table — columns + sort + kuery, NOT a count)
  // imported by SavedObjects.parseSearchLine and executed by runSearch:
  // kuery filter + saved column projection ("sort":[] exactly like the
  // export — sort semantics are spec-gated; a sortless search is one
  // pushdown-filtered scan with zero exchanges). The oracle is the
  // same SELECT in SQL; the driver's row sort makes the comparison
  // order-insensitive, so the gate pins filter + projection fidelity.
  def q279SavedSearch(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val line =
      """{"type":"search","id":"s1","attributes":{"title":"big purchases","columns":["event_id","event_type","value"],"sort":[],"kibanaSavedObjectMeta":{"searchSourceJSON":"{\"query\":{\"query\":\"event_type.keyword: purchase and value >= 200\",\"language\":\"kuery\"},\"filter\":[]}"}}}"""
    val srch = graft.search.SavedObjects.parseSearchLine(line).get
    graft.search.SavedObjects.runSearch(ev, srch)
  }

  // ---------------------------------------------------------------- q280

  // MULTI-INDEX export routing: the reference's export declares THREE
  // index-patterns (spark-stage-agg-metrics* / spark-task-metrics* /
  // spark-logs*) and every panel references exactly one — running a
  // task-metrics panel against the stage-agg table is the wrong answer
  // even when both frames carry the field. SavedObjects.runExport
  // resolves each panel's referenced pattern id to its title GLOB and
  // matches that against the caller's table names: here "event*" routes
  // to the events table, "doc*" to documents, a reference-less panel
  // falls back to the default frame, and a panel referencing an
  // unknown pattern id skips tolerantly (the oracle has no rows for
  // it). Four panels exercise the surface across the two routed
  // tables: metric-ordered terms (sum), count-ordered terms with an
  // exact-cardinality metric, a kuery-filtered count, and a global
  // time-picker cut on the pattern's declared time field.
  def q280ExportRouting(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val docs = Tables.documents(s, dir)
    val lines = Seq(
      """{"type":"index-pattern","id":"ip-ev","attributes":{"title":"event*","timeFieldName":"ts"}}""",
      """{"type":"index-pattern","id":"ip-doc","attributes":{"title":"doc*"}}""",
      """{"type":"visualization","attributes":{"title":"ev_by_type","visState":"{\"type\":\"table\",\"aggs\":[{\"id\":\"1\",\"enabled\":true,\"type\":\"sum\",\"params\":{\"field\":\"value\",\"customLabel\":\"total\"},\"schema\":\"metric\"},{\"id\":\"2\",\"enabled\":true,\"type\":\"terms\",\"params\":{\"field\":\"event_type\",\"orderBy\":\"1\",\"order\":\"desc\",\"size\":3},\"schema\":\"bucket\"}]}"},"references":[{"id":"ip-ev","name":"kibanaSavedObjectMeta.searchSourceJSON.index","type":"index-pattern"}]}""",
      """{"type":"visualization","attributes":{"title":"doc_langs","visState":"{\"type\":\"pie\",\"aggs\":[{\"id\":\"1\",\"enabled\":true,\"type\":\"cardinality\",\"params\":{\"field\":\"source\",\"customLabel\":\"sources\"},\"schema\":\"metric\"},{\"id\":\"2\",\"enabled\":true,\"type\":\"terms\",\"params\":{\"field\":\"lang\",\"orderBy\":\"_count\",\"order\":\"desc\",\"size\":3},\"schema\":\"segment\"}]}"},"references":[{"id":"ip-doc","name":"kibanaSavedObjectMeta.searchSourceJSON.index","type":"index-pattern"}]}""",
      """{"type":"visualization","attributes":{"title":"all_clicks","visState":"{\"type\":\"metric\",\"aggs\":[{\"id\":\"1\",\"enabled\":true,\"type\":\"count\",\"params\":{\"customLabel\":\"Count\"},\"schema\":\"metric\"}]}","kibanaSavedObjectMeta":{"searchSourceJSON":"{\"query\":{\"query\":\"event_type.keyword: click\",\"language\":\"kuery\"},\"filter\":[]}"}}}""",
      """{"type":"visualization","attributes":{"title":"orphaned_index","visState":"{\"type\":\"metric\",\"aggs\":[{\"id\":\"1\",\"enabled\":true,\"type\":\"count\",\"params\":{},\"schema\":\"metric\"}]}"},"references":[{"id":"ip-gone","name":"kibanaSavedObjectMeta.searchSourceJSON.index","type":"index-pattern"}]}""")
    // first import: NO default — the two routed panels run on their own
    // tables; reference-less all_clicks and unresolvable orphaned_index
    // both skip (the oracle carries no orphaned_index rows). Second
    // import re-runs just the all_clicks line WITH a default frame to
    // pin the fallback contract. Third import gates Kibana's GLOBAL
    // time picker (the export's dashboards carry timeRestore:false, so
    // the render-time range scopes every panel on its index-pattern's
    // declared timeFieldName — "ts" on ip-ev here): a now-7d picker
    // against an injected now inside the 30-day events span cuts the
    // count panel on both sides; the docs pattern declares NO time
    // field, so the same picker leaves doc_langs untouched (asserted
    // by the spec; the oracle here replays the cut count).
    val now = java.sql.Timestamp.from(
      java.time.Instant.parse("2024-01-10T00:00:00Z"))
    val recent =
      """{"type":"visualization","attributes":{"title":"recent_ev","visState":"{\"type\":\"metric\",\"aggs\":[{\"id\":\"1\",\"enabled\":true,\"type\":\"count\",\"params\":{\"customLabel\":\"Count\"},\"schema\":\"metric\"}]}"},"references":[{"id":"ip-ev","name":"kibanaSavedObjectMeta.searchSourceJSON.index","type":"index-pattern"}]}"""
    graft.search.SavedObjects.runExport(
        Map("events" -> ev, "docs" -> docs), lines)
      .unionAll(graft.search.SavedObjects.runExport(
        Map("events" -> ev, "docs" -> docs),
        lines.filter(_.contains("all_clicks")), default = Some(ev)))
      .unionAll(graft.search.SavedObjects.runExport(
        Map("events" -> ev, "docs" -> docs), lines.take(1) :+ recent,
        now = Some(now), globalRange = Some(("now-7d", "now"))))
      .orderBy($"panel", $"bucket", $"metric")
  }

  // -------------------------------------------------------------- maps

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q280_export_routing" -> q280ExportRouting _,
    "q279_saved_search" -> q279SavedSearch _,
    "q278_panel_timerange" -> q278PanelTimerange _,
    "q277_dashboard_import" -> q277DashboardImport _,
    "q276_saved_objects" -> q276SavedObjects _,
    "q275_panel_full" -> q275PanelFull _,
    "q253_date_range" -> q253DateRange _,
    "q254_counter_rate" -> q254CounterRate _,
    "q251_more_like_this" -> q251MoreLikeThis _,
    "q241_span_near" -> q241SpanNear _,
    "q242_highlight" -> q242Highlight _,
    "q236_suggest" -> q236Suggest _,
    "q237_terms_set" -> q237TermsSet _,
    "q232_top_hits" -> q232TopHits _,
    "q231_significant_text" -> q231SignificantText _,
    "q220_cumulative_cardinality" -> q220CumulativeCardinality _,
    "q221_boxplot" -> q221Boxplot _,
    "q222_multi_terms" -> q222MultiTerms _,
    "q223_filters_bucket_script" -> q223FiltersBucketScript _,
    "q224_moving_extrema" -> q224MovingExtrema _,
    "q218_geo_grid_buckets" -> q218GeoGridBuckets _,
    "q207_significant_terms" -> q207SignificantTerms _,
    "q208_adjacency_matrix" -> q208AdjacencyMatrix _,
    "q209_rare_terms" -> q209RareTerms _,
    "q210_rate_weighted" -> q210RateWeighted _,
    "q211_panel_moving" -> q211PanelMoving _,
    "q212_composite_pages" -> q212CompositePages _)

  val oracle: Map[String, String] = Map(
    "q280_export_routing" ->
      """WITH et AS (SELECT event_type AS b,
        |        CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS s
        |       FROM events GROUP BY 1),
        |t3 AS (SELECT b, s FROM (SELECT b, s,
        |         row_number() OVER (ORDER BY s DESC, b) AS rk FROM et)
        |       WHERE rk <= 3),
        |dl AS (SELECT lang AS b, count(*) AS n,
        |        count(DISTINCT source) AS c FROM documents GROUP BY 1),
        |d3 AS (SELECT b, c FROM (SELECT b, c,
        |         row_number() OVER (ORDER BY n DESC, b) AS rk FROM dl)
        |       WHERE rk <= 3)
        |SELECT * FROM (
        | SELECT 'ev_by_type' AS panel, b AS bucket, 'total' AS metric,
        |  CAST(s AS BIGINT) AS val FROM t3
        |UNION ALL
        | SELECT 'doc_langs', b, 'sources', CAST(c AS BIGINT) FROM d3
        |UNION ALL
        | SELECT 'all_clicks', 'all', 'Count', CAST(count(*) AS BIGINT)
        | FROM events WHERE event_type = 'click'
        |UNION ALL
        | SELECT 'recent_ev', 'all', 'Count', CAST(count(*) AS BIGINT)
        | FROM events
        | WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' - INTERVAL 7 DAY
        |   AND ts <= TIMESTAMP '2024-01-10 00:00:00'
        |) u ORDER BY panel, bucket, metric""".stripMargin,
    "q279_saved_search" ->
      """SELECT event_id, event_type, value FROM events
        |WHERE event_type = 'purchase' AND value >= 200""".stripMargin,
    "q278_panel_timerange" ->
      """WITH w7 AS (SELECT CAST(floor(value * 100) AS BIGINT) AS cents,
        |        epoch_ms(ts) AS ms FROM events
        |       WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' - INTERVAL 7 DAY
        |         AND ts <= TIMESTAMP '2024-01-10 00:00:00'),
        |sp AS (SELECT greatest((epoch_ms(TIMESTAMP '2024-01-10 00:00:00')
        |        - epoch_ms(TIMESTAMP '2024-01-10 00:00:00' - INTERVAL 7 DAY))
        |        // 1000 // 50, 1) AS need),
        |st AS (SELECT CAST(min(r) AS BIGINT) * 1000 AS step
        |       FROM (VALUES (1),(5),(30),(60),(300),(1800),(3600),(10800),
        |             (43200),(86400),(604800)) t(r), sp
        |       WHERE r >= need),
        |hist AS (SELECT ms // step AS bix, coalesce(sum(cents), 0) AS s
        |        FROM w7, st GROUP BY 1),
        |wy AS (SELECT ts FROM events
        |       WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' - INTERVAL 1 YEAR
        |         AND ts <= TIMESTAMP '2024-01-10 00:00:00')
        |SELECT * FROM (
        | SELECT 'recent' AS panel, CAST(bix AS VARCHAR) AS bucket,
        |  'total' AS metric, CAST(s AS BIGINT) AS val FROM hist
        |UNION ALL
        | SELECT 'longview', strftime(date_trunc('month', ts), '%Y-%m-%d'),
        |  'Count', CAST(count(*) AS BIGINT) FROM wy GROUP BY 2
        |) u ORDER BY panel, bucket, metric""".stripMargin,
    "q277_dashboard_import" ->
      """WITH ec AS (SELECT user_id, value,
        |        CAST(floor(value * 100) AS BIGINT) AS cents,
        |        epoch_ms(ts) AS ms, ts FROM events
        |       WHERE event_type = 'click'),
        |w AS (SELECT * FROM ec
        |      WHERE ts >= TIMESTAMP '2024-01-03' AND ts < TIMESTAMP '2024-01-05'),
        |sp AS (SELECT greatest(((max(ms) - min(ms)) // 1000) // 50, 1) AS need
        |       FROM w),
        |st AS (SELECT CAST(coalesce(min(r), 604800) AS BIGINT) * 1000 AS step
        |       FROM (VALUES (1),(5),(30),(60),(300),(1800),(3600),(10800),
        |             (43200),(86400),(604800)) t(r), sp
        |       WHERE r >= need),
        |hist AS (SELECT ms // step AS bix, sum(cents) AS s
        |        FROM w, st GROUP BY 1),
        |lf2 AS (SELECT CAST(user_id AS VARCHAR) AS b, sum(cents) AS s,
        |         count(value) AS cv, min(cents) AS mn
        |        FROM ec GROUP BY 1),
        |top3 AS (SELECT b, s, cv, mn FROM (SELECT b, s, cv, mn,
        |          row_number() OVER (ORDER BY CAST(s AS DOUBLE) / cv DESC, b)
        |            AS rk FROM lf2)
        |        WHERE rk <= 3)
        |SELECT * FROM (
        | SELECT 'skew/hourly' AS panel, CAST(bix AS VARCHAR) AS bucket,
        |  'total' AS metric, CAST(s AS BIGINT) AS val FROM hist
        |UNION ALL
        | SELECT 'skew/top_users', b, 'mean', CAST(s // cv AS BIGINT) FROM top3
        |UNION ALL
        | SELECT 'skew/top_users', b, 'low', CAST(mn AS BIGINT) FROM top3
        |) u ORDER BY panel, bucket, metric""".stripMargin,
    "q276_saved_objects" ->
      """WITH ec AS (SELECT event_type, user_id, value,
        |        CAST(floor(value * 100) AS BIGINT) AS cents,
        |        epoch_ms(ts) AS ms, ts FROM events),
        |sp AS (SELECT greatest(((max(ms) - min(ms)) // 1000) // 50, 1)
        |        AS need FROM ec),
        |st AS (SELECT CAST(min(r) AS BIGINT) * 1000 AS step
        |       FROM (VALUES (1),(5),(30),(60),(300),(1800),(3600),(10800),
        |             (43200),(86400),(604800)) t(r), sp
        |       WHERE r >= need),
        |cal AS (SELECT CASE WHEN need <= 2592000 THEN 'month'
        |         WHEN need <= 7862400 THEN 'quarter'
        |         ELSE 'year' END AS unit FROM sp),
        |n4 AS (SELECT CAST(ms // (SELECT step FROM st) AS VARCHAR) AS b,
        |        count(DISTINCT user_id) AS nv
        |       FROM ec WHERE (SELECT step FROM st) IS NOT NULL GROUP BY 1
        |       UNION ALL
        |       SELECT CASE (SELECT unit FROM cal)
        |          WHEN 'month' THEN strftime(date_trunc('month', ts), '%Y-%m-%d')
        |          WHEN 'quarter' THEN strftime(date_trunc('quarter', ts), '%Y-%m-%d')
        |          ELSE strftime(date_trunc('year', ts), '%Y-%m-%d') END,
        |        count(DISTINCT user_id)
        |       FROM ec WHERE (SELECT step FROM st) IS NULL GROUP BY 1),
        |lf AS (SELECT event_type AS b0, CAST(user_id AS VARCHAR) AS b1,
        |        sum(cents) AS s, max(cents) AS mx, count(value) AS cv
        |       FROM ec GROUP BY 1, 2),
        |t1 AS (SELECT b0, sum(s) AS o FROM lf GROUP BY 1),
        |s1 AS (SELECT b0 FROM (SELECT b0,
        |        row_number() OVER (ORDER BY o DESC, b0) AS rk FROM t1)
        |       WHERE rk <= 3),
        |s2 AS (SELECT l.b0, l.b1, l.s, l.mx, l.cv FROM (SELECT b0, b1, s, mx,
        |        cv, row_number() OVER (PARTITION BY b0 ORDER BY s DESC, b1)
        |         AS rk FROM lf) l JOIN s1 USING (b0) WHERE rk <= 2),
        |pr AS (SELECT e.event_type AS b0, CAST(e.user_id AS VARCHAR) AS b1,
        |        e.cents AS v,
        |        row_number() OVER (PARTITION BY e.event_type,
        |         CAST(e.user_id AS VARCHAR) ORDER BY e.cents) AS rn,
        |        count(*) OVER (PARTITION BY e.event_type,
        |         CAST(e.user_id AS VARCHAR)) AS n
        |       FROM ec e JOIN s2 ON s2.b0 = e.event_type
        |        AND s2.b1 = CAST(e.user_id AS VARCHAR)),
        |pc AS (SELECT b0, b1, p,
        |        min(CASE WHEN rn = (p * n + 99) // 100 THEN v END) AS val
        |       FROM pr, (SELECT unnest([50, 99]) AS p) ps GROUP BY 1, 2, 3),
        |rng AS (SELECT CASE WHEN value >= 0 AND value < 100 THEN '0-100'
        |         WHEN value >= 100 AND value < 500 THEN '100-500'
        |         WHEN value >= 500 THEN '500-*' END AS b, user_id
        |       FROM ec WHERE value IS NOT NULL)
        |SELECT * FROM (
        | SELECT 'n1_purchasers' AS panel, 'all' AS bucket,
        |  'purchasers' AS metric, CAST(count(DISTINCT user_id) AS BIGINT) AS val
        | FROM ec WHERE event_type = 'purchase'
        |UNION ALL
        | SELECT 'n2_value_ranges', b, 'cardinality(user_id)',
        |  CAST(count(DISTINCT user_id) AS BIGINT)
        | FROM rng WHERE b IS NOT NULL GROUP BY b
        |UNION ALL
        | SELECT 'n3_breakdown', b0 || '/' || b1, 'total', CAST(s AS BIGINT) FROM s2
        |UNION ALL
        | SELECT 'n3_breakdown', b0 || '/' || b1, 'peak', CAST(mx AS BIGINT) FROM s2
        |UNION ALL
        | SELECT 'n3_breakdown', b0 || '/' || b1, 'mean', CAST(s // cv AS BIGINT) FROM s2
        |UNION ALL
        | SELECT 'n3_breakdown', b0 || '/' || b1, 'pct p' || CAST(p AS VARCHAR),
        |  CAST(val AS BIGINT) FROM pc
        |UNION ALL
        | SELECT 'n4_daily_users', b, 'cardinality(user_id)',
        |  CAST(nv AS BIGINT) FROM n4
        |) u ORDER BY panel, bucket, metric""".stripMargin,
    "q275_panel_full" ->
      """WITH ec AS (SELECT event_type, user_id, event_id, value,
        |        CAST(floor(value * 100) AS BIGINT) AS cents,
        |        epoch_ms(ts) // 86400000 AS day FROM events),
        |v AS (SELECT cents AS v FROM ec WHERE value IS NOT NULL),
        |vc AS (SELECT v, count(*) AS c FROM v GROUP BY 1),
        |vcum AS (SELECT v, sum(c) OVER (ORDER BY v
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw
        |        FROM vc),
        |vn AS (SELECT count(*) AS n FROM v),
        |pct AS (SELECT p, (SELECT n FROM vn) AS n,
        |        (SELECT min(v) FROM vcum
        |         WHERE cumw >= (p * (SELECT n FROM vn) + 99) // 100) AS val
        |       FROM (SELECT unnest([50, 95, 99]) AS p)),
        |rg AS (SELECT
        |        sum(CASE WHEN value < 100 THEN 1 ELSE 0 END) AS rn1,
        |        coalesce(sum(CASE WHEN value < 100 THEN cents END), 0) AS rv1,
        |        sum(CASE WHEN value >= 100 AND value < 500 THEN 1 ELSE 0 END) AS rn2,
        |        coalesce(sum(CASE WHEN value >= 100 AND value < 500 THEN cents END), 0) AS rv2,
        |        sum(CASE WHEN value >= 500 THEN 1 ELSE 0 END) AS rn3,
        |        coalesce(sum(CASE WHEN value >= 500 THEN cents END), 0) AS rv3
        |       FROM ec WHERE value IS NOT NULL),
        |leaf AS (SELECT event_type AS k1, user_id AS k2, event_id AS k3,
        |         count(*) AS ln, coalesce(max(cents), 0) AS m
        |        FROM ec WHERE user_id >= 0 GROUP BY 1, 2, 3),
        |l1 AS (SELECT k1, max(m) AS m1 FROM leaf GROUP BY 1),
        |s1 AS (SELECT k1 FROM (SELECT k1,
        |        row_number() OVER (ORDER BY m1 DESC, k1) AS rk FROM l1)
        |       WHERE rk <= 3),
        |l2 AS (SELECT k1, k2, max(m) AS m2 FROM leaf GROUP BY 1, 2),
        |s2 AS (SELECT r2.k1, r2.k2 FROM (SELECT k1, k2,
        |        row_number() OVER (PARTITION BY k1 ORDER BY m2 DESC, k2) AS rk
        |        FROM l2) r2 JOIN s1 USING (k1) WHERE rk <= 2),
        |l3 AS (SELECT k1, k2, k3, max(m) AS m3 FROM leaf GROUP BY 1, 2, 3),
        |s3 AS (SELECT r3.k1, r3.k2, r3.k3 FROM (SELECT k1, k2, k3,
        |        row_number() OVER (PARTITION BY k1, k2 ORDER BY m3 DESC, k3) AS rk
        |        FROM l3) r3 JOIN s2 USING (k1, k2) WHERE rk <= 2),
        |tavg AS (SELECT event_type AS bucket, count(*) AS n,
        |         coalesce(sum(cents), 0) AS s, count(value) AS cv
        |        FROM ec GROUP BY 1 ORDER BY n DESC, bucket LIMIT 4)
        |SELECT * FROM (
        | SELECT 'p1_click_users' AS panel, 'all' AS bucket,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS val
        | FROM ec WHERE event_type = 'click'
        |UNION ALL
        | SELECT 'p2_value_pct', 'p' || CAST(p AS VARCHAR),
        |  CAST(n AS BIGINT), CAST(val AS BIGINT) FROM pct
        |UNION ALL
        | SELECT 'p3_value_ranges', '*-100',
        |  CAST(rn1 AS BIGINT), CAST(rv1 AS BIGINT) FROM rg
        |UNION ALL
        | SELECT 'p3_value_ranges', '100-500',
        |  CAST(rn2 AS BIGINT), CAST(rv2 AS BIGINT) FROM rg
        |UNION ALL
        | SELECT 'p3_value_ranges', '500-*',
        |  CAST(rn3 AS BIGINT), CAST(rv3 AS BIGINT) FROM rg
        |UNION ALL
        | SELECT 'p4_daily_max', CAST(day AS VARCHAR),
        |  CAST(count(*) AS BIGINT), CAST(coalesce(max(cents), 0) AS BIGINT)
        | FROM ec GROUP BY day
        |UNION ALL
        | SELECT 'p5_nested',
        |  leaf.k1 || '/' || CAST(leaf.k2 AS VARCHAR) || '/' || CAST(leaf.k3 AS VARCHAR),
        |  CAST(leaf.ln AS BIGINT), CAST(leaf.m AS BIGINT)
        | FROM leaf JOIN s3 ON leaf.k1 = s3.k1 AND leaf.k2 = s3.k2 AND leaf.k3 = s3.k3
        |UNION ALL
        | SELECT 'p6_type_avg', bucket, CAST(n AS BIGINT),
        |  CAST(coalesce(s // cv, 0) AS BIGINT) FROM tavg
        |) u ORDER BY panel, bucket""".stripMargin,
    "q253_date_range" ->
      """WITH e AS (SELECT epoch_ms(ts) // 86400000 AS day, user_id FROM events),
        |o AS (SELECT min(day) AS d0 FROM e),
        |g AS (SELECT
        |       sum(CASE WHEN day - d0 >= 0 AND day - d0 < 7 THEN 1 ELSE 0 END) AS n1,
        |       sum(CASE WHEN day - d0 >= 7 AND day - d0 < 14 THEN 1 ELSE 0 END) AS n2,
        |       sum(CASE WHEN day - d0 >= 14 AND day - d0 < 100000 THEN 1 ELSE 0 END) AS n3,
        |       sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS nm
        |      FROM e, o)
        |SELECT * FROM (
        | SELECT 'week1' AS bucket, CAST(n1 AS BIGINT) AS n FROM g
        | UNION ALL SELECT 'week2', CAST(n2 AS BIGINT) FROM g
        | UNION ALL SELECT 'rest', CAST(n3 AS BIGINT) FROM g
        | UNION ALL SELECT 'zz_missing_user', CAST(nm AS BIGINT) FROM g
        |) u ORDER BY bucket""".stripMargin,
    "q254_counter_rate" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ms,
        |        CAST(floor(value * 100) AS BIGINT) AS cents
        |       FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL),
        |c AS (SELECT *, sum(cents) OVER (PARTITION BY user_id
        |       ORDER BY ms, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND
        |       CURRENT ROW) % 100000 AS counter FROM e),
        |l AS (SELECT *, lag(counter) OVER (PARTITION BY user_id
        |       ORDER BY ms, event_id) AS prev FROM c),
        |i AS (SELECT user_id, cents,
        |       CASE WHEN prev IS NULL THEN counter
        |            WHEN counter >= prev THEN counter - prev
        |            ELSE counter + 100000 - prev END AS inc FROM l)
        |SELECT user_id, CAST(sum(cents) AS BIGINT) AS true_total,
        | CAST(sum(inc) AS BIGINT) AS reconstructed,
        | sum(cents) = sum(inc) AS exact
        |FROM i GROUP BY 1 ORDER BY user_id""".stripMargin,
    "q251_more_like_this" ->
      """WITH d AS (SELECT doc_id,
        |        list_distinct(string_split_regex(trim(text), '\s+')) AS tk
        |       FROM documents),
        |seeds AS (SELECT doc_id AS seed_id, tk AS stk FROM d
        |          WHERE doc_id IN (3, 17, 42)),
        |c AS (SELECT seed_id, d.doc_id,
        |       CAST(len(list_intersect(d.tk, stk)) AS BIGINT) AS shared
        |      FROM d, seeds WHERE d.doc_id <> seed_id),
        |r AS (SELECT *, row_number() OVER (PARTITION BY seed_id
        |       ORDER BY shared DESC, doc_id) AS rk
        |      FROM c WHERE shared > 0)
        |SELECT CAST(seed_id AS BIGINT) AS seed_id, doc_id, shared
        |FROM r WHERE rk <= 5
        |ORDER BY seed_id, shared DESC, doc_id""".stripMargin,
    "q241_span_near" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
        |       FROM documents),
        |pos AS (SELECT doc_id, tk[i + 1] AS term, i
        |        FROM t, (SELECT unnest(range(0, 400)) AS i) ix
        |        WHERE i < len(tk)),
        |m AS (SELECT 'merge>join~3' AS span, a.doc_id
        |      FROM pos a JOIN pos b ON a.doc_id = b.doc_id
        |      WHERE a.term = 'merge' AND b.term = 'join'
        |       AND b.i - a.i BETWEEN 1 AND 3
        |      UNION ALL
        |      SELECT 'batch>stream~2', a.doc_id
        |      FROM pos a JOIN pos b ON a.doc_id = b.doc_id
        |      WHERE a.term = 'batch' AND b.term = 'stream'
        |       AND b.i - a.i BETWEEN 1 AND 2
        |      UNION ALL
        |      SELECT 'slow>query~5', a.doc_id
        |      FROM pos a JOIN pos b ON a.doc_id = b.doc_id
        |      WHERE a.term = 'slow' AND b.term = 'query'
        |       AND b.i - a.i BETWEEN 1 AND 5),
        |g AS (SELECT span, count(DISTINCT doc_id) AS n_docs,
        |       min(doc_id) AS first_doc FROM m GROUP BY 1),
        |spans AS (SELECT unnest(['batch>stream~2', 'merge>join~3',
        |        'slow>query~5']) AS span)
        |SELECT spans.span AS span, CAST(coalesce(n_docs, 0) AS BIGINT) AS n_docs,
        | CAST(coalesce(first_doc, -1) AS BIGINT) AS first_doc
        |FROM spans LEFT JOIN g ON g.span = spans.span
        |ORDER BY spans.span""".stripMargin,
    "q242_highlight" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
        |       FROM documents),
        |p AS (SELECT doc_id, tk, list_position(tk, 'spark') - 1 AS pos
        |      FROM t WHERE list_position(tk, 'spark') IS NOT NULL
        |       AND list_position(tk, 'spark') > 0)
        |SELECT doc_id, CAST(pos AS BIGINT) AS pos,
        | md5(array_to_string(
        |   [tk[x + 1] FOR x IN range(greatest(pos - 2, 0),
        |     least(pos + 3, len(tk)))], ' ')) AS snippet_md5
        |FROM p ORDER BY doc_id""".stripMargin,
    "q236_suggest" ->
      """WITH v AS (SELECT term, count(*) AS freq FROM (
        |        SELECT unnest(string_split_regex(trim(text), '\s+')) AS term
        |        FROM documents) t WHERE len(term) > 0 GROUP BY 1),
        |q AS (SELECT unnest(['spak', 'vectr', 'merg', 'windw', 'quer']) AS query),
        |c AS (SELECT q.query, v.term, levenshtein(q.query, v.term) AS dist, v.freq
        |      FROM q, v WHERE levenshtein(q.query, v.term) <= 1),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query
        |       ORDER BY dist, freq DESC, term) AS rk FROM c)
        |SELECT query, term AS suggestion, CAST(dist AS BIGINT) AS dist,
        | CAST(freq AS BIGINT) AS freq
        |FROM r WHERE rk = 1 ORDER BY query""".stripMargin,
    "q237_terms_set" ->
      """WITH d AS (SELECT n_chars,
        |        (list_contains(tk, 'spark')::BIGINT + list_contains(tk, 'join')::BIGINT
        |         + list_contains(tk, 'merge')::BIGINT) AS m
        |       FROM (SELECT n_chars,
        |              list_distinct(string_split_regex(trim(text), '\s+')) AS tk
        |             FROM documents) t),
        |g AS (SELECT
        |       sum(CASE WHEN m >= 1 THEN 1 ELSE 0 END) AS n1,
        |       coalesce(sum(CASE WHEN m >= 1 THEN n_chars END), 0) AS s1,
        |       sum(CASE WHEN m >= 2 THEN 1 ELSE 0 END) AS n2,
        |       coalesce(sum(CASE WHEN m >= 2 THEN n_chars END), 0) AS s2,
        |       sum(CASE WHEN m >= 3 THEN 1 ELSE 0 END) AS n3,
        |       coalesce(sum(CASE WHEN m >= 3 THEN n_chars END), 0) AS s3
        |      FROM d)
        |SELECT * FROM (
        | SELECT CAST(1 AS BIGINT) AS min_match, CAST(n1 AS BIGINT) AS n_docs,
        |  CAST(s1 AS BIGINT) AS sum_chars FROM g
        | UNION ALL SELECT 2, CAST(n2 AS BIGINT), CAST(s2 AS BIGINT) FROM g
        | UNION ALL SELECT 3, CAST(n3 AS BIGINT), CAST(s3 AS BIGINT) FROM g
        |) u ORDER BY min_match""".stripMargin,
    "q232_top_hits" ->
      """WITH e AS (SELECT event_type, event_id, user_id, epoch_ms(ts) AS ms
        |       FROM events),
        |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |       ORDER BY ms DESC, event_id DESC) AS rk FROM e)
        |SELECT event_type, CAST(rk AS BIGINT) AS rk, event_id, user_id,
        | CAST(ms AS BIGINT) AS ms
        |FROM r WHERE rk <= 3 ORDER BY event_type, rk""".stripMargin,
    "q231_significant_text" ->
      """WITH t AS (SELECT lang = 'de' AS fg,
        |        unnest(list_distinct(string_split_regex(trim(text), '\s+'))) AS term
        |       FROM documents),
        |a AS (SELECT term, CAST(sum(CASE WHEN fg THEN 1 ELSE 0 END) AS BIGINT) AS fg_n,
        |       CAST(count(*) AS BIGINT) AS bg_n FROM t GROUP BY 1),
        |tot AS (SELECT sum(fg_n) AS fg_tot, sum(bg_n) AS bg_tot FROM a),
        |p AS (SELECT term, fg_n, bg_n,
        |       CAST(fg_n * 1000000 // fg_tot AS BIGINT) AS fg_ppm,
        |       CAST(bg_n * 1000000 // bg_tot AS BIGINT) AS bg_ppm
        |      FROM a, tot WHERE fg_n > 0),
        |sc AS (SELECT *, (CASE WHEN fg_ppm >= bg_ppm THEN 1 ELSE -1 END) *
        |        CAST(abs(fg_ppm - bg_ppm) * fg_ppm // bg_ppm AS BIGINT) AS score_ppm
        |       FROM p WHERE bg_ppm > 0)
        |SELECT term, fg_n, bg_n, fg_ppm, bg_ppm, CAST(score_ppm AS BIGINT) AS score_ppm
        |FROM sc ORDER BY score_ppm DESC, term LIMIT 10""".stripMargin,
    "q220_cumulative_cardinality" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) // 86400000 AS day
        |      FROM events WHERE user_id IS NOT NULL),
        |f AS (SELECT user_id, min(day) AS day FROM e GROUP BY 1),
        |nf AS (SELECT day, count(*) AS nu FROM f GROUP BY 1),
        |d AS (SELECT DISTINCT day FROM e)
        |SELECT CAST(d.day AS BIGINT) AS day,
        | CAST(coalesce(nu, 0) AS BIGINT) AS new_users,
        | CAST(sum(coalesce(nu, 0)) OVER (ORDER BY d.day
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
        |FROM d LEFT JOIN nf ON nf.day = d.day
        |ORDER BY day""".stripMargin,
    "q221_boxplot" ->
      """WITH c AS (SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS cents,
        |        count(*) AS c
        |       FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |cum AS (SELECT *, sum(c) OVER (PARTITION BY event_type ORDER BY cents
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |        sum(c) OVER (PARTITION BY event_type) AS n
        |       FROM c),
        |q AS (SELECT event_type, CAST(max(n) AS BIGINT) AS n,
        |       min(cents) AS vmin,
        |       min(CASE WHEN cum >= (n + 3) // 4 THEN cents END) AS q1,
        |       min(CASE WHEN cum >= (n + 1) // 2 THEN cents END) AS q2,
        |       min(CASE WHEN cum >= (3 * n + 3) // 4 THEN cents END) AS q3,
        |       max(cents) AS vmax
        |      FROM cum GROUP BY 1),
        |f AS (SELECT *, q3 - q1 AS iqr,
        |       q1 - (3 * (q3 - q1)) // 2 AS lo,
        |       q3 + (3 * (q3 - q1)) // 2 AS hi FROM q),
        |o AS (SELECT f.event_type,
        |       CAST(coalesce(sum(CASE WHEN c.cents < f.lo OR c.cents > f.hi
        |         THEN c.c END), 0) AS BIGINT) AS n_outliers
        |      FROM f JOIN c ON c.event_type = f.event_type GROUP BY 1)
        |SELECT f.event_type, n, vmin, q1, q2, q3, vmax, CAST(iqr AS BIGINT) AS iqr,
        | n_outliers
        |FROM f JOIN o ON o.event_type = f.event_type
        |ORDER BY f.event_type""".stripMargin,
    "q222_multi_terms" ->
      """WITH b AS (SELECT event_type,
        |        CAST(json_extract_string(props, '$.k') AS BIGINT) // 10 AS k_decile,
        |        CAST(count(*) AS BIGINT) AS n,
        |        CAST(coalesce(sum(CAST(floor(value * 100) AS BIGINT)), 0) AS BIGINT) AS cents
        |       FROM events
        |       WHERE json_extract_string(props, '$.k') IS NOT NULL
        |       GROUP BY 1, 2)
        |SELECT event_type, CAST(k_decile AS BIGINT) AS k_decile, n, cents
        |FROM b ORDER BY cents DESC, event_type, k_decile LIMIT 10""".stripMargin,
    "q223_filters_bucket_script" ->
      """SELECT CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day,
        | CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errors,
        | CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases,
        | CAST(sum(CASE WHEN value >= 500.0 THEN 1 ELSE 0 END) AS BIGINT) AS high_value,
        | CAST(CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) > 0
        |  THEN sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) * 1000000
        |   // sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |  END AS BIGINT) AS err_per_purchase_ppm
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,
    "q224_moving_extrema" ->
      """WITH d AS (SELECT epoch_ms(ts) // 86400000 AS day,
        |        CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |       FROM events
        |       WHERE event_type = 'purchase' AND value IS NOT NULL GROUP BY 1)
        |SELECT CAST(day AS BIGINT) AS day, cents,
        | CAST(max(cents) OVER wa AS BIGINT) AS peak,
        | CAST((max(cents) OVER wa - cents) * 1000000 // max(cents) OVER wa AS BIGINT)
        |   AS drawdown_ppm,
        | CAST(max(cents) OVER w7 AS BIGINT) AS hi7,
        | CAST(min(cents) OVER w7 AS BIGINT) AS lo7
        |FROM d
        |WINDOW wa AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        | w7 AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY day""".stripMargin,
    "q218_geo_grid_buckets" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events
        |       WHERE user_id IS NOT NULL AND user_id >= 0),
        |f AS (SELECT ((user_id * 7919) % 180000) // 10000 AS cx,
        |       ((user_id * 104729) % 360000) // 20000 AS cy, count(*) AS n
        |      FROM u GROUP BY 1, 2),
        |c AS (SELECT cx // 3 AS cx, cy // 3 AS cy, sum(n) AS n FROM f GROUP BY 1, 2),
        |b AS (SELECT 'fine' AS precision, cx, cy, n FROM f
        |      UNION ALL SELECT 'coarse', cx, cy, n FROM c),
        |r AS (SELECT *, row_number() OVER
        |       (PARTITION BY precision ORDER BY n DESC, cx, cy) AS rk FROM b)
        |SELECT precision, CAST(cx AS BIGINT) AS cx, CAST(cy AS BIGINT) AS cy,
        | CAST(n AS BIGINT) AS n
        |FROM r WHERE rk <= 10 ORDER BY precision, n DESC, cx, cy""".stripMargin,
    "q207_significant_terms" ->
      """WITH t AS (SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) // 10 AS term,
        |        CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS fg
        |       FROM events
        |       WHERE json_extract_string(props, '$.k') IS NOT NULL),
        |a AS (SELECT term, CAST(sum(fg) AS BIGINT) AS fg_n,
        |       CAST(count(*) AS BIGINT) AS bg_n FROM t GROUP BY 1),
        |tot AS (SELECT sum(fg_n) AS fg_tot, sum(bg_n) AS bg_tot FROM a),
        |p AS (SELECT term, fg_n, bg_n,
        |       CAST(fg_n * 1000000 // fg_tot AS BIGINT) AS fg_ppm,
        |       CAST(bg_n * 1000000 // bg_tot AS BIGINT) AS bg_ppm
        |      FROM a, tot WHERE fg_n > 0),
        |sc AS (SELECT *, (CASE WHEN fg_ppm >= bg_ppm THEN 1 ELSE -1 END) *
        |        CAST(abs(fg_ppm - bg_ppm) * fg_ppm // bg_ppm AS BIGINT) AS score_ppm
        |       FROM p WHERE bg_ppm > 0)
        |SELECT term, fg_n, bg_n, fg_ppm, bg_ppm, CAST(score_ppm AS BIGINT) AS score_ppm
        |FROM sc ORDER BY score_ppm DESC, term LIMIT 10""".stripMargin,
    "q208_adjacency_matrix" ->
      """WITH f AS (SELECT event_type = 'purchase' AS a, value >= 100.0 AS b,
        |        CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50 AS c
        |       FROM events),
        |g AS (SELECT
        |       CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |       CAST(sum(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT) AS nb,
        |       CAST(sum(CASE WHEN c THEN 1 ELSE 0 END) AS BIGINT) AS nc,
        |       CAST(sum(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS nab,
        |       CAST(sum(CASE WHEN a AND c THEN 1 ELSE 0 END) AS BIGINT) AS nac,
        |       CAST(sum(CASE WHEN b AND c THEN 1 ELSE 0 END) AS BIGINT) AS nbc
        |      FROM f)
        |SELECT 'a' AS cell, na AS n FROM g UNION ALL
        |SELECT 'a&b' AS cell, nab AS n FROM g UNION ALL
        |SELECT 'a&c' AS cell, nac AS n FROM g UNION ALL
        |SELECT 'b' AS cell, nb AS n FROM g UNION ALL
        |SELECT 'b&c' AS cell, nbc AS n FROM g UNION ALL
        |SELECT 'c' AS cell, nc AS n FROM g
        |ORDER BY cell""".stripMargin,
    "q209_rare_terms" ->
      """WITH c AS (SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |        count(*) AS c FROM events
        |       WHERE json_extract_string(props, '$.k') IS NOT NULL GROUP BY 1),
        |tot AS (SELECT sum(c) AS tot FROM c),
        |d AS (SELECT unnest([400, 200, 100]) AS d)
        |SELECT CAST(max(tot) // d.d AS BIGINT) AS max_doc_count,
        | CAST(sum(CASE WHEN c.c <= tot // d.d THEN 1 ELSE 0 END) AS BIGINT) AS n_rare_terms,
        | CAST(coalesce(sum(CASE WHEN c.c <= tot // d.d THEN c.c END), 0) AS BIGINT) AS n_rare_docs
        |FROM d, tot, c
        |GROUP BY d.d ORDER BY max_doc_count""".stripMargin,
    "q210_rate_weighted" ->
      """SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m') AS month,
        | CAST(count(*) AS BIGINT) AS n,
        | CAST(count(*) * 1000000 //
        |   date_part('day', last_day(CAST(min(l_shipdate) AS DATE))) AS BIGINT) AS rate_per_day_ppm,
        | CAST(sum(CAST(floor(l_discount * 10000) AS BIGINT) * CAST(l_quantity AS BIGINT))
        |   // sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w_avg_disc_bp
        |FROM lineitem
        |GROUP BY 1 ORDER BY month""".stripMargin,
    "q211_panel_moving" ->
      """SELECT * FROM (
        | SELECT 'p1_view_movavg' AS panel, CAST(day AS VARCHAR) AS bucket,
        |  CAST(n AS BIGINT) AS n,
        |  CAST(sum(n) OVER w3 // count(*) OVER w3 AS BIGINT) AS val
        | FROM (SELECT epoch_ms(ts) // 86400000 AS day, count(*) AS n
        |       FROM events WHERE event_type = 'view' GROUP BY 1) h1
        | WINDOW w3 AS (ORDER BY day ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |UNION ALL
        |SELECT 'p2_click_wow' AS panel, CAST(day AS VARCHAR) AS bucket,
        |  CAST(n AS BIGINT) AS n,
        |  CAST(coalesce(n - lag(n, 7) OVER (ORDER BY day), 0) AS BIGINT) AS val
        | FROM (SELECT epoch_ms(ts) // 86400000 AS day, count(*) AS n
        |       FROM events WHERE event_type = 'click' GROUP BY 1) h2
        |) u ORDER BY panel, bucket""".stripMargin,
    "q212_composite_pages" ->
      """WITH b AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day,
        |        CAST(count(*) AS BIGINT) AS n,
        |        CAST(coalesce(sum(CAST(floor(value * 100) AS BIGINT)), 0) AS BIGINT) AS cents
        |       FROM events GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (ORDER BY event_type, day) AS rn FROM b)
        |SELECT CAST((rn - 1) // 40 AS BIGINT) AS page, event_type, day, n, cents
        |FROM r WHERE (rn - 1) // 40 <= 2
        |ORDER BY page, event_type, day""".stripMargin)
}
