package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.text.TextAnalysis

/** Round-5 operator surface: LLM training-batch assembly (next-fit
  * sequence packing, token-budget selection, mixture planning, quality
  * retention sweeps) and operational monitoring (threshold alerting
  * with incident merge, stage straggler audit). Same conventions as
  * [[PipelineQueries]]: integer-exact (or 6-decimal-rounded) outputs,
  * DuckDB oracle per entry, column names/types matched for the
  * driver's hash compare.
  */
object TrainingQueries {

  /** DuckDB mirror of TextAnalysis.tokenCount (blank → 0 guard). */
  private val tokSql =
    """CASE WHEN length(trim(text)) = 0 THEN 0
      |      ELSE len(string_split_regex(trim(text), '\s+')) END""".stripMargin

  /** DuckDB mirror of TextAnalysis.qualityScore — identical operation
    * order to q21's oracle (alphabetic density, en-stopword presence,
    * length saturation; round to 6 decimals so the doubles compare
    * byte-equal across engines).
    */
  private lazy val qualitySql: String = {
    val sEn = TextAnalysis.langProfiles.head._2
      .map(w => s"len(regexp_extract_all(text, '\\b$w\\b'))").mkString(" + ")
    s"""round((length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')))
       |   / CAST(greatest(length(text), 1) AS DOUBLE) * 0.4
       | + least(($sEn) * 5.0 / CAST(greatest(toks, 1) AS DOUBLE), 1.0) * 0.3
       | + least(CAST(greatest(toks, 1) AS DOUBLE) / 100.0, 1.0) * 0.3, 6)""".stripMargin
  }

  // ---------------------------------------------------------------- q183

  // Next-fit sequence packing for fine-tuning batches: documents are
  // hashed into 16 shards and packed into 512-token bins WITHOUT
  // splitting any document (Packing.nextFit — contrast q57's
  // tokenShards, which cuts mid-document). The per-shard walk is a
  // sequential recurrence the oracle replays with a recursive CTE over
  // ranked rows; output is the per-shard packing efficiency summary.
  def q183NextFitPack(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
      .select($"doc_id", ($"doc_id" % 16).as("shard"),
        TextAnalysis.tokenCount($"text").as("toks"))
    graft.operators.Packing.nextFit(docs, "shard", "doc_id", "toks", capacity = 512L)
      .groupBy($"shard")
      .agg(count(lit(1)).as("n_docs"), (max($"bin") + 1L).as("n_bins"),
        sum($"toks").as("sum_tokens"), max($"fill").as("max_fill"))
      .select($"shard", $"n_docs", $"n_bins", $"sum_tokens", $"max_fill",
        expr("sum_tokens * 1000000 div (n_bins * 512)").as("util_ppm"))
      .orderBy($"shard")
  }

  // ---------------------------------------------------------------- q184

  // Token-budget data selection: rank the corpus by quality score
  // (best first, doc_id tiebreak) and keep documents until half the
  // corpus' tokens are spent. The global running sum is the
  // DISTRIBUTED two-phase PrefixSum — never a single-partition window
  // — and descending order is expressed as ascending on the negated
  // score. Output: per-source selection rates.
  def q184BudgetSelect(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val scored = Tables.documents(s, dir)
      .select($"doc_id", $"source",
        TextAnalysis.tokenCount($"text").as("toks"),
        TextAnalysis.qualityScore($"text").as("q"))
    val ranked = graft.operators.PrefixSum.runningSum(
      scored.withColumn("negq", -$"q"), Seq("negq", "doc_id"), "toks", "cum")
    val tot = scored.agg(sum($"toks").as("total"))
    ranked.crossJoin(broadcast(tot))
      .withColumn("sel", $"cum" * 2 <= $"total")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"toks").as("sum_tokens"),
        sum(when($"sel", 1L).otherwise(0L)).as("n_selected"),
        coalesce(sum(when($"sel", $"toks")), lit(0L)).as("sel_tokens"))
      .orderBy($"source")
  }

  // ---------------------------------------------------------------- q185

  // Threshold alerting with incident merge (the monitor → alert →
  // incident pipeline): hourly event counts per type breach at n >= 4;
  // breach episodes separated by at most one quiet hour merge into one
  // incident; an incident must span >= 2 breach hours to fire. The
  // lag/cumsum windows run over the HOURLY aggregate, whose size is
  // bounded by the time range (720 h/month per type), not the data —
  // at 100 TB the per-type series length is unchanged.
  def q185AlertIncidents(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val h = Tables.events(s, dir)
      .groupBy($"event_type", expr("unix_millis(ts) div 3600000").as("hr"))
      .agg(count(lit(1)).as("n"))
    val wOrd = Window.partitionBy($"event_type").orderBy($"hr")
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val g = h.filter($"n" >= 4)
      .withColumn("prev", lag($"hr", 1).over(wOrd))
      .withColumn("new_inc",
        when($"prev".isNull || $"hr" - $"prev" > 2, 1L).otherwise(0L))
      .withColumn("inc", sum($"new_inc").over(wCum))
      .groupBy($"event_type", $"inc")
      .agg(count(lit(1)).as("bh"), (max($"hr") - min($"hr") + 1).as("dur"),
        max($"n").as("peak"))
      .filter($"bh" >= 2)
    Tables.events(s, dir).select($"event_type").distinct()
      .join(g, Seq("event_type"), "left")
      .groupBy($"event_type")
      .agg(count($"inc").as("n_incidents"),
        coalesce(max($"dur"), lit(0L)).as("max_dur_hours"),
        coalesce(sum($"bh"), lit(0L)).as("breach_hours"),
        coalesce(max($"peak"), lit(0L)).as("peak_hourly"))
      .orderBy($"event_type")
  }

  // ---------------------------------------------------------------- q186

  // Pretraining mixture plan: given per-source token inventories and
  // target mixture weights (deterministic function of the source id so
  // both engines recompute them), apportion a 10M-token training budget
  // and report the implied epoch count per source — the "how many
  // passes over each corpus" planning table. Metadata-scale integer
  // math throughout (one row per source).
  def q186MixturePlan(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val src = Tables.documents(s, dir)
      .groupBy($"source")
      .agg(sum(TextAnalysis.tokenCount($"text")).as("src_tokens"))
      .withColumn("weight",
        lit(20000L) + lit(60000L) * (substring($"source", 4, 10).cast("long") % 3))
    val wsum = src.agg(sum($"weight").as("wsum"))
    src.crossJoin(broadcast(wsum))
      .select($"source", $"src_tokens", $"weight",
        expr("10000000 * weight div wsum").as("planned_tokens"),
        expr("(10000000 * weight div wsum) * 1000000 div src_tokens").as("epochs_ppm"))
      .withColumn("oversampled", $"epochs_ppm" > 1000000L)
      .orderBy($"source")
  }

  // ---------------------------------------------------------------- q187

  // Quality-threshold retention sweep: corpus deciled by quality score
  // via the distributed GlobalRank (never a global ntile window), then
  // cumulative docs/tokens retained from the best decile down — the
  // "where do we set the filter cutoff" curve. The cumulative window
  // runs over the 10-row decile aggregate only.
  def q187QualitySweep(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val scored = Tables.documents(s, dir)
      .select($"doc_id",
        TextAnalysis.tokenCount($"text").as("toks"),
        TextAnalysis.qualityScore($"text").as("q"))
    val ranked = graft.operators.GlobalRank.rowNumber(
      scored.withColumn("negq", -$"q"), Seq("negq", "doc_id"), "rk")
    val tot = scored.agg(count(lit(1)).as("n"), sum($"toks").as("tot_toks"))
    val byDecile = ranked.crossJoin(broadcast(tot))
      .withColumn("decile", expr("(rk - 1) * 10 div n + 1"))
      .groupBy($"decile")
      .agg(count(lit(1)).as("n_docs"), sum($"toks").as("dec_tokens"))
    val w10 = Window.orderBy($"decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byDecile.crossJoin(broadcast(tot.select($"tot_toks")))
      .withColumn("cum_docs", sum($"n_docs").over(w10))
      .withColumn("cum_tokens", sum($"dec_tokens").over(w10))
      .select($"decile", $"n_docs", $"dec_tokens", $"cum_docs", $"cum_tokens",
        expr("cum_tokens * 1000000 div tot_toks").as("retained_ppm"))
      .orderBy($"decile")
  }

  // ---------------------------------------------------------------- q188

  // Stage straggler audit (the observability counterpart of the skew
  // dashboards): deterministic task durations per stage, exact lower
  // median via the value-domain-compressed rank pick (q172's shape —
  // the duration domain is 997 values, so per-stage windows run over
  // <= 997 rows regardless of data scale), stragglers = tasks slower
  // than 2x the stage median, skew = max/median in ppm.
  def q188StragglerAudit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.events(s, dir)
      .filter($"user_id".isNotNull && $"user_id" >= 0 && $"event_id".isNotNull)
      .select(($"user_id" % 10).as("stage"), ($"event_id" % 997 + 1).as("dur"))
      .groupBy($"stage", $"dur")
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy($"stage").orderBy($"dur")
    val wT = Window.partitionBy($"stage")
    val rp = expr("(n - 1) div 2 + 1")
    val med = c.withColumn("hi", sum($"cnt").over(w))
      .withColumn("n", sum($"cnt").over(wT))
      .withColumn("lo", $"hi" - $"cnt")
      .groupBy($"stage", $"n")
      .agg(max(when($"lo" < rp && rp <= $"hi", $"dur")).as("med"),
        max($"dur").as("max_dur"))
    c.join(broadcast(med), "stage")
      .groupBy($"stage", $"n", $"med", $"max_dur")
      .agg(coalesce(sum(when($"dur" > $"med" * 2, $"cnt")), lit(0L)).as("n_stragglers"))
      .select($"stage", $"n".as("n_tasks"), $"med".as("med_ms"),
        $"max_dur".as("max_ms"), $"n_stragglers",
        expr("max_dur * 1000000 div med").as("skew_ppm"))
      .orderBy($"stage")
  }

  // -------------------------------------------------------------- maps

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q183_next_fit_pack" -> q183NextFitPack _,
    "q184_budget_select" -> q184BudgetSelect _,
    "q185_alert_incidents" -> q185AlertIncidents _,
    "q186_mixture_plan" -> q186MixturePlan _,
    "q187_quality_sweep" -> q187QualitySweep _,
    "q188_straggler_audit" -> q188StragglerAudit _)

  val oracle: Map[String, String] = Map(
    "q183_next_fit_pack" ->
      s"""WITH RECURSIVE d AS MATERIALIZED (
         | SELECT doc_id % 16 AS shard, doc_id,
         |  $tokSql AS sz,
         |  row_number() OVER (PARTITION BY doc_id % 16 ORDER BY doc_id) AS rk
         | FROM documents),
         |p AS (
         | SELECT shard, rk, CAST(sz AS BIGINT) AS sz,
         |  CAST(sz AS BIGINT) AS fill, CAST(0 AS BIGINT) AS bin
         | FROM d WHERE rk = 1
         | UNION ALL
         | SELECT d.shard, d.rk, CAST(d.sz AS BIGINT),
         |  CASE WHEN p.fill + d.sz > 512 THEN CAST(d.sz AS BIGINT)
         |       ELSE p.fill + d.sz END,
         |  CASE WHEN p.fill + d.sz > 512 THEN p.bin + 1 ELSE p.bin END
         | FROM p JOIN d ON d.shard = p.shard AND d.rk = p.rk + 1)
         |SELECT CAST(shard AS BIGINT) AS shard,
         | CAST(count(*) AS BIGINT) AS n_docs,
         | CAST(max(bin) + 1 AS BIGINT) AS n_bins,
         | CAST(sum(sz) AS BIGINT) AS sum_tokens,
         | CAST(max(fill) AS BIGINT) AS max_fill,
         | CAST(sum(sz) * 1000000 // ((max(bin) + 1) * 512) AS BIGINT) AS util_ppm
         |FROM p GROUP BY shard ORDER BY shard""".stripMargin,
    "q184_budget_select" ->
      s"""WITH base AS (
         | SELECT doc_id, source, text, $tokSql AS toks FROM documents),
         |scored AS (
         | SELECT doc_id, source, toks, $qualitySql AS q FROM base),
         |c AS (
         | SELECT *, sum(toks) OVER (ORDER BY q DESC, doc_id) AS cum,
         |  sum(toks) OVER () AS total
         | FROM scored)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         | CAST(sum(toks) AS BIGINT) AS sum_tokens,
         | CAST(sum(CASE WHEN cum * 2 <= total THEN 1 ELSE 0 END) AS BIGINT) AS n_selected,
         | CAST(coalesce(sum(CASE WHEN cum * 2 <= total THEN toks END), 0) AS BIGINT) AS sel_tokens
         |FROM c GROUP BY source ORDER BY source""".stripMargin,
    "q185_alert_incidents" ->
      """WITH h AS (
        | SELECT event_type, epoch_ms(ts) // 3600000 AS hr, count(*) AS n
        | FROM events GROUP BY 1, 2),
        |b AS (
        | SELECT *, lag(hr) OVER (PARTITION BY event_type ORDER BY hr) AS prev
        | FROM h WHERE n >= 4),
        |f AS (
        | SELECT *, CASE WHEN prev IS NULL OR hr - prev > 2 THEN 1 ELSE 0 END AS new_inc
        | FROM b),
        |i AS (
        | SELECT *, sum(new_inc) OVER (PARTITION BY event_type ORDER BY hr
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS inc
        | FROM f),
        |g AS (
        | SELECT event_type, inc, count(*) AS bh,
        |  max(hr) - min(hr) + 1 AS dur, max(n) AS peak
        | FROM i GROUP BY 1, 2 HAVING count(*) >= 2),
        |t AS (SELECT DISTINCT event_type FROM events)
        |SELECT t.event_type,
        | CAST(count(g.inc) AS BIGINT) AS n_incidents,
        | CAST(coalesce(max(g.dur), 0) AS BIGINT) AS max_dur_hours,
        | CAST(coalesce(sum(g.bh), 0) AS BIGINT) AS breach_hours,
        | CAST(coalesce(max(g.peak), 0) AS BIGINT) AS peak_hourly
        |FROM t LEFT JOIN g ON t.event_type = g.event_type
        |GROUP BY t.event_type ORDER BY t.event_type""".stripMargin,
    "q186_mixture_plan" ->
      s"""WITH s0 AS (
         | SELECT source, sum($tokSql) AS src_tokens
         | FROM documents GROUP BY source),
         |s AS (
         | SELECT source, CAST(src_tokens AS BIGINT) AS src_tokens,
         |  CAST(20000 + 60000 * (CAST(substr(source, 4) AS BIGINT) % 3) AS BIGINT) AS weight
         | FROM s0),
         |t AS (SELECT sum(weight) AS wsum FROM s)
         |SELECT source, src_tokens, weight,
         | CAST(10000000 * weight // wsum AS BIGINT) AS planned_tokens,
         | CAST((10000000 * weight // wsum) * 1000000 // src_tokens AS BIGINT) AS epochs_ppm,
         | (10000000 * weight // wsum) * 1000000 // src_tokens > 1000000 AS oversampled
         |FROM s, t ORDER BY source""".stripMargin,
    "q187_quality_sweep" ->
      s"""WITH base AS (
         | SELECT doc_id, text, $tokSql AS toks FROM documents),
         |scored AS (
         | SELECT doc_id, toks, $qualitySql AS q FROM base),
         |r AS (
         | SELECT *, row_number() OVER (ORDER BY q DESC, doc_id) AS rk,
         |  count(*) OVER () AS n, sum(toks) OVER () AS tot_toks
         | FROM scored),
         |g AS (
         | SELECT ((rk - 1) * 10) // n + 1 AS decile,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(toks) AS BIGINT) AS dec_tokens,
         |  max(tot_toks) AS tot
         | FROM r GROUP BY 1)
         |SELECT CAST(decile AS BIGINT) AS decile, n_docs, dec_tokens,
         | CAST(sum(n_docs) OVER (ORDER BY decile) AS BIGINT) AS cum_docs,
         | CAST(sum(dec_tokens) OVER (ORDER BY decile) AS BIGINT) AS cum_tokens,
         | CAST(sum(dec_tokens) OVER (ORDER BY decile) * 1000000 // tot AS BIGINT) AS retained_ppm
         |FROM g ORDER BY decile""".stripMargin,
    "q188_straggler_audit" ->
      """WITH t AS (
        | SELECT user_id % 10 AS stage, event_id % 997 + 1 AS dur
        | FROM events
        | WHERE user_id IS NOT NULL AND user_id >= 0 AND event_id IS NOT NULL),
        |c AS (SELECT stage, dur, count(*) AS cnt FROM t GROUP BY 1, 2),
        |k AS (
        | SELECT *, sum(cnt) OVER (PARTITION BY stage ORDER BY dur) AS hi,
        |  sum(cnt) OVER (PARTITION BY stage) AS n
        | FROM c),
        |m AS (
        | SELECT stage, max(n) AS n,
        |  max(CASE WHEN hi - cnt < (n - 1) // 2 + 1 AND (n - 1) // 2 + 1 <= hi
        |       THEN dur END) AS med,
        |  max(dur) AS max_dur
        | FROM k GROUP BY stage)
        |SELECT CAST(m.stage AS BIGINT) AS stage, CAST(m.n AS BIGINT) AS n_tasks,
        | CAST(m.med AS BIGINT) AS med_ms, CAST(m.max_dur AS BIGINT) AS max_ms,
        | CAST(coalesce(sum(CASE WHEN c.dur > 2 * m.med THEN c.cnt END), 0) AS BIGINT) AS n_stragglers,
        | CAST(m.max_dur * 1000000 // m.med AS BIGINT) AS skew_ppm
        |FROM m JOIN c ON c.stage = m.stage
        |GROUP BY m.stage, m.n, m.med, m.max_dur
        |ORDER BY stage""".stripMargin)
}
