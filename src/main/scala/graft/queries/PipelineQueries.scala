package graft.queries

import java.time.Duration

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.multimodal.Multimodal
import graft.operators.{DateHistogram, TopK}
import graft.similarity.Similarity
import graft.sources.Tables
import graft.text.TextAnalysis

/** Training-data-pipeline + remaining dashboard queries (q15-q24), each
  * with an exact DuckDB oracle. Covers SURVEY §2.2 B11's nested terms,
  * the auto date-histogram, and the LLM-pipeline operator families:
  * dedup (exact / MinHash-LSH / SimHash), text analysis, similarity
  * search (brute-force + SRP-LSH ANN), multimodal metadata.
  *
  * Oracle-determinism notes:
  *  - all hash-bearing queries use md5 (DuckDB-identical); xxhash64
  *    stays the production default where no oracle is needed;
  *  - doubles only flow through expressions with IDENTICAL operation
  *    order on both engines (sequential left folds == list_dot_product,
  *    verified), then round(6);
  *  - integer outputs are cast to LongType (DuckDB BIGINT).
  */
object PipelineQueries {

  // B11: nested 3-level terms top-k — top-2 regions by max supplier
  // balance, top-3 nations within those, top-2 suppliers within those.
  // One leaf aggregation shuffles; everything after is broadcast-sized.
  def q15NestedTopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(s, dir)), $"n_regionkey" === $"r_regionkey")
      .select($"r_name", $"n_name", $"s_name", $"s_acctbal")
    TopK.nested(base, Seq(("r_name", 2), ("n_name", 3), ("s_name", 2)), "s_acctbal")
      .select($"r_name", $"n_name", $"s_name", $"m1", $"m2", $"m3", $"rk1", $"rk2", $"rk3")
      .orderBy($"rk1", $"rk2", $"rk3")
  }

  // B13 auto-interval variant: pick the histogram rung from the data's
  // time span (OpenSearch auto date-histogram), then bucket. The span
  // probe is one tiny min/max agg job.
  def q16AutoHistogram(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val mm = ev.agg(min(unix_millis($"ts")), max(unix_millis($"ts"))).head()
    val spanSec = (mm.getLong(1) - mm.getLong(0)) / 1000L
    val step = DateHistogram.autoIntervalSeconds(Duration.ofSeconds(spanSec), 100)
    ev.groupBy(
        date_format(DateHistogram.bucket($"ts", step), "yyyy-MM-dd HH:mm:ss")
          .as("bucket_start"))
      .agg(count(lit(1)).as("n_events"), countDistinct($"user_id").as("n_users"))
      .orderBy($"bucket_start")
  }

  // Exact dedup: one surviving (lowest) id per key group + copy count.
  def q17ExactDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Dedup.exact(Tables.documents(s, dir), Seq("lang", "source"), "doc_id")
      .orderBy($"lang", $"source")
  }

  // MinHash-LSH near-dup pairs, jaccard-verified. The oracle brute-forces
  // all pairs (fine at sf0.01); the engine only verifies band-bucket
  // collisions — same result here because the planted pairs sit well
  // above the (p=64, bands=16, rows=4) S-curve boundary (miss ≈ 2.2e-4
  // at exactly j=0.8, <1e-6 for j ≳ 0.87; precision is exact either
  // way), verified empirically against the oracle at every SF.
  def q18NeardupPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Dedup.neardupPairs(Tables.documents(s, dir), "doc_id", "text",
        shingleK = 3, p = 64, bands = 16, threshold = 0.8)
      .select($"id_a", $"id_b", round($"jac", 6).as("jac"))
      .orderBy($"id_a", $"id_b")
  }

  // n-gram-Jaccard dedup family: character-5-gram jaccard pairs through
  // the same banded MinHash+LSH machinery (sub-word granularity — robust
  // to whitespace/tokenization edits where word shingles are not). The
  // planted near-dups sit at char-5-gram jaccard 0.93-0.99 with nothing
  // else above 0.35, so the 0.8 threshold is deep inside the S-curve's
  // safe zone; the oracle brute-forces all pairs.
  def q41CharNgramPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Dedup.neardupPairs(Tables.documents(s, dir), "doc_id", "text",
        threshold = 0.8,
        // Banding is STEEPER than the word-shingle default (rows=6 vs 4):
        // char-gram corpora have a much higher baseline similarity
        // (~0.35 here vs ≤0.3 for word shingles), and at rows=4 roughly
        // a fifth of ALL pairs band-collide — millions of candidate
        // memberships that exist only to be killed by the est-prefilter.
        // At (p=60, bands=10, rows=6) the baseline candidate rate drops
        // ~13× while the planted pairs (char-5-gram jaccard 0.93-0.99)
        // keep miss probability ≤ (1-0.93^6)^10 ≈ 3e-5 — verified
        // empirically against the brute-force oracle at every SF per the
        // repo convention.
        p = 60, bands = 10,
        // gram IDENTITIES are 64-bit byte-level hashes end-to-end: the
        // verify sets are distinct gram hashes (array<long> intersects,
        // no gram string is ever materialized) and the signature hashes
        // the same grams natively. Hash-set jaccard equals the oracle's
        // string-set jaccard whenever no within-pair xxhash64 collision
        // exists (P ≈ grams²/2^64 ≈ 1e-13 — and the cross-engine hash
        // compare would catch one).
        shingleFn = Some(c => array_distinct(graft.plans.GraftFunctions.ngramHashes(c, 5))),
        hashesFn = Some(graft.plans.GraftFunctions.ngramHashes(_, 5)))
      .select($"id_a", $"id_b", round($"jac", 6).as("jac"))
      .orderBy($"id_a", $"id_b")
  }

  // SimHash near-dup pairs over 3-shingles (md5-based 60-bit hash so the
  // oracle can recompute signatures exactly); Manku-style banded search
  // with guaranteed recall at maxHamming=10 (11 bands).
  def q19SimhashPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sigged = Tables.documents(s, dir)
      .repartition(s.sparkContext.defaultParallelism) // parallelize sig compute (1-file input)
      .select($"doc_id",
        Dedup.simhashOf(Dedup.shingles($"text", 3), Dedup.md5Hash60, 60).as("sig"))
      // materialized once — both sides of the band join consume it
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    Dedup.simhashNearDupPairs(sigged, "doc_id", "sig", maxHamming = 10, bits = 60)
      .orderBy($"id_a", $"id_b")
  }

  // Text analysis: token/subword/char-class counts + normalization
  // fingerprint. All row-local codegen'd Column expressions.
  def q20TextStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select(
      $"doc_id",
      TextAnalysis.tokenCount($"text").as("n_tokens"),
      TextAnalysis.subwordCount($"text").as("n_subwords"),
      TextAnalysis.alphaCount($"text").as("n_alpha"),
      TextAnalysis.digitCount($"text").as("n_digit"),
      TextAnalysis.punctCount($"text").as("n_punct"),
      TextAnalysis.fingerprint($"text").as("fingerprint"))
      .orderBy($"doc_id")
  }

  // Language-ID heuristic + quality score per document.
  def q21LangQuality(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select(
      $"doc_id",
      $"lang",
      TextAnalysis.langId($"text").as("lang_id"),
      TextAnalysis.qualityScore($"text").as("quality"))
      .orderBy($"doc_id")
  }

  // Repetition-based quality filters (Gopher-style): distinct-token
  // ratio, top-token share, duplicate 2/3-gram fractions and a
  // composite keep flag — every metric row-local (the top-token share
  // folds a sorted run-length max instead of exploding tokens into a
  // corpus-wide shuffle).
  def q62RepetitionFilter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select(
      $"doc_id",
      TextAnalysis.tokenCount($"text").as("n_tokens"),
      TextAnalysis.uniqueTokenRatio($"text").as("uniq_ratio"),
      TextAnalysis.topTokenShare($"text").as("top_share"),
      TextAnalysis.dupNgramFrac($"text", 2).as("dup2"),
      TextAnalysis.dupNgramFrac($"text", 3).as("dup3"))
      .withColumn("repetitive",
        $"top_share" > 0.12 || $"dup2" > 0.06 || $"uniq_ratio" < 0.33)
      .orderBy($"doc_id")
  }

  // PII redaction over documents: emails/phones/IPv4s planted
  // deterministically from doc_id (the base corpus has none — both
  // engines plant the identical strings), then scrubbed by the shared
  // Java-regex/RE2-compatible patterns. The redacted text itself is
  // part of the compared output, so match boundaries are pinned exactly.
  def q63PiiRedact(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val planted = Tables.documents(s, dir).withColumn("text2",
      when($"doc_id" % 3 === 0,
        concat($"text",
          lit(" contact u"), $"doc_id".cast("string"), lit("@ex-"),
          ($"doc_id" % 7).cast("string"), lit(".org"),
          lit(" call "), format_string("%03d-%03d-%04d",
            $"doc_id" % 1000, ($"doc_id" * 3) % 1000, $"doc_id" % 10000),
          lit(" from "), ($"doc_id" % 223 + 1).cast("string"), lit("."),
          ($"doc_id" % 256).cast("string"), lit("."),
          (($"doc_id" * 7) % 256).cast("string"), lit("."),
          ($"doc_id" % 100 + 1).cast("string")))
        .otherwise($"text"))
    planted.select(
      $"doc_id",
      TextAnalysis.piiEmailCount($"text2").as("n_email"),
      TextAnalysis.piiPhoneCount($"text2").as("n_phone"),
      TextAnalysis.piiIpv4Count($"text2").as("n_ip"),
      TextAnalysis.redactPii($"text2").as("redacted"))
      .orderBy($"doc_id")
  }

  // Bloom-pruned semi-join: lineitem ⋉ high-value orders with the dim's
  // bloom probed AT THE SCAN (fact rows failing it never reach the join
  // exchange — the shuffle saver when the dim is too big to broadcast
  // exactly). The trailing exact semi-join removes false positives, so
  // the oracle is the plain IN-subquery aggregate.
  def q71BloomSemiJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dim = Tables.orders(s, dir)
      .filter($"o_totalprice" > 150000).select($"o_orderkey")
    val n = math.max(dim.count(), 1L)
    graft.operators.BloomJoin.semiJoin(
        Tables.lineitem(s, dir), "l_orderkey", dim, "o_orderkey", n)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        round(sum($"l_quantity".cast("decimal(18,2)")), 2).cast("double").as("sum_qty"))
      .orderBy($"l_returnflag")
  }

  // Per-label embedding cohesion: integerized centroid numerators
  // (exact integer sums — no float-order nondeterminism), broadcast
  // back for a row-local cosine, floor-scaled cohesion mean. The one
  // real shuffle is the (label, pos) component explode.
  def q69EmbeddingCohesion(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.similarity.VectorAgg.intraCosine(
      Tables.embeddings(s, dir), "label", "embedding")
      .orderBy($"label")
  }

  // Stream-stream attribution join, end-to-end: views ⋈ purchases of
  // the same user within 1h, as a REAL checkpointed stream — two
  // watermarked branches of one spool source, time-range inner join
  // (state expires by watermark + range), append sink, two availableNow
  // runs on one checkpoint. Sentinels (user -1) ride BOTH branches to
  // advance the watermark and can never self-join (bts = vts fails the
  // strict > bound; the two sentinels sit 1 day apart, outside the 1h
  // window) so no output filter is needed beyond user >= 0. Oracle =
  // the same join as plain SQL on the source table.
  def q68StreamAttribution(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    import s.implicits._
    val schema = Tables.eventsFileSchema(s, dir)
    val tmp = tempDir("graft-q68")
    val spool = java.nio.file.Files.createDirectories(tmp.resolve("spool"))
    java.nio.file.Files.createSymbolicLink(
      spool.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val maxMs = Tables.events(s, dir).agg(max(unix_millis($"ts"))).head().getLong(0)
    def sentinel(offMs: Long): Unit = {
      val dir1 = tmp.resolve(s"sentinel-$offMs")
      Tables.eventSentinel(s, schema, maxMs + offMs)
        .coalesce(1).write.parquet(dir1.toString)
      val listing = java.nio.file.Files.list(dir1)
      try {
        val part = listing.iterator()
        while (part.hasNext) {
          val p = part.next()
          if (p.getFileName.toString.endsWith(".parquet"))
            java.nio.file.Files.copy(p, spool.resolve(s"sentinel-$offMs.parquet"))
        }
      } finally listing.close()
    }
    val s2 = s.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    def run(): Unit = {
      val raw = s2.readStream.schema(schema)
        .option("maxFilesPerTrigger", 100000).parquet(spool.toString)
      val ev = Tables.normalizeEventTs(raw)
      val views = ev.filter(col("event_type") === "view" || col("user_id") < 0)
        .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("vts"))
        .withWatermark("vts", "1 minute")
      val buys = ev.filter(col("event_type") === "purchase" || col("user_id") < 0)
        .select(col("user_id").as("b_user"), col("event_id").as("buy_id"),
          col("ts").as("bts"))
        .withWatermark("bts", "1 minute")
      views.join(buys, expr(
          "user_id = b_user AND bts > vts AND bts <= vts + interval 1 hour"))
        .select(col("user_id"), col("view_id"), col("buy_id"),
          unix_millis(col("vts")).as("v_ms"), unix_millis(col("bts")).as("b_ms"))
        .writeStream.format("parquet")
        .option("path", s"$tmp/tables/attrib")
        .option("checkpointLocation", s"$tmp/ckpt/attrib")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
    }
    sentinel(86400000L)
    run()
    sentinel(2L * 86400000L)
    run()
    s.read.parquet(s"$tmp/tables/attrib")
      .filter($"user_id" >= 0)
      .orderBy($"view_id", $"buy_id")
  }

  // Cohort retention matrix: users bucketed by epoch-DAY of first
  // event (the 30-day test window gives a real triangular matrix;
  // weekly is the production default), distinct-counted at every day
  // offset they return. Pure integer math — the oracle replays it with
  // `//` floor division.
  def q66RetentionCohorts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.operators.Retention.matrix(
      Tables.events(s, dir).select($"user_id", unix_millis($"ts").as("ms")),
      "user_id", "ms", periodMs = graft.operators.Retention.DayMs)
      .orderBy($"cohort_week", $"week_offset")
  }

  // Per-event-type z-score outliers: exact integer sums/sums-of-squares
  // then a fixed-shape double expression — deterministic across engines
  // where avg/stddev partial-sum order is not.
  def q67AnomalyZscore(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.operators.Anomaly.zOutliers(
      Tables.events(s, dir).select($"event_id", $"event_type", $"value"),
      Seq("event_type"), "event_id", "value")
      .orderBy($"event_type", $"event_id")
  }

  // Inverted-index conjunctive search: build the token-partitioned
  // posting table (the one offline shuffle), then probe two terms with
  // bucket PartitionFilters — file-listing pruning, the full-text
  // analog of q34's LSH index probe. Oracle recomputes tf containment
  // directly on the corpus.
  def q65InvertedSearch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val idx = tempDir("graft-q65").resolve("inv_index").toString
    graft.text.InvertedIndex.writeIndex(
      Tables.documents(s, dir), "doc_id", "text", idx)
    graft.text.InvertedIndex.searchAnd(s, idx, "doc_id", Seq("spark", "dup"))
      .orderBy($"doc_id")
  }

  // TF-IDF ranked search for a 3-term query: dfs for ONLY the query
  // terms via one single-row aggregate broadcast back over the scan —
  // the corpus is never token-exploded; top-k is TakeOrdered. The
  // oracle mirrors the identical smoothed-idf formula and the same
  // left-to-right FP addition order.
  def q64TfidfSearch(s: SparkSession, dir: String): DataFrame = {
    graft.text.Tfidf.searchTopK(Tables.documents(s, dir), "doc_id", "text",
      Seq("spark", "shuffle", "dup"), k = 20)
  }

  // Brute-force cosine top-k against one query vector: single scan, zero
  // shuffles (broadcast 1-row query + TakeOrderedAndProject).
  def q22CosineTopK(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val query = emb.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
    Similarity.bruteForceTopK(emb, "vec_id", "embedding", query, 10)
  }

  // SRP-LSH ANN top-k: signature prefilter (bit_count ≤ 3 of 12 bits ⇒
  // ~7% of rows reach the exact cosine), dim inferred from the data.
  def q23AnnTopK(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val query = emb.filter(col("vec_id") === 1).select(col("embedding").as("qvec"))
    Similarity.lshTopK(emb, "vec_id", "embedding", query, k = 10,
      bits = annBits, maxHamming = annMaxHamming)
  }

  // Multimodal metadata: binary payload + mapPartitions decode (stub
  // codec, real batch shape) + row-local digest.
  def q24MultimodalMeta(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.asMediaTable(
      Tables.documents(s, dir), "doc_id", "text", "image")
    val meta = Multimodal.decodeMeta(media).toDF()
    val digest = media.select(col("media_id"), md5(col("content")).as("digest"))
    meta.select(
        col("mediaId").as("media_id"),
        col("modality"),
        col("nBytes").as("n_bytes"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("channels").cast("long").as("channels"))
      .join(digest, Seq("media_id"))
      .orderBy(col("media_id"))
  }

  // A13/A14 end-to-end: replay the events table through a REAL
  // checkpointed Structured Streaming write (file source → routed
  // partitioned parquet sink, exactly-once), then aggregate the sink.
  // The oracle aggregates the source directly — any lost/duplicated row
  // in the streaming path breaks the hash match.
  def q25StreamIngest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val schema = Tables.eventsFileSchema(s, dir)
    val tmp = java.nio.file.Files.createTempDirectory("graft-q25")
    // clean the sink/checkpoint tree up at JVM exit (each invocation
    // writes a full events-table copy; repeated runs would fill /tmp)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import java.nio.file.{Files => F}
      import scala.jdk.CollectionConverters._
      try F.walk(tmp).iterator().asScala.toSeq.reverse.foreach(p => F.deleteIfExists(p))
      catch { case _: Throwable => () }
    }))
    // the streaming file source wants a drop DIRECTORY (like a real
    // ingest spool) — link the source file into one
    val spool = java.nio.file.Files.createDirectories(tmp.resolve("spool"))
    java.nio.file.Files.createSymbolicLink(
      spool.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val conf = graft.ingest.Pipelines.Config(
      sourceDir = spool.toString,
      sinkRoot = s"$tmp/tables",
      checkpointRoot = s"$tmp/ckpt",
      availableNow = true)
    graft.ingest.Pipelines
      .ingestPartitioned(s, spool.toString, schema, "event_type", conf)
      .awaitTermination()
    s.read.parquet(conf.tablePath("ingested"))
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct($"user_id").as("n_users"),
        max($"value").as("max_value"))
      .orderBy($"event_type")
  }

  // A8, serialize direction: struct → JSON payload (the reference
  // Gson-serializes each record at flush; from_json is q13). Long/string
  // fields only — float textual formats differ across engines.
  def q28JsonSerialize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select($"event_id",
        to_json(struct($"event_id", $"user_id", $"event_type")).as("payload"))
      .orderBy($"event_id")
      .limit(1000)
  }

  // Batched k-NN similarity join: top-3 neighbors for each of 5 query
  // vectors in one pass (broadcast queries, one window shuffle).
  def q29KnnJoin(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    Similarity.knnJoin(emb, "vec_id", "embedding", queries, 3)
      .orderBy(col("qid"), col("rk"))
  }

  // Multimodal frame sampling: stride-sampled binary slices per payload
  // (ASCII docs only — the oracle's VARCHAR substring is char-indexed,
  // Spark's BINARY substring is byte-indexed; they coincide on ASCII).
  def q30FrameSample(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.asMediaTable(
      Tables.documents(s, dir).filter(col("lang") === "en"), "doc_id", "text", "video")
    Multimodal.sampleFrames(media, 3)
      .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
        // hex-encode: raw binary is opaque to the driver's row hasher
        lower(hex(col("frame_bytes"))).as("frame_hex"))
      .orderBy(col("media_id"), col("frame_idx"))
  }

  /** Self-cleaning temp dir (q25 pattern: hook reaps the tree at JVM
    * exit so repeated bench/verify invocations don't fill /tmp).
    */
  private[queries] def tempDir(prefix: String): java.nio.file.Path = {
    val tmp = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import java.nio.file.{Files => F}
      import scala.jdk.CollectionConverters._
      try F.walk(tmp).iterator().asScala.toSeq.reverse.foreach(p => F.deleteIfExists(p))
      catch { case _: Throwable => () }
    }))
    tmp
  }

  /** Driver-side fetch of one query vector (float→double, same cast as
    * toDoubleVec) — a 1-row probe job, like q16's span probe.
    */
  private def fetchVec(emb: DataFrame, id: Long): Array[Double] =
    emb.filter(col("vec_id") === id).select(col("embedding"))
      .head().getSeq[Float](0).map(_.toDouble).toArray

  // THE 100 TB ANN shape, oracle-gated: build the SRP-partitioned index
  // (signature = physical partition key), then probe it — the read
  // prunes to the Hamming-ball partitions at file listing
  // (PartitionFilters asserted in SimilaritySpec). The oracle recomputes
  // signatures from the same plane literals and applies the equivalent
  // hamming predicate to ALL rows — identical result set because
  // "sig_bucket IN ball(qsig, r)" ⇔ "hamming(sig, qsig) ≤ r".
  def q34AnnLshIndex(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val idx = tempDir("graft-q34").resolve("lsh_index").toString
    Similarity.writeLshIndex(emb, "vec_id", "embedding", idx, bits = idxBits)
    Similarity.queryLshIndex(s, idx, "vec_id", "embedding",
      fetchVec(emb, 2L), k = 10, bits = idxBits, maxHamming = idxMaxHamming)
  }

  // IVF variant of the same story: coarse-quantizer cell = partition
  // key; probe the nProbe nearest cells (driver-side centroid ranking),
  // exact cosine re-rank inside them. The oracle assigns every vector
  // to its argmax-dot cell from the same centroid literals and ranks
  // cells for the query identically (desc dot, tie → lower cell).
  def q35AnnIvfIndex(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val idx = tempDir("graft-q35").resolve("ivf_index").toString
    Similarity.writeIvfIndex(emb, "vec_id", "embedding", idx, nCentroids = ivfCells)
    Similarity.queryIvfIndex(s, idx, "vec_id", "embedding",
      fetchVec(emb, 3L), k = 10, nCentroids = ivfCells, nProbe = ivfProbe)
  }

  // Full MinHash dedup SURVIVOR set — the non-transitive keep-lowest-id
  // drop policy is exactly the subtle part worth pinning: the oracle
  // brute-forces all ≥0.8-jaccard pairs and drops every id_b, which is
  // the documented per-pair (not connected-component) semantics.
  def q36MinhashDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Dedup.minhashDedup(Tables.documents(s, dir), "doc_id", "text")
      .select($"doc_id", $"lang", $"source")
      .orderBy($"doc_id")
  }

  // Embedding-cosine near-dup pairs over a PLANTED derivation: the
  // driver embeddings have no ≥0.8-cosine pairs (max ~0.5), so the
  // query derives one deterministic near-copy per vec_id<10 — a 95/5
  // mix of the vector with its own reversal (cos ≥ 0.9986 to the
  // original by construction, while cross-vector cosines move ≤ ~6°,
  // keeping every non-planted pair far below threshold). The oracle
  // replays the identical derivation and brute-forces all pairs; the
  // engine goes through SRP signatures + Manku banding and must find
  // exactly the planted pairs.
  def q37CosineNearDup(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.embeddings(s, dir)
      .select(col("vec_id"), Similarity.toDoubleVec(col("embedding")).as("v"))
    val planted = base.filter(col("vec_id") < 10)
      .select((col("vec_id") + lit(1000000L)).as("vec_id"),
        transform(col("v"), (x, i) =>
          x * lit(0.95) + element_at(col("v"), size(col("v")) - i) * lit(0.05)).as("v"))
    val derived = base.unionByName(planted)
    // recallCosine 0.99: the planted pairs sit at cos ≥ 0.9986 — the
    // 64/6 ball covers them (E[h] ≈ 2.9) while 0.8 stays the loose
    // verification floor; the banding/threshold consistency check
    // would (correctly) reject guaranteeing recall at 0.8 itself
    Similarity.cosineNearDupPairs(derived, "vec_id", "v", 0.8,
      recallCosine = 0.99)
      .orderBy(col("id_a"), col("id_b"))
  }

  // Reference-parity deep log ingest, end-to-end: derive full Log4j2
  // JSON events (nested level/instant structs, MDC map, a
  // thrownProxy→causeProxy chain with typed stack frames) from the
  // events table, replay them through a REAL checkpointed streaming
  // ingest (rawLogSchemaDeep → projectLogRecordsDeep → parquet sink),
  // then slice the SINK by level.name and cause-chain depth. The oracle
  // recomputes the same slices from the source directly — a lost field,
  // broken MDC parse, or flattened cause chain breaks the hash.
  def q38DeepLogIngest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val levelName = when($"event_type" === "click", "INFO")
      .when($"event_type" === "view", "DEBUG")
      .when($"event_type" === "signup", "TRACE")
      .when($"event_type" === "purchase", "WARN")
      .otherwise("ERROR")
    val intLevel = when($"event_type" === "click", 400L)
      .when($"event_type" === "view", 500L)
      .when($"event_type" === "signup", 600L)
      .when($"event_type" === "purchase", 300L)
      .otherwise(200L)
    def frame(line: org.apache.spark.sql.Column) = struct(
      struct(
        lit("app").as("classLoaderName"),
        lit("graft.Job").as("declaringClass"),
        lit("Job.scala").as("fileName"),
        line.as("lineNumber"),
        lit("run").as("methodName"),
        lit("graft.core").as("moduleName"),
        lit("1.0").as("moduleVersion")).as("stackTraceElement"),
      struct(lit(true).as("exact"), lit("graft.jar").as("location"),
        lit("1.0").as("version")).as("extraClassInfo"))
    val cause = struct(
      lit("java.io.IOException").as("name"),
      concat(lit("io-"), $"user_id").as("message"),
      concat(lit("io-"), $"user_id").as("localizedMessage"),
      lit(1L).as("commonElementCount"),
      array(frame($"user_id" % 200)).as("extendedStackTrace"))
    val thrown = struct(
      lit("java.lang.RuntimeException").as("name"),
      concat(lit("boom-"), $"event_id" % 13).as("message"),
      concat(lit("boom-"), $"event_id" % 13).as("localizedMessage"),
      lit(0L).as("commonElementCount"),
      array(frame($"event_id" % 500)).as("extendedStackTrace"),
      when($"event_id" % 3 === 0, cause).as("causeProxy"))
    val line = to_json(struct(
      lit("graft-app").as("appName"), lit("app-001").as("appId"),
      lit("driver").as("executorId"),
      unix_millis($"ts").as("logTime"),
      struct((unix_millis($"ts") / lit(1000)).cast("long").as("epochSecond"),
        lit(0L).as("nanoOfSecond")).as("instant"),
      lit("graft.app").as("loggerName"),
      concat(lit("worker-"), $"event_id" % 4).as("threadName"),
      ($"event_id" % 4).as("threadId"), lit(5L).as("threadPriority"),
      struct(intLevel.as("intLevel"), levelName.as("name"),
        levelName.as("standardLevel")).as("level"),
      struct(concat(lit("processed "), $"event_type", lit(" event "), $"event_id")
        .as("message")).as("message"),
      map(lit("taskName"),
        concat(lit("task "), $"event_id" % 7, lit(".0 in stage "),
          $"user_id" % 5, lit(".0 (TID "), $"event_id", lit(")"))).as("contextData"),
      when($"event_type" === "error", thrown).as("thrownProxy")))
    val tmp = tempDir("graft-q38")
    val spool = tmp.resolve("spool").toString
    ev.select(line.as("value")).write.mode("overwrite").text(spool)
    val conf = graft.ingest.Pipelines.Config(
      sourceDir = spool,
      sinkRoot = s"$tmp/tables",
      checkpointRoot = s"$tmp/ckpt",
      availableNow = true)
    graft.ingest.Pipelines.startLogsDeep(s, conf).awaitTermination()
    s.read.parquet(conf.tablePath(graft.model.Schemas.LogsTable + "_deep"))
      .groupBy($"levelName", $"causeDepth")
      .agg(
        count(lit(1)).as("n_logs"),
        countDistinct($"stageId").as("n_stages"),
        max($"errLine").as("max_line"))
      .select($"levelName".as("level_name"), $"causeDepth".as("cause_depth"),
        $"n_logs", $"n_stages", $"max_line")
      .orderBy($"level_name", $"cause_depth")
  }

  // The flatMapGroupsWithState stage aggregation, end-to-end and
  // oracle-gated: derive deterministic task-metric JSON from the events
  // table, replay it through startMetricsStateful (real checkpointed
  // stream, custom state, event-time timeouts), and read the SINK. The
  // watermark a batch runs with comes from the PREVIOUS batch, so state
  // flush needs two sentinel deliveries — done here as two availableNow
  // runs against ONE checkpoint (also proving checkpoint recovery): run
  // 1 drains events + a +1h sentinel and persists its watermark; run 2
  // delivers a +2h sentinel, runs with the recovered (+1h-lag) watermark
  // that is past every real stage's inactivity timeout, and emits them
  // all. The oracle recomputes the per-stage aggregation from the
  // source: any state-loss, double-count, or premature/missed timeout
  // emission breaks the hash.
  /** Shared harness for the stage-agg delivery gates (q39/q42/q43):
    * derive deterministic task-metric JSON from the events table into a
    * spool dir, return (pipeline config, max event-time ms, sentinel
    * writer). The oracle mirror of the derivation lives in
    * `stageAggOracleSql`.
    */
  private def taskMetricSpool(
      s: SparkSession, dir: String, prefix: String): (graft.ingest.Pipelines.Config, Long, Long => Unit) = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val line = to_json(struct(
      lit("taskMetrics").as("metricsType"),
      lit("graft-app").as("appName"),
      concat(lit("app-"), $"user_id" % 3).as("appId"),
      ($"user_id" % 4).cast("string").as("jobId"),
      ($"user_id" % 10).cast("int").as("stageId"),
      floor($"value" * 1000).cast("long").as("inputBytesRead"),
      ($"event_id" % 997).as("shuffleBytesRead"),
      unix_millis($"ts").as("metricTime")))
    val tmp = tempDir(prefix)
    val spool = tmp.resolve("spool").toString
    // parallel JSON spool write (a coalesce(1) here would serialize the
    // whole to_json derivation onto one core)
    ev.select(line.as("value")).write.mode("overwrite").text(spool)
    val maxMs = ev.agg(max(unix_millis($"ts"))).head().getLong(0)
    val sentinel = (offsetMs: Long) => {
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(spool).resolve(s"sentinel-$offsetMs.json"),
        s"""{"metricsType":"taskMetrics","appName":"graft-app","appId":"sentinel",""" +
          s""""jobId":"s","stageId":999,"inputBytesRead":1,"shuffleBytesRead":0,""" +
          s""""metricTime":${maxMs + offsetMs}}""")
      ()
    }
    val conf = graft.ingest.Pipelines.Config(
      sourceDir = spool,
      sinkRoot = s"$tmp/tables",
      checkpointRoot = s"$tmp/ckpt",
      maxFilesPerTrigger = 100000,
      availableNow = true,
      watermarkDelay = "1 minute",
      // state shards sized to the harness's ~120 live stage keys (see
      // Pipelines.sessionFor) — every micro-batch commits every shard,
      // so inheriting the session's 32 triples empty-batch latency
      streamShufflePartitions = Some(8))
    (conf, maxMs, sentinel)
  }

  /** Common output shape of the stage-agg gates (sans sentinels);
    * `keepWindow` adds the window start for the windowed delivery.
    */
  private def stageAggOutput(sink: DataFrame, keepWindow: Boolean = false): DataFrame = {
    import org.apache.spark.sql.Column
    def c(n: String): Column = sink(n)
    val base = Seq(
      c("appId").as("app_id"), c("jobId").as("job_id"),
      c("stageId").cast("long").as("stage_id"),
      round(c("inputBytesReadSkewness"), 6).as("in_skew"),
      c("maxInputBytesRead").as("max_in"),
      round(c("shuffleBytesReadSkewness"), 6).as("sh_skew"),
      c("maxShuffleBytesRead").as("max_sh"),
      unix_millis(c("metricTime")).as("last_ms"))
    val cols = if (keepWindow) base :+ unix_millis(c("windowStart")).as("win_ms") else base
    sink.filter(c("appId") =!= "sentinel").select(cols: _*)
  }

  def q39StatefulStageAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (conf, _, sentinel) = taskMetricSpool(s, dir, "graft-q39")
    sentinel(3600000L)
    graft.ingest.Pipelines.startMetricsStateful(s, conf).awaitTermination()
    sentinel(7200000L)
    graft.ingest.Pipelines.startMetricsStateful(s, conf).awaitTermination()
    stageAggOutput(s.read.parquet(conf.tablePath(
        graft.model.Schemas.StageAggMetricsTable + "_stateful")))
      .orderBy($"app_id", $"job_id", $"stage_id")
  }

  // The transformWithState delivery (Spark 4 arbitrary-state API,
  // RocksDB-backed state + explicit per-stage event-time timers),
  // end-to-end through the same two-run/one-checkpoint harness as q39.
  // Emission semantics are identical to the flatMapGroupsWithState
  // variant, so the oracle is the same batch recompute of the raw
  // fixture — a divergence in timer re-arming, state encoding, or the
  // RocksDB provider breaks the hash.
  def q45TwsStageAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (conf, _, sentinel) = taskMetricSpool(s, dir, "graft-q45")
    sentinel(3600000L)
    graft.ingest.Pipelines.startMetricsTws(s, conf).awaitTermination()
    sentinel(7200000L)
    graft.ingest.Pipelines.startMetricsTws(s, conf).awaitTermination()
    stageAggOutput(s.read.parquet(conf.tablePath(
        graft.model.Schemas.StageAggMetricsTable + "_tws")))
      .orderBy($"app_id", $"job_id", $"stage_id")
  }

  // Leakage-safe deterministic train/val/test split: the split label is
  // a pure function of the SOURCE key, so all docs of a source land in
  // one split (near-dups sharing provenance can't straddle train/test).
  // Aggregated per split+lang to pin both the assignment function and
  // its composition. Row-local scan + one small agg shuffle.
  def q46HashSplit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.operators.Datasplit.hashSplit(
        Tables.documents(s, dir), "source",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy($"split", $"lang")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct($"source").as("n_sources"),
        sum(TextAnalysis.tokenCount($"text")).as("sum_tokens"))
      .orderBy($"split", $"lang")
  }

  // Token-budget sharding via the distributed two-phase prefix sum
  // (Datasplit.tokenShards — NOT a single-partition global window): docs
  // in doc_id order are cut every 2000 tokens; a doc belongs to the
  // shard where it starts. The oracle computes the same running sum with
  // a plain global window (fine at oracle scale).
  def q47TokenShards(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
      .select($"doc_id", TextAnalysis.tokenCount($"text").as("n_tokens"))
    graft.operators.Datasplit.tokenShards(docs, "doc_id", "n_tokens", capacity = 2000L)
      .select($"doc_id", $"n_tokens", $"cum_tokens", $"shard")
      .orderBy($"doc_id")
  }

  // Deterministic stratified corpus mixing: per-lang keep rates (e.g.
  // upweight en, downsample the tail), survival a pure function of
  // (doc_id, lang). Stable under appends/re-runs; the oracle replays the
  // identical md5-threshold rule.
  def q48StratifiedSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.operators.Datasplit.stratifiedSample(
        Tables.documents(s, dir), "doc_id", "lang",
        rates = Map("en" -> 0.5, "de" -> 0.25), defaultRate = 0.1)
      .select($"doc_id", $"lang", $"source")
      .orderBy($"doc_id")
  }

  // Sessionization: gap-based session windows per user (session_window —
  // the same operator sessionizes a live stream with watermark state
  // eviction). A session merges events whose gap is < 6h; windows are
  // half-open, so a gap of EXACTLY 6h starts a new session — mirrored in
  // the oracle's `>=` gaps-and-islands flag. One shuffle on user_id;
  // session assembly is partition-local.
  def q49Sessionize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy(session_window($"ts", "6 hours"), $"user_id")
      .agg(
        count(lit(1)).as("n_events"),
        min(unix_millis($"ts")).as("start_ms"),
        max(unix_millis($"ts")).as("end_ms"),
        countDistinct($"event_type").as("n_types"))
      .select($"user_id", $"n_events", $"start_ms", $"end_ms", $"n_types")
      .orderBy($"user_id", $"start_ms")
  }

  // AS-OF temporal enrichment: every event carries the user's most
  // recent purchase value at-or-before its timestamp (the logs↔metrics
  // correlation pattern as a real join). Union+window formulation: ONE
  // shuffle on user_id, partition-local sort, no range probe — the
  // oracle uses DuckDB's native ASOF LEFT JOIN, so both the match
  // predicate (>=, inclusive) and the carried payload are pinned.
  def q50AsofEnrich(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    // right side must be unique per (key, time): collapse same-ms
    // purchases to their max value (both engines, identically)
    val purchases = ev.filter($"event_type" === "purchase")
      .groupBy($"user_id", $"ts")
      .agg(round(max($"value"), 6).as("last_purchase"))
    graft.operators.AsofJoin.asofJoin(
        ev.select($"event_id", $"user_id", $"ts", $"event_type"),
        purchases, Seq("user_id"), "ts", "ts")
      .select($"event_id", $"user_id", unix_millis($"ts").as("ms"),
        $"event_type", $"last_purchase")
      .orderBy($"event_id")
  }

  // The foreachBatch recompute-upsert delivery, end-to-end: same derived
  // stream, but the sink is maintained by idempotent dynamic-partition
  // overwrites per micro-batch (no watermark dependency — the recompute
  // is exact at every batch, so no sentinels are needed). The oracle is
  // the same per-stage aggregation over the source.
  def q42UpsertStageAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (conf, _, _) = taskMetricSpool(s, dir, "graft-q42")
    graft.ingest.Pipelines.startMetricsUpsert(s, conf).awaitTermination()
    stageAggOutput(
        s.read.parquet(conf.tablePath(
          graft.model.Schemas.StageAggMetricsTable + "_upsert"))
          .drop("appIdPart"))
      .orderBy($"app_id", $"job_id", $"stage_id")
  }

  // The event-time windowed append-mode delivery, end-to-end: rows emit
  // only when the watermark closes their window (q39's two-run sentinel
  // scheme advances it), and the output carries the WINDOW START — one
  // stage active across k windows lands k rows (~5 windows per stage at
  // the 7-day width; the derived metrics span 30 days). Window width is
  // the state/output knob and the per-window semantics are identical at
  // any width — the replay harness compresses the whole history into one
  // batch, so live state is (windows × stages) until the sentinel. The
  // oracle buckets the source on floor(ms/604800000).
  def q43WindowedStageAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (base, _, sentinel) = taskMetricSpool(s, dir, "graft-q43")
    val conf = base.copy(stageWindow = "7 days")
    // the LAST window's end can sit up to a full window width past the
    // newest event, so the sentinels must clear windowEnd + watermark —
    // offsets scale with the window width (8/9 days), unlike q39's
    // inactivity-timeout gate where +1h/+2h suffice
    sentinel(8L * 24 * 3600 * 1000)
    graft.ingest.Pipelines.startMetricsWindowed(s, conf).awaitTermination()
    sentinel(9L * 24 * 3600 * 1000)
    graft.ingest.Pipelines.startMetricsWindowed(s, conf).awaitTermination()
    val sink = s.read.parquet(conf.tablePath(
      graft.model.Schemas.StageAggMetricsTable + "_windowed"))
    stageAggOutput(sink, keepWindow = true)
      .orderBy($"app_id", $"job_id", $"stage_id", $"win_ms")
  }

  // B13 calendar branch: span/targetBuckets lands past the fixed 7d rung
  // (orders span 6.6 years) → calendar quarter via date_trunc. The auto
  // choice is recomputed from the data; the oracle pins the rung the
  // ladder provably picks for this span at every SF.
  def q31CalendarHistogram(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = Tables.orders(s, dir)
    // o_orderdate is TIMESTAMP_NTZ; session is UTC so the cast is exact
    val mm = orders.agg(
      min(unix_millis($"o_orderdate".cast("timestamp"))),
      max(unix_millis($"o_orderdate".cast("timestamp")))).head()
    val span = Duration.ofSeconds((mm.getLong(1) - mm.getLong(0)) / 1000L)
    orders
      .groupBy(date_format(
        DateHistogram.autoBucket($"o_orderdate", span, 50), "yyyy-MM").as("bucket"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy($"bucket")
  }

  // B13/B14 pipeline aggregations over a date histogram — the
  // dashboard staples layered ON TOP of time buckets: cumulative sum,
  // derivative (delta vs previous bucket), and trailing 3-bucket moving
  // average. The scale story: the data-sized aggregation shuffles
  // normally; the window functions run over the AGGREGATED frame
  // (bucket count ≈ tens of rows regardless of input scale), so the
  // unpartitioned window is bounded by construction.
  def q44PipelineAggs(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val h = Tables.events(s, dir)
      .groupBy(date_format(date_trunc("day", $"ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n_events"))
    val w = Window.orderBy($"day")
    h.select(
        $"day", $"n_events",
        sum($"n_events").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("long").as("cum_events"),
        ($"n_events" - lag($"n_events", 1).over(w)).cast("long").as("delta"),
        round(avg($"n_events").over(w.rowsBetween(-2, 0)), 6).as("ma3"))
      .orderBy($"day")
  }

  // Hierarchy rollup — subtotals over region → nation (the idiomatic
  // cube extension of the dashboards' app→job→stage drilldown).
  def q32Rollup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.supplier(s, dir)), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(Tables.nation(s, dir)), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(s, dir)), $"n_regionkey" === $"r_regionkey")
      .rollup($"r_name", $"n_name")
      .agg(
        round(sum($"l_extendedprice".cast("decimal(18,2)")), 2)
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .select(
        coalesce($"r_name", lit("ALL")).as("r_name"),
        coalesce($"n_name", lit("ALL")).as("n_name"),
        $"revenue", $"n_items")
      .orderBy($"r_name", $"n_name")
  }

  // Full cube over the app→job drilldown (completes q32's rollup:
  // every subtotal combination incl. job-only, which rollup omits).
  // grouping_id() disambiguates real NULLs from subtotal rows; Spark
  // and DuckDB bit-order GROUPING() identically (left arg = MSB).
  def q51Cube(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select(
        concat(lit("app-"), $"user_id" % 3).as("app_id"),
        ($"user_id" % 4).cast("string").as("job_id"),
        floor($"value" * 1000).cast("long").as("in_b"))
      .cube($"app_id", $"job_id")
      .agg(
        sum($"in_b").as("sum_in"),
        max($"in_b").as("max_in"),
        count(lit(1)).as("n_tasks"),
        grouping_id().cast("long").as("gid"))
      .select(
        coalesce($"app_id", lit("ALL")).as("app_id"),
        coalesce($"job_id", lit("ALL")).as("job_id"),
        $"sum_in", $"max_in", $"n_tasks", $"gid")
      .orderBy($"gid", $"app_id", $"job_id")
  }

  // Symmetric int8 embedding quantization: per-vector scale, integer
  // codes, and the reconstruction-error bound — the storage-compression
  // stage of a vector pipeline, verified value-exactly (codes sum +
  // checksum are integer math; the error max is elementwise, no FP
  // accumulation order for the oracle to diverge on).
  def q52QuantizeInt8(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    val scale = graft.similarity.Quantize.int8Scale($"embedding")
    val withScale = emb.withColumn("__scale", scale)
    val codes = graft.similarity.Quantize.int8Codes($"embedding", $"__scale")
    withScale
      .withColumn("__codes", codes)
      .select(
        $"vec_id",
        size($"embedding").cast("long").as("n_dims"),
        round($"__scale", 6).as("scale"),
        aggregate($"__codes", lit(0L), (acc, x) => acc + x).as("sum_q"),
        aggregate($"__codes", lit(0L), (acc, x) => acc + abs(x)).as("l1_q"),
        round(graft.similarity.Quantize.maxReconError(
          $"embedding", $"__codes", $"__scale") * $"__scale", 6).as("max_err_scaled"))
      .orderBy($"vec_id")
  }

  // B12 inverse: percentile_ranks — the CDF (in percent) of fixed
  // thresholds per group, the other half of OpenSearch's percentile agg
  // pair. Pure integer counts scaled once (exact cross-engine doubles).
  def q53PercentileRanks(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def pr(v: Double) = round(
      sum(when($"l_quantity" <= v, 1L).otherwise(0L)) * 100.0 / count(lit(1)), 6)
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(pr(10).as("pr_10"), pr(25).as("pr_25"), pr(40).as("pr_40"),
        count(lit(1)).as("n"))
      .orderBy($"l_returnflag")
  }

  // Streaming sessionization, end-to-end: the q49 session operator run
  // as a REAL checkpointed stream (parquet spool source → watermarked
  // session_window agg → append parquet sink; sessions merge across
  // batches in the state store and emit when the watermark passes the
  // session end). Two availableNow runs on one checkpoint per the
  // stateful-gate convention; sentinels (user -1) advance the watermark
  // and are filtered from the output. Oracle = q49's gaps-and-islands
  // recompute on the source.
  def q54StreamSessions(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val schema = Tables.eventsFileSchema(s, dir)
    val tmp = tempDir("graft-q54")
    val spool = java.nio.file.Files.createDirectories(tmp.resolve("spool"))
    java.nio.file.Files.createSymbolicLink(
      spool.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val maxMs = Tables.events(s, dir).agg(max(unix_millis($"ts"))).head().getLong(0)
    def sentinel(offMs: Long): Unit = {
      val dir1 = tmp.resolve(s"sentinel-$offMs")
      Tables.eventSentinel(s, schema, maxMs + offMs)
        .coalesce(1).write.parquet(dir1.toString)
      val listing = java.nio.file.Files.list(dir1)
      try {
        val part = listing.iterator()
        while (part.hasNext) {
          val p = part.next()
          if (p.getFileName.toString.endsWith(".parquet"))
            java.nio.file.Files.copy(p, spool.resolve(s"sentinel-$offMs.parquet"))
        }
      } finally listing.close()
    }
    // session state shards sized to ~user cardinality (see
    // Pipelines.sessionFor); cloned session, caller conf untouched
    val s2 = s.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    def run(): Unit = {
      val raw = s2.readStream.schema(schema)
        .option("maxFilesPerTrigger", 100000).parquet(spool.toString)
      val ev = Tables.normalizeEventTs(raw)
      ev.withWatermark("ts", "1 minute")
        .groupBy(session_window(col("ts"), "6 hours"), col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          min(unix_millis(col("ts"))).as("start_ms"),
          max(unix_millis(col("ts"))).as("end_ms"))
        .select(col("user_id"), col("n_events"), col("start_ms"), col("end_ms"))
        .writeStream.format("parquet")
        .option("path", s"$tmp/tables/sessions")
        .option("checkpointLocation", s"$tmp/ckpt/sessions")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
    }
    sentinel(86400000L)
    run()
    sentinel(2L * 86400000L)
    run()
    s.read.parquet(s"$tmp/tables/sessions")
      .filter($"user_id" >= 0)
      .orderBy($"user_id", $"start_ms")
  }

  // A14 delivery dedup, oracle-gated: the whole events table is
  // delivered TWICE (two spool files — an at-least-once upstream
  // redelivering a batch), streamed through watermark-bounded
  // dropDuplicatesWithinWatermark on the unique event key, and the sink
  // must equal the single-copy source exactly (q25's oracle). Dedup
  // state is evicted once the watermark passes eventTime + delay — at
  // 100 TB the state holds only the watermark-deep tail, not history.
  def q55DedupDelivery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val schema = Tables.eventsFileSchema(s, dir)
    val tmp = tempDir("graft-q55")
    val spool = java.nio.file.Files.createDirectories(tmp.resolve("spool"))
    for (copy <- Seq("a", "b")) // duplicate delivery of the full table
      java.nio.file.Files.createSymbolicLink(
        spool.resolve(s"events-$copy.parquet"),
        java.nio.file.Paths.get(s"$dir/events.parquet"))
    val s2 = s.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    val raw = s2.readStream.schema(schema)
      .option("maxFilesPerTrigger", 100000).parquet(spool.toString)
    Tables.normalizeEventTs(raw)
      .withWatermark("ts", "1 minute")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.format("parquet")
      .option("path", s"$tmp/tables/deduped")
      .option("checkpointLocation", s"$tmp/ckpt/deduped")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination()
    s.read.parquet(s"$tmp/tables/deduped")
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct($"user_id").as("n_users"),
        max($"value").as("max_value"))
      .orderBy($"event_type")
  }

  // Range (point-in-interval) join via bin bucketing: campaign windows
  // (2h after every purchase by a user_id%10 cohort) gather ALL events
  // falling inside them — no key equality, pure containment. The bin
  // width equals the interval length, so each interval explodes to ≤2
  // bin rows and the join is an ordinary equi hash join; the oracle is
  // DuckDB's native inequality join (IEJoin). Integer value sums keep
  // the compare exact.
  def q56RangeJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .select($"event_id", unix_millis($"ts").as("ms"), $"user_id", $"value")
    val iv = Tables.events(s, dir)
      .filter($"event_type" === "purchase" && $"user_id" % 10 === 0)
      .select($"event_id".as("iv_id"), unix_millis($"ts").as("s_ms"),
        (unix_millis($"ts") + lit(7200000L)).as("e_ms"))
    graft.operators.RangeJoin.pointInInterval(
        ev, iv, "ms", "s_ms", "e_ms", binWidthMs = 7200000L)
      .groupBy($"iv_id")
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct($"user_id").as("n_users"),
        sum(floor($"value" * 1000).cast("long")).as("sum_val_m"))
      .orderBy($"iv_id")
  }

  // Token-weighted corpus sampling (A-ES reservoir): draw 25 documents
  // with inclusion odds ∝ token count — the "sample text mass, not doc
  // count" primitive corpus mixing needs. Selection is a pure function
  // of (doc_id, weight), so DuckDB replays the identical u^(1/w) draw;
  // output re-sorted by doc_id so only SELECTION is compared (the key
  // itself stays internal).
  def q57WeightedSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
      .select($"doc_id", $"lang", TextAnalysis.tokenCount($"text").as("n_tokens"))
    graft.operators.Datasplit.weightedSample(docs, "doc_id", "n_tokens", k = 25, salt = "ws")
      .orderBy($"doc_id")
  }

  // Streaming LSH index maintenance, end-to-end: the embeddings table
  // arrives in TWO deliveries (vec_id parity) on one checkpoint; each
  // availableNow run appends its rows into the partitioned index layout
  // through the exactly-once file sink. After both deliveries the index
  // holds every vector exactly once and the same Hamming-ball probe as
  // q34 runs against it — the oracle recomputes signatures over the
  // whole table in SQL (srpOracleSql, query vec_id=4), so it proves the
  // incrementally-built index ≡ the batch-built one.
  def q59StreamLshIndex(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val dim = Similarity.dimOf(emb, "embedding")
    val tmp = tempDir("graft-q59")
    val spool = tmp.resolve("spool").toString
    val idx = tmp.resolve("lsh_index").toString
    val ckpt = tmp.resolve("ckpt").toString
    val s2 = s.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    for (parity <- 0 to 1) {
      emb.filter(col("vec_id") % 2 === parity)
        .write.mode("append").parquet(spool)
      val stream = s2.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 100000).parquet(spool)
      Similarity.appendLshIndexStream(stream, "embedding", idx, ckpt, dim,
        bits = idxBits).awaitTermination()
    }
    Similarity.queryLshIndex(s, idx, "vec_id", "embedding",
      fetchVec(emb, 4L), k = 10, bits = idxBits, maxHamming = idxMaxHamming)
  }

  // Conversion funnel over the event stream: first-touch strict
  // sequence view → click → purchase with a 24h per-step window. The
  // oracle replays the same chained first-qualifying-event aggregation;
  // counts are null-ignoring so drop-outs propagate identically.
  def q60Funnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.operators.Funnel.counts(
      Tables.events(s, dir)
        .select($"user_id", unix_millis($"ts").as("ms"), $"event_type"),
      "user_id", "ms", "event_type",
      Seq("view", "click", "purchase"), windowMs = 86400000L)
  }

  // Near-duplicate CLUSTERS: the q18 MinHash pair stream closed under
  // transitivity by alternating large-star/small-star — "keep one per
  // cluster" semantics even where jaccard is not transitive. The oracle
  // runs a recursive CTE over the brute-forced pair set (sound at
  // sf0.01 scale; the engine never materializes the closure that way).
  def q61DedupClusters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pairs = Dedup.neardupPairs(Tables.documents(s, dir), "doc_id", "text",
      shingleK = 3, p = 64, bands = 16, threshold = 0.8)
    graft.operators.ConnectedComponents.labels(pairs, "id_a", "id_b")
      .select($"node".as("doc_id"), $"cluster")
      .orderBy($"doc_id")
  }

  // Train/eval decontamination (the pre-training containment check):
  // docs with doc_id%20==7 act as the held-out eval set; the report
  // flags corpus docs sharing rare word-8-grams with it. The df cap is
  // part of the semantics (both engines apply it), so the gram join is
  // never quadratic on boilerplate grams.
  def q58Decontaminate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    graft.dedup.Decontaminate.contaminationReport(
        docs.filter($"doc_id" % 20 =!= 7),
        docs.filter($"doc_id" % 20 === 7), "doc_id", "text")
      .select($"corpus_id".as("doc_id"), $"n_eval_docs", $"max_shared", $"total_shared")
      .orderBy($"doc_id")
  }

  // Dedup-AWARE train/val/test split: the leakage-safe split key is
  // the near-duplicate CLUSTER (q61's transitive closure), not the
  // document — so near-copies can never straddle train/test even
  // when similarity is non-transitive; singletons key on their own
  // id. Composes the MinHash pipeline, connected components, and the
  // md5 hash split; the oracle replays all three.
  def q97ClusterSplit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pairs = Dedup.neardupPairs(Tables.documents(s, dir), "doc_id", "text",
      shingleK = 3, p = 64, bands = 16, threshold = 0.8)
    val clusters = graft.operators.ConnectedComponents.labels(pairs, "id_a", "id_b")
      .select($"node".as("doc_id"), $"cluster")
    val keyed = Tables.documents(s, dir).select($"doc_id")
      .join(clusters, Seq("doc_id"), "left")
      .select($"doc_id", coalesce($"cluster", $"doc_id").as("cluster"))
    graft.operators.Datasplit.hashSplit(keyed, "cluster",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .orderBy($"doc_id")
  }

  // BM25 ranked search (the Lucene-default scorer): saturating tf +
  // document-length normalization over the same zero-explode stats
  // shape as q64 — one single-row aggregate (now also carrying Σ dl
  // for avgdl), broadcast back, row-local scoring, TakeOrdered.
  def q96Bm25(s: SparkSession, dir: String): DataFrame = {
    graft.text.Tfidf.bm25TopK(Tables.documents(s, dir), "doc_id", "text",
      Seq("spark", "shuffle", "dup"), k = 20)
  }

  // Hybrid search: the q64 TF-IDF lexical ranking and a brute-force
  // cosine ranking (query vec 4) fused by reciprocal-rank fusion —
  // only ranks enter, so incomparable score scales don't matter, and
  // the fixed two-operand fusion sum lets the oracle replay both
  // rankings and the fusion exactly. (doc_id and vec_id share the
  // 0..N-1 id space in the driver corpus — documents ↔ embeddings.)
  def q95HybridSearch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val byScore = org.apache.spark.sql.expressions.Window
      .orderBy($"score".desc, $"id")
    val text = graft.text.Tfidf.searchTopK(Tables.documents(s, dir),
        "doc_id", "text", Seq("spark", "shuffle", "dup"), k = 20)
      .select($"doc_id".as("id"), $"score")
      .withColumn("rank", row_number().over(byScore)) // 20-row frame
      .select($"id", $"rank")
    val emb = Tables.embeddings(s, dir)
    val vec = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        emb.filter($"vec_id" === 4).select($"embedding".as("qvec")), k = 20)
      .select($"vec_id".as("id"), $"cos".as("score"))
      .withColumn("rank", row_number().over(byScore)) // 20-row frame
      .select($"id", $"rank")
    graft.operators.RankFusion.rrf(Seq(text, vec), "id", "rank", k0 = 60, topK = 20)
  }

  // Exact-integer k-means over the embedding corpus: 4 clusters, 2
  // Lloyd iterations (init = 4 smallest vec_ids, integer squared-L2,
  // floor-div centroid means) — every step deterministic, so the
  // oracle unrolls both iterations in SQL and the ASSIGNMENTS compare
  // exactly, not approximately.
  def q94Kmeans(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.similarity.KMeans.assign(
        Tables.embeddings(s, dir).select($"vec_id", $"embedding"),
        idCol = "vec_id", vecCol = "embedding", k = 4, iterations = 2)
      .orderBy($"vec_id")
  }

  // Schema-evolution union: three "generations" of the events table
  // (v1 without value, v2 with value, v3 with value + a props flag)
  // merged by column name with null-fill and provenance tags — then
  // audited per source. The oracle is the explicit UNION ALL with
  // NULL-padded columns.
  def q93SchemaMerge(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = Tables.events(s, dir)
      .select($"event_id", $"event_type", floor($"value" * 1000).cast("long").as("vm"),
        get_json_object($"props", "$.k").cast("long").as("k"))
    val v1 = base.filter($"event_id" % 3 === 0).select($"event_id", $"event_type")
    val v2 = base.filter($"event_id" % 3 === 1).select($"event_id", $"event_type", $"vm")
    val v3 = base.filter($"event_id" % 3 === 2)
    graft.operators.SchemaMerge.unionEvolved(Seq("v1" -> v1, "v2" -> v2, "v3" -> v3))
      .groupBy($"__source", $"event_type")
      .agg(count(lit(1)).as("n"), sum($"vm").as("sum_vm"),
        count($"vm").as("n_vm"), count($"k").as("n_k"))
      .orderBy($"__source", $"event_type")
  }

  // Write-audit-publish end-to-end: the daily event rollup is staged,
  // audited (non-empty, no null keys, exact row-count reconciliation
  // against the source), and atomically swapped live; the QUERY reads
  // the PUBLISHED table, so the oracle (the same rollup straight from
  // the source) proves the staged→live swap preserved every row.
  def q92Wap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val live = tempDir("graft-q92").resolve("rollup").toString
    val src = Tables.events(s, dir)
      .select(expr("unix_millis(ts) div 86400000").as("day"), $"event_type",
        floor($"value" * 1000).cast("long").as("vm"))
    val rollup = src.groupBy($"day", $"event_type")
      .agg(count(lit(1)).as("n"), sum($"vm").as("sum_vm"))
    val expected = src.count()
    val rpt = graft.operators.Publish.writeAuditPublish(s, rollup, live, Seq(
      "non_empty" -> (d => d.count() > 0),
      "no_null_keys" -> (d => d.filter($"day".isNull || $"event_type".isNull).count() == 0),
      "reconciles" -> (d => d.agg(sum($"n")).as[Long].head() == expected)))
    require(rpt.published, s"audit failed: ${rpt.failed}")
    s.read.parquet(live).orderBy($"day", $"event_type")
  }

  // STREAMING SCD2 maintenance end-to-end: the event table arrives in
  // TWO deliveries (event_id parity) on one checkpoint; each
  // availableNow run lands its batch idempotently in the history spool
  // and rebuilds ONLY the touched key buckets of the dimension
  // (dynamic partition overwrite). The oracle is q72's batch SQL over
  // the whole table — the incrementally-maintained dim must equal the
  // full rebuild exactly.
  def q91StreamScd2(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .select($"user_id", $"event_id", unix_millis($"ts").as("ms"), $"event_type")
    val tmp = tempDir("graft-q91")
    val src = tmp.resolve("src").toString
    val s2 = s.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    for (parity <- 0 to 1) {
      ev.filter($"event_id" % 2 === parity).write.mode("append").parquet(src)
      val stream = s2.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 100000).parquet(src)
      graft.operators.Scd2.maintainStream(stream,
        keyCol = "user_id", tsCol = "ms", valueCol = "event_type", tieCol = "event_id",
        spoolPath = tmp.resolve("spool").toString,
        dimPath = tmp.resolve("dim").toString,
        checkpoint = tmp.resolve("ckpt").toString).awaitTermination()
    }
    s.read.parquet(tmp.resolve("dim").toString)
      .select($"user_id", $"value", $"valid_from", $"valid_to", $"n_events",
        $"is_current".cast("long").as("is_current"))
      .orderBy($"user_id", $"valid_from", $"value")
  }

  // Chunk → reassemble round trip: documents sharded into 64-char
  // chunks (the context-window primitive), processed row-parallel,
  // then reassembled in chunk order; md5 of the reassembled text vs
  // md5 of the UNTOUCHED source is the identity proof — the oracle
  // never sees the chunking at all.
  def q90ChunkRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val chunks = graft.text.Chunker.chunk(
      Tables.documents(s, dir).select($"doc_id", $"text"), "doc_id", "text", chunkChars = 64)
    val stats = chunks.groupBy($"doc_id").agg(count(lit(1)).as("n_chunks"))
    graft.text.Chunker.reassemble(chunks, "doc_id", "chunk_ix", "chunk")
      .join(stats, "doc_id")
      .select($"doc_id", $"n_chunks", length($"text").cast("long").as("len"),
        md5($"text".cast("binary")).as("fp"))
      .orderBy($"doc_id")
  }

  // Interval union (coverage islands): every event projects a 30-min
  // activity span; overlapping/touching spans merge into maximal
  // covered islands per user — running-max-end gaps-and-islands on one
  // key partitioning. Output is per-user coverage stats, all integer.
  def q89IntervalMerge(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val spans = Tables.events(s, dir)
      .select($"user_id", $"event_id", unix_millis($"ts").as("s_ms"),
        (unix_millis($"ts") + lit(1800000L)).as("e_ms"))
    graft.operators.Intervals.merge(spans, "user_id", "s_ms", "e_ms", "event_id")
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_islands"),
        sum($"island_end" - $"island_start").as("covered_ms"),
        max($"island_end" - $"island_start").as("longest_ms"),
        sum($"n_merged").as("n_spans"))
      .orderBy($"user_id")
  }

  // Mergeable histogram-sketch table → range percentiles: per-day
  // fixed-width bin counts land in a parquet "sketch table" (q25
  // pattern), then a 16-day range is answered by MERGING parts —
  // never rescanning raw events. Unlike the HLL table (q70), bins and
  // estimates are pure integer math, so the oracle replays sketch,
  // merge, and estimate exactly; the ±width/2 value error is the
  // operator's stated contract, checked in HistogramSketchSpec.
  def q88RangeQuantiles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tmp = tempDir("graft-q88").resolve("hist").toString
    val ev = Tables.events(s, dir)
      .select(expr("unix_millis(ts) div 86400000").as("day"),
        floor($"value" * 1000).cast("long").as("vm"))
    graft.operators.HistogramSketch.parts(ev, "day", "vm", width = 1000L)
      .write.mode("overwrite").parquet(tmp)
    val parts = s.read.parquet(tmp)
      .filter($"day".between(19727L, 19742L)) // 2024-01-05 .. 2024-01-20
    graft.operators.HistogramSketch.quantiles(parts, width = 1000L, ps = Seq(50, 90, 99))
      .orderBy($"p")
  }

  // SLIDING-window rates (1h window, 15m slide): each event lands in
  // exactly 4 overlapping windows — the dashboard "rate over trailing
  // hour, refreshed every 15 min" series. Spark's window() emits the
  // epoch-aligned slide set; the oracle regenerates the same 4 window
  // starts per event with integer math.
  def q85SlidingWindow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select($"ts", $"event_type", floor($"value" * 1000).cast("long").as("vm"))
      .groupBy(window($"ts", "1 hour", "15 minutes"), $"event_type")
      .agg(count(lit(1)).as("n"), sum($"vm").as("sum_vm"))
      .select(unix_millis($"window.start").as("ws"), $"event_type", $"n", $"sum_vm")
      .orderBy($"ws", $"event_type")
  }

  // Order-2 sequence mining: counts of every length-3 event-type run
  // per user — the n-gram generalization of the q74 transition matrix
  // (one lead() chain in a single window stage, counts on the
  // |states|³ aggregate). Full matrix output; exact counts.
  def q86Trigrams(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.operators.Markov.sequenceCounts(
        Tables.events(s, dir)
          .select($"user_id", $"event_id", unix_millis($"ts").as("ms"), $"event_type"),
        keyCol = "user_id", tsCol = "ms", tieCol = "event_id",
        typeCol = "event_type", n = 3)
      .orderBy($"s1", $"s2", $"s3")
  }

  // Per-class example cap (corpus balancing): at most 40 docs per
  // language, selected by md5-of-id order — deterministic, append-
  // stable, attribute-independent. The oracle replays the identical
  // hash-ordered row_number cut.
  def q87ClassCap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.operators.Datasplit.classCap(
        Tables.documents(s, dir).select($"doc_id", $"lang"),
        labelCol = "lang", idCol = "doc_id", k = 40)
      .orderBy($"doc_id")
  }

  // Skew-safe salted join: events (hot user keys) against a per-user
  // cohort dim on (user_id, salt) with ×8 dim replication — the
  // explicit planner-independent skew spread; SaltedJoinSpec proves
  // result ≡ plain join and actual salt spread. The oracle is the
  // unsalted join, so the compare IS the equivalence proof on real data.
  def q84SaltedJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .select($"user_id", $"event_type", floor($"value" * 1000).cast("long").as("vm"))
    val dim = Tables.events(s, dir).select($"user_id", unix_millis($"ts").as("ms"))
      .groupBy($"user_id").agg(expr("min(ms) div 86400000").as("cohort_day"))
    graft.operators.SaltedJoin.inner(ev, dim, Seq("user_id"), replication = 8)
      .groupBy($"event_type", $"cohort_day")
      .agg(count(lit(1)).as("n"), sum($"vm").as("sum_vm"))
      .orderBy($"event_type", $"cohort_day")
  }

  // Golden-record survivorship per user: latest non-null value per
  // field — the metric is deliberately nulled on 'error' events, so
  // "latest value" and "latest GOOD value" genuinely differ and the
  // gaps-don't-erase rule is load-bearing. One algebraic struct-argmax
  // aggregate; the oracle replays it as first-non-null-in-DESC-order.
  def q83GoldenRecord(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .select($"user_id", $"event_id", unix_millis($"ts").as("ms"), $"event_type",
        when($"event_type" =!= "error", floor($"value" * 1000).cast("long")).as("vm"))
    graft.operators.Survivorship.goldenRecord(
        ev, keyCol = "user_id", tsCol = "ms", tieCol = "event_id",
        fields = Seq("event_type", "vm"))
      .orderBy($"user_id")
  }

  // Snapshot diff between two derived versions of the events table
  // (deterministic edits: %5 deletions, %7 late arrivals, %3 value
  // bumps): per-status counts + key checksums. One full-outer hash
  // join; change detection is null-safe column compare on both engines.
  def q82SnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = Tables.events(s, dir)
      .select($"event_id", $"event_type", floor($"value" * 1000).cast("long").as("vm"))
    val old = base.filter($"event_id" % 7 =!= 0)
    val neu = base.filter($"event_id" % 5 =!= 0)
      .withColumn("vm", when($"event_id" % 3 === 0, $"vm" + 1).otherwise($"vm"))
    graft.operators.SnapshotDiff.diff(old, neu, Seq("event_id"), Seq("event_type", "vm"))
      .groupBy($"status")
      .agg(count(lit(1)).as("n"), sum($"event_id").as("id_sum"))
      .orderBy($"status")
  }

  // Pairwise Pearson correlation between the five event types' daily
  // metric totals: exact BIGINT sufficient statistics (the series are
  // integerized day aggregates), one fixed-shape double step at the
  // end — the oracle replays the identical formula.
  def q81Correlate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = Tables.events(s, dir)
      .select(date_format($"ts", "yyyy-MM-dd").as("day"), $"event_type",
        floor($"value").cast("long").as("v"))
      .groupBy($"day", $"event_type").agg(sum($"v").as("s"))
    graft.operators.Correlate.pairwisePearson(daily, "day", "event_type", "s")
      .orderBy($"series_a", $"series_b")
  }

  // Pivot: the day × event_type metric matrix, with the pivot value
  // list given EXPLICITLY — the scale-correct form (no collect-distinct
  // pre-job; one shuffle on the grouping key; absent cells stay null).
  // The oracle is the standard conditional-aggregation rewrite.
  def q80Pivot(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select(date_format($"ts", "yyyy-MM-dd").as("day"), $"event_type",
        floor($"value" * 1000).cast("long").as("vm"))
      .groupBy($"day")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(sum($"vm"))
      .orderBy($"day")
  }

  // Z-order (Morton) keys over (user_id, metric): the two-dimensional
  // clustering key that gives files tight bounding boxes on BOTH
  // columns (ZOrderSpec proves the pruning). The key is pure integer
  // bit math, so the oracle replays the spread-bits ladder exactly;
  // `cell` is the coarse curve cell a layout would bucket by.
  def q79Zorder(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select($"event_id",
        $"user_id".bitwiseAND(lit(65535L)).as("u16"),
        floor($"value" * 1000).cast("long").bitwiseAND(lit(65535L)).as("v16"))
      .select($"event_id", graft.operators.ZOrder.zValue2($"u16", $"v16").as("zkey"))
      .withColumn("cell", shiftright($"zkey", 20).cast("long"))
      .orderBy($"event_id")
  }

  // Small-file compaction end-to-end: the events table is deliberately
  // shattered into 64 tiny files (a micro-batch sink's debris), then
  // compacted to ~1 MiB targets via the shuffle-free coalesce path, and
  // the QUERY reads the compacted copy — so the oracle (the same agg on
  // the source table) proves the rewrite lost and duplicated nothing.
  def q78Compact(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tmp = tempDir("graft-q78")
    val frag = tmp.resolve("frag").toString
    val packed = tmp.resolve("packed").toString
    Tables.events(s, dir).select($"event_id", $"user_id", $"event_type", $"value")
      .repartition(64).write.mode("overwrite").parquet(frag)
    val rpt = graft.operators.Compaction.compact(s, frag, packed, targetBytes = 1L << 20)
    require(rpt.filesOut < rpt.filesIn,
      s"compaction must shrink the file count (${rpt.filesIn} -> ${rpt.filesOut})")
    graft.operators.Compaction.read(s, packed)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), countDistinct($"user_id").as("n_users"),
        sum(floor($"value" * 1000).cast("long")).as("sum_val_m"))
      .orderBy($"event_type")
  }

  // Global equi-depth binning of the event metric (feature bucketing):
  // 10 equal-population bins by exact global rank — computed with the
  // two-phase range-repartition prefix sum, never a one-partition
  // ntile window. Integerized metric; the oracle replays the identical
  // row_number()-based bin assignment.
  def q77EquiDepth(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .select($"event_id", floor($"value" * 1000).cast("long").as("vm"))
    graft.operators.EquiDepth.bins(ev, "vm", "event_id", k = 10)
      .groupBy($"bin")
      .agg(count(lit(1)).as("n_rows"), min($"vm").as("min_v"),
        max($"vm").as("max_v"), sum($"vm").as("sum_v"))
      .orderBy($"bin")
  }

  // One-pass data profiling over lineitem: per-column row/null/exact
  // distinct counts + numeric min/max (string columns profile length).
  // One scan, one shuffle; the k count(distincts) ride Spark's Expand.
  def q76Profile(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.operators.ProfileStats.profile(
        Tables.lineitem(s, dir),
        Seq("l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag", "l_linestatus"))
      .orderBy($"col_name")
  }

  // EXACT shingle-set Jaccard self-join — the zero-recall-loss
  // counterpart of q18's MinHash-LSH banding, on the same
  // word-3-shingle sets at the same 0.8 threshold: prefix filtering
  // (rarest-df-first ordering) keeps the exact form subquadratic.
  // The oracle is the q18-style brute-force all-pairs jaccard with
  // all-integer output (shared/union counts), so the compare is exact.
  def q75SetSimJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // codegen'd hash shingles: set-of-hashes ≡ set-of-strings absent
    // xxhash64 collisions (the q157 convention; the string HOF was the
    // measured bottleneck of the whole join — 5.6 s of 13 s at sf0.1)
    val sets = Tables.documents(s, dir)
      .repartition(s.sparkContext.defaultParallelism) // spread shingle work
      .select($"doc_id", graft.plans.GraftFunctions.wordShingleHashes($"text", 3).as("sh"))
    graft.dedup.SetSimJoin.jaccardJoin(sets, "doc_id", "sh", tNum = 8, tDen = 10)
      .orderBy($"id_a", $"id_b")
  }

  // First-order Markov transition matrix over per-user event
  // sequences: exact step counts + row-normalized probabilities. The
  // normalizing window runs on the |states|²-row aggregate, never on
  // raw events; DuckDB replays the identical lead/count/row-normalize.
  def q74Transitions(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.operators.Markov.transitions(
        Tables.events(s, dir)
          .select($"user_id", $"event_id", unix_millis($"ts").as("ms"), $"event_type"),
        keyCol = "user_id", tsCol = "ms", tieCol = "event_id", typeCol = "event_type")
      .orderBy($"from_type", $"to_type")
  }

  // PageRank over the customer→supplier purchase graph (who buys from
  // whom): damped rank with uniform dangling-mass return, 3 fixed
  // iterations in exact BIGINT units so DuckDB replays the loop
  // bit-for-bit as unrolled CTEs. Customers get even node ids,
  // suppliers odd; the graph is bipartite so EVERY supplier dangles —
  // the dangling-return path is load-bearing here, not decorative.
  def q73PageRank(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val edges = Tables.orders(s, dir).select($"o_orderkey", $"o_custkey")
      .join(Tables.lineitem(s, dir).select($"l_orderkey", $"l_suppkey"),
        $"o_orderkey" === $"l_orderkey")
      .select(($"o_custkey".cast("long") * 2).as("src"),
        ($"l_suppkey".cast("long") * 2 + 1).as("dst"))
    graft.operators.PageRank.ranks(edges, "src", "dst", iterations = 3)
      .select($"node", $"rank".as("pr"))
      .orderBy($"node")
  }

  // SCD-type-2 dimension build over the event stream: per-user runs of
  // equal event_type collapsed into [valid_from, valid_to) validity
  // intervals (gaps-and-islands), the open-ended last interval flagged
  // current. One hash partitioning by user_id is reused across the
  // lag/island-sum/lead window steps. The oracle replays the identical
  // lag → island-id → lead SQL; is_current is cast to BIGINT on both
  // sides so the compare never depends on boolean rendering.
  def q72Scd2(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.operators.Scd2.build(
        Tables.events(s, dir)
          .select($"user_id", $"event_id", unix_millis($"ts").as("ms"), $"event_type"),
        keyCol = "user_id", tsCol = "ms", valueCol = "event_type", tieCol = "event_id")
      .withColumn("is_current", $"is_current".cast("long"))
      .orderBy($"user_id", $"valid_from", $"value")
  }

  // Rolling-hash (winnowing-style) document fingerprint: min of the
  // char-window polynomial hashes — robust to edits outside the
  // minimizing window, pure integer math (exact oracle).
  def q33RollingFingerprint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .repartition(s.sparkContext.defaultParallelism) // char-level fold is CPU-heavy
      .select($"doc_id", TextAnalysis.rollingFingerprint($"text", 16).as("rfp"))
      .orderBy($"doc_id")
  }

  // CDC changelog application (MERGE INTO): snapshot = per-user latest
  // state over the first half of the event stream; changes = the second
  // half with op derived from the event type (error→delete,
  // signup→insert, else update), version order = (ms, event_id) made a
  // single total-order key. One argmax aggregation reduces the
  // changelog, one full-outer key join applies it — the oracle replays
  // winner selection and the merge in SQL.
  def q98MergeCdc(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.events(s, dir).select(
      $"user_id", $"event_type".as("typ"),
      floor($"value" * 1000).cast("long").as("vm"),
      (unix_millis($"ts") * 1000000L + $"event_id" % 1000000L).as("seq"),
      unix_millis($"ts").as("ms"))
    val mm = e.agg(min($"ms"), max($"ms")).head()
    val mid = (mm.getLong(0) + mm.getLong(1)) / 2
    val snapshot = e.filter($"ms" < mid)
      .groupBy($"user_id")
      .agg(max_by(struct($"typ", $"vm"), $"seq").as("w"))
      .select($"user_id", $"w.typ".as("typ"), $"w.vm".as("vm"))
    val changes = e.filter($"ms" >= mid)
      .withColumn("op",
        when($"typ" === "error", "D").when($"typ" === "signup", "I").otherwise("U"))
    graft.operators.MergeApply(snapshot, changes, "user_id", "seq", "op",
        Seq("typ", "vm"))
      .orderBy($"user_id")
  }

  // File-level min/max data skipping: events written range-partitioned
  // on the metric into 16 files with a side stats index; a range query
  // reads ONLY the files whose [min,max] envelope intersects, plus the
  // row-level residual filter. The oracle runs the same predicate over
  // the source table — pruning must be invisible to results. Pruning
  // effectiveness (files actually skipped) is asserted in FileStatsSpec.
  def q99FileSkip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val path = tempDir("graft-q99").resolve("ev").toString
    val src = Tables.events(s, dir)
      .select($"event_id", $"event_type", floor($"value" * 1000).cast("long").as("vm"))
    graft.sources.FileStats.writeWithStats(src, path, "vm", numFiles = 16)
    val (pruned, nSel, nTot) = graft.sources.FileStats.prunedRead(s, path, 50000L, 150000L)
    require(nSel < nTot, s"expected file skipping, read $nSel of $nTot")
    pruned.filter($"vm" >= 50000L && $"vm" <= 150000L)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_rows"), sum($"vm").as("sum_vm"))
      .orderBy($"event_type")
  }

  // Temperature-based corpus mixing over the skewed language mix
  // (alpha=0.5): big languages thinned toward uniform, rarest kept
  // whole, keep decisions replayable (md5 uniforms). Integer-only
  // output (kept counts + id checksum per language).
  def q100TemperatureMix(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.operators.Datasplit.temperatureMix(
        Tables.documents(s, dir).select($"doc_id", $"lang"),
        "doc_id", "lang", alpha = 0.5, salt = "tm")
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_kept"), sum($"doc_id").as("sum_ids"))
      .orderBy($"lang")
  }

  // C4-style corpus-wide segment dedup: 12-word segments, first
  // occurrence (by doc id, then position) wins globally, documents
  // rebuilt from surviving segments. Output is per-doc segment counts +
  // the md5 fingerprint of the rebuilt text, so the oracle pins BOTH
  // the drop decisions and the reassembly order.
  def q101SegmentDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.text.SegmentDedup.dedupSegments(
        Tables.documents(s, dir), "doc_id", "text", width = 12)
      .orderBy($"doc_id")
  }

  // Edit-distance-1 fuzzy self-join on supplier names via SymSpell
  // deletion-neighborhood blocking + exact levenshtein verify. The
  // oracle brute-forces all pairs — the engine never does.
  def q102FuzzyJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.text.FuzzyJoin.editDistance1Pairs(
        Tables.supplier(s, dir), "s_suppkey", "s_name")
      .withColumn("dist", $"dist".cast("long"))
      .orderBy($"id_a", $"id_b")
  }

  // Star-schema revenue rollup: lineitem ⋈ orders ⋈ customer with the
  // nation/region dims broadcast — the canonical warehouse join tree
  // (fact-side shuffles on join keys only, dims never shuffle).
  // Revenue integerized at cents so the compare is exact.
  def q103StarJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(s, dir), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(s, dir)), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", year($"o_orderdate").cast("long").as("o_year"))
      .agg(
        floor(sum($"l_extendedprice" * (lit(1.0) - $"l_discount") * lit(100.0))).cast("long").as("revenue_cents"),
        countDistinct($"o_orderkey").as("n_orders"))
      .orderBy($"r_name", $"o_year")
  }

  // Per-type winsorization of the event metric at exact [p05, p95]
  // rank bounds (deterministic tie order), then clamped totals — pure
  // integer order statistics, replayed bit-for-bit by the oracle.
  def q104Winsorize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .select($"event_type", $"event_id", floor($"value" * 1000).cast("long").as("vm"))
    graft.operators.Winsorize.clamp(ev, "event_type", "vm", "event_id", 0.05, 0.95)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_rows"), min($"clamped").as("lo_v"),
        max($"clamped").as("hi_v"), sum($"clamped").as("sum_clamped"))
      .orderBy($"event_type")
  }

  // Data-quality expectation gates: four named rules evaluated in one
  // scan, per-rule violation counts + ok/quarantine totals. Rules are
  // chosen so each bucket is non-trivially populated at every SF.
  private def q105Rules(s: SparkSession): Seq[(String, org.apache.spark.sql.Column)] = {
    import s.implicits._
    Seq(
      "value_in_range" -> ($"value".isNotNull && $"value" >= 0.0 && $"value" <= 250.0),
      "known_type" -> $"event_type".isin("view", "click", "purchase", "signup", "error"),
      "valid_user" -> ($"user_id".isNotNull && $"user_id" >= 0L),
      "props_k_low" -> {
        val k = regexp_extract($"props", "\"k\": (\\d+)", 1)
        (k =!= "") && k.cast("long").between(0L, 49L)
      })
  }

  def q105Expectations(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.operators.Expectations.report(Tables.events(s, dir), q105Rules(s))
      .orderBy($"rule")
  }

  // Robust per-type location/scale: exact lower median + MAD of the
  // integerized metric, plus robust-z outlier counts at 5 MADs —
  // rank-based integers only, replayed bit-for-bit by the oracle.
  def q106RobustScale(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .select($"event_type", $"event_id", floor($"value" * 1000).cast("long").as("vm"))
    graft.operators.RobustStats.medianMadOutliers(ev, "event_type", "vm", "event_id", zmax = 5L)
      .orderBy($"event_type")
  }

  // Exact triangle count over the co-purchase part graph (parts that
  // appear in the same order), via degree-ordered orientation — the
  // skew-capped wedge join. The oracle brute-forces the 3-way join on
  // canonical a<b<c edges; the engine never materializes unoriented
  // wedges.
  def q107Triangles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir).select($"l_orderkey", $"l_partkey")
    val edges = graft.operators.Edges.coOccurrence(li, "l_orderkey", "l_partkey",
      graft.operators.Edges.orderGroupCap)
      .select($"a".as("src"), $"b".as("dst"))
    graft.operators.Triangles.count(edges, "src", "dst")
  }

  // K-anonymity audit of a customer extract under the quasi-identifier
  // (nation, market segment, balance rounded to thousands): class
  // sizes, classes/rows below k=5 — the privacy gate a training
  // extract passes before release.
  def q108KAnonymity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val qi = Tables.customer(s, dir).select(
      $"c_nationkey".cast("long").as("nat"),
      $"c_mktsegment".as("seg"),
      floor($"c_acctbal" / 1000.0).cast("long").as("bal_k"))
    graft.operators.KAnonymity.audit(qi, Seq("nat", "seg", "bal_k"), k = 5L)
  }

  // Arbitrary GROUPING SETS (not rollup/cube): per (type, day), per
  // type, and grand total in ONE pass over events — Spark's Expand
  // feeds all three grains into a single aggregation, the way a
  // dashboard requests exactly the grains it renders.
  def q109GroupingSets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir).select(
      $"event_type", expr("unix_millis(ts) div 86400000").as("day"),
      floor($"value" * 1000).cast("long").as("vm"))
    ev.groupingSets(
        Seq(Seq($"event_type", $"day"), Seq($"event_type"), Seq.empty),
        $"event_type", $"day")
      .agg(count(lit(1)).as("n"), sum($"vm").as("sum_vm"),
        grouping_id().as("gid"))
      .select(coalesce($"event_type", lit("ALL")).as("event_type"),
        coalesce($"day", lit(-1L)).as("day"), $"n", $"sum_vm", $"gid")
      .orderBy($"gid", $"event_type", $"day")
  }

  // Entity resolution end-to-end: edit-distance-1 blocking+verify on
  // supplier names (q102's join) → connected-component closure → one
  // golden record per cluster (richest member's name, deterministic
  // ties). Composes three operator families the way a real MDM
  // pipeline chains them; the oracle replays pairs, closure (recursive
  // CTE) and survivorship in SQL.
  def q110EntityResolution(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sup = Tables.supplier(s, dir).select($"s_suppkey", $"s_name",
      floor($"s_acctbal" * 100).cast("long").as("bal_c"))
    val pairs = graft.text.FuzzyJoin.editDistance1Pairs(sup, "s_suppkey", "s_name")
    val labels = graft.operators.ConnectedComponents.labels(pairs, "id_a", "id_b")
      .withColumnRenamed("node", "s_suppkey").withColumnRenamed("cluster", "cl")
    sup.join(labels, Seq("s_suppkey"), "left")
      .withColumn("cluster", coalesce($"cl", $"s_suppkey"))
      .groupBy($"cluster")
      .agg(count(lit(1)).as("n_members"),
        max_by($"s_name", struct($"bal_c", -$"s_suppkey")).as("best_name"),
        max($"bal_c").as("max_bal_c"))
      .orderBy($"cluster")
  }

  // Incremental view maintenance: a per-(user, type) count/sum view
  // built from the first half of the events stream, then maintained
  // under the second half as a SIGNED changelog (errors retract) —
  // work is O(touched keys), never a history rescan. The oracle
  // recomputes the view from scratch with the same signs; maintained
  // must equal rebuilt exactly.
  def q111IncrementalView(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.events(s, dir).select(
      $"user_id", $"event_type".as("typ"),
      floor($"value" * 1000).cast("long").as("vm"),
      unix_millis($"ts").as("ms"))
    val mm = e.agg(min($"ms"), max($"ms")).head()
    val mid = (mm.getLong(0) + mm.getLong(1)) / 2
    val view = graft.operators.IncrementalView.build(
      e.filter($"ms" < mid), Seq("user_id", "typ"), "vm", "n", "sum_vm")
    val delta = e.filter($"ms" >= mid)
      .withColumn("sign", when($"typ" === "error", -1L).otherwise(1L))
    graft.operators.IncrementalView.applyDelta(
        view, delta, Seq("user_id", "typ"), "n", "sum_vm", "sign", "vm")
      .orderBy($"user_id", $"typ")
  }

  // Sorted-neighborhood near-dup candidates: block on the first 32
  // chars, compare only rank-adjacent docs within a 5-wide window,
  // verify with edit distance over the 80-char prefix. w·n candidates
  // by construction (skew-immune), and the global ordering comes from
  // GlobalRank's distributed range sort — no single-partition window.
  // The oracle replays the same window definition with a row_number
  // self-join.
  def q112SortedNeighborhood(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir).select($"doc_id", $"text")
    graft.text.SortedNeighborhood.nearDupPairs(docs, "doc_id", "text",
        t => substring(t, 1, 32), w = 5, verifyPrefix = 80, maxDist = 16)
      .withColumnRenamed("id_a", "doc_a").withColumnRenamed("id_b", "doc_b")
      .orderBy($"doc_a", $"doc_b")
  }

  // Daily resample of the per-type metric series with LOCF gap fill
  // onto the table's full [min,max] day range (the bounds probe is one
  // tiny min/max agg — metadata-scale, same convention as q16's span
  // probe). The oracle replays the calendar with generate_series and
  // an IGNORE NULLS running window.
  def q113GapFill(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = Tables.events(s, dir)
      .select($"event_type".as("typ"),
        expr("unix_millis(ts) div 86400000").as("day"),
        floor($"value" * 1000).cast("long").as("vm"))
      .groupBy($"typ", $"day").agg(sum($"vm").as("sum_vm"))
    val mm = daily.agg(min($"day"), max($"day")).head()
    graft.operators.Resample.fillForward(
        daily, "typ", "day", "sum_vm", mm.getLong(0), mm.getLong(1))
      .orderBy($"typ", $"day")
  }

  // Pareto frontier of parts under (minimize price, maximize size) —
  // "the cheapest part at every size class". The engine's two-phase
  // sort-sweep never forms a dominance join; the oracle IS the O(n²)
  // NOT EXISTS dominance definition, so the sweep's tie handling is
  // pinned exactly.
  def q114Skyline(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val p = Tables.part(s, dir).select($"p_partkey",
      floor($"p_retailprice" * 100).cast("long").as("price_c"),
      $"p_size".cast("long").as("sz"))
    graft.operators.Skyline.pareto2d(p, "price_c", "sz")
      .orderBy($"price_c", $"sz", $"p_partkey")
  }

  // Per-(returnflag, linestatus) OLS fit of price-on-quantity via
  // exact integer sufficient stats — one algebraic agg, slope as an
  // exact integer num/den pair plus a floor-divided milli quotient
  // (the q88 floor correction). The oracle recomputes the same closed
  // form.
  def q115GroupRegression(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val l = Tables.lineitem(s, dir).select(
      $"l_returnflag".as("rf"), $"l_linestatus".as("ls"),
      $"l_quantity".cast("long").as("x"),
      floor($"l_extendedprice").cast("long").as("y"))
    graft.operators.Regression.olsStats(l, Seq("rf", "ls"), "x", "y")
      .orderBy($"rf", $"ls")
  }

  // Distribution-drift gate between the first and second half of the
  // events stream: metric values binned at 20-unit width, per-bin
  // frequencies in exact ppm, drift flag at 0.5%. All integer
  // arithmetic — ppm stays bounded at any scale, unlike cross-
  // multiplied chi-square terms.
  def q116FrequencyDrift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.events(s, dir).select(
      expr("floor(value * 1000) div 20000").cast("long").as("bin"),
      unix_millis($"ts").as("ms"))
    val mm = e.agg(min($"ms"), max($"ms")).head()
    val mid = (mm.getLong(0) + mm.getLong(1)) / 2
    graft.operators.Drift.frequencyDrift(
        e.filter($"ms" < mid), e.filter($"ms" >= mid), "bin",
        thresholdPpm = 5000L)
      .orderBy($"bin")
  }

  // Market-basket mining over orders: parts co-purchased in the same
  // order, Apriori item prune before the pair join, support/confidence/
  // lift as exact integers. The oracle replays the same counting.
  def q117AssociationRules(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir)
      .select($"l_orderkey".as("tx"), $"l_partkey".as("item"))
    graft.operators.AssociationRules.frequentPairs(
        li, "tx", "item", minSupItem = 10L, minSupPair = 3L)
      .orderBy($"item_a", $"item_b")
  }

  // Record-linkage candidate scoring over customers: weighted agreement
  // on (segment, balance bucket, name suffix) with integer
  // log-odds-style weights, threshold at 70. The oracle replays the
  // blocked join and CASE-sum score. Blocking is (nation, bal_b), not
  // nation alone — EXACTLY result-preserving because the score
  // arithmetic forces it: without bal_b's 40 the ceiling is
  // seg+suffix = 60 < 70, so every qualifying pair shares bal_b. The
  // sf1 scale sweep measured the difference: nation is a FIXED 25-value
  // domain, so nation-only blocks grow linearly with SF and pair
  // candidates quadratically (×30 on a 10× scale-up); folding the
  // score-mandated bal_b into the block key multiplies block count by
  // the bucket cardinality and keeps the same output. The general rule
  // (RecordLinkage scaladoc): blocking cardinality must scale with the
  // corpus — derive block keys from score-mandated fields first.
  def q118RecordLinkage(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, dir).select(
      $"c_custkey", $"c_nationkey".cast("long").as("nat"),
      $"c_mktsegment".as("seg"),
      floor($"c_acctbal" / 500.0).cast("long").as("bal_b"),
      substring($"c_name", -2, 2).as("suffix"))
    graft.operators.RecordLinkage.scorePairs(c, "c_custkey", Seq("nat", "bal_b"),
        Seq(("seg", 30L), ("bal_b", 40L), ("suffix", 30L)), minScore = 70L)
      .orderBy($"id_a", $"id_b")
  }

  // Per-user activity streaks: maximal runs of consecutive active days
  // via the rank-difference islands trick — one user-partitioned
  // window + one hash-agg. Oracle replays the identical trick.
  def q119ActivityIslands(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.events(s, dir).select($"user_id",
      expr("unix_millis(ts) div 86400000").as("day"))
    graft.operators.Islands.detect(e, "user_id", "day")
      .orderBy($"user_id", $"island_start")
  }

  // 7-observation trailing sum/mean of the per-type daily metric —
  // the dashboard smoothing window — group-partitioned rows frame,
  // truncated integer mean. Oracle: identical window in DuckDB.
  def q120RollingMetrics(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = Tables.events(s, dir)
      .select($"event_type".as("typ"),
        expr("unix_millis(ts) div 86400000").as("day"),
        floor($"value" * 1000).cast("long").as("vm"))
      .groupBy($"typ", $"day").agg(sum($"vm").as("sum_vm"))
    graft.operators.RollingAgg.trailing(daily, "typ", "day", "sum_vm", k = 7)
      .orderBy($"typ", $"day")
  }

  // Inter-arrival gaps between consecutive events of the same user,
  // summarized per type (of the later event) with exact count/min/max/
  // lower-median milliseconds. Oracle replays the lag window and the
  // rank-selected median.
  def q121InterArrival(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.events(s, dir).select($"user_id",
      unix_millis($"ts").as("ms"), $"event_type".as("typ"), $"event_id")
    graft.operators.InterArrival.stats(e, "user_id", "ms", "typ", "event_id")
      .orderBy($"typ")
  }

  // Per-node clustering coefficient over the q107 co-purchase graph:
  // triangle credit from the oriented closing join exploded to all
  // three corners, coefficient as the exact pair (2·tri, deg·(deg−1)).
  // The oracle brute-forces the 3-way canonical-edge join and counts
  // corner appearances.
  def q122ClusteringCoefficient(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir).select($"l_orderkey", $"l_partkey")
    val edges = graft.operators.Edges.coOccurrence(li, "l_orderkey", "l_partkey",
      graft.operators.Edges.orderGroupCap)
      .select($"a".as("src"), $"b".as("dst"))
    graft.operators.Triangles.clusteringCoefficient(edges, "src", "dst")
      .orderBy($"node")
  }

  // Exact rolling 7-day distinct active users per day via credit
  // explosion — each (user, day) activity credits the 7 windows it
  // keeps the user active in; no per-day rescan, no window function.
  // The oracle recounts each day's trailing window with a range join.
  def q123RollingActiveUsers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.events(s, dir).select($"user_id",
      expr("unix_millis(ts) div 86400000").as("day"))
    graft.operators.RollingDistinct.trailingDistinct(e, "user_id", "day", k = 7)
      .orderBy($"day")
  }

  // Quantity-weighted lower-median price per return flag — the
  // volume-weighted typical price. Cross-multiplied half-mass test,
  // (value, tie) deterministic order; oracle replays the running-sum
  // window and the first-qualifying-row select.
  def q124WeightedMedian(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val l = Tables.lineitem(s, dir).select(
      $"l_returnflag".as("rf"),
      floor($"l_extendedprice").cast("long").as("v"),
      $"l_quantity".cast("long").as("w"),
      ($"l_orderkey" * 10L + $"l_linenumber").as("tie"))
    graft.operators.WeightedMedian.weightedMedian(l, "rf", "v", "w", "tie")
      .orderBy($"rf")
  }

  // CUSUM change-point per event type over the daily metric series:
  // reference level = the series' own lower median, peak |CUSUM| day
  // reported with earliest-day ties. Oracle replays median select,
  // running CUSUM and peak pick.
  def q125ChangePoint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = Tables.events(s, dir)
      .select($"event_type".as("typ"),
        expr("unix_millis(ts) div 86400000").as("day"),
        floor($"value" * 1000).cast("long").as("vm"))
      .groupBy($"typ", $"day").agg(sum($"vm").as("s"))
    graft.operators.ChangePoint.cusumPeak(daily, "typ", "day", "s")
      .orderBy($"typ")
  }

  // Which event types drove the metric's change between the two
  // halves of the stream: per-segment sums, delta, and signed ppm
  // share of the total delta. One conditional-sum agg + broadcast
  // total.
  def q126Contribution(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.events(s, dir).select($"event_type".as("seg"),
      floor($"value" * 1000).cast("long").as("vm"),
      unix_millis($"ts").as("ms"))
    val mm = e.agg(min($"ms"), max($"ms")).head()
    val mid = (mm.getLong(0) + mm.getLong(1)) / 2
    graft.operators.Contribution.deltaShares(
        e.withColumn("in_b", $"ms" >= mid), "seg", "vm", "in_b")
      .orderBy($"seg")
  }

  // Concurrent shipments of the same part: interval-overlap SELF-join
  // on bin-bucketed ship spans ([ship_day, ship_day + qty%28 + 3)),
  // each overlapping pair emitted exactly once in its responsibility
  // bin — an ordinary equi-join on (part, bin) Catalyst can shuffle
  // and AQE-split, never a nested-loop. The oracle brute-forces the
  // quadratic self-join; the engine never does.
  def q127OverlapShipments(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = Tables.lineitem(s, dir).select(
        $"l_partkey",
        expr("datediff(cast(l_shipdate as date), date'1970-01-01')")
          .cast("long").as("sd"),
        ($"l_orderkey" * 10L + $"l_linenumber").as("lid"),
        ($"l_quantity".cast("long") % 28L + 3L).as("len"))
      .withColumn("ed", $"sd" + $"len")
    val lft = base.select($"l_partkey".as("pk_l"), $"sd".as("s_l"),
      $"ed".as("e_l"), $"lid".as("id_l"))
    val rgt = base.select($"l_partkey".as("pk_r"), $"sd".as("s_r"),
      $"ed".as("e_r"), $"lid".as("id_r"))
    graft.operators.RangeJoin.intervalOverlap(
        lft, rgt, "s_l", "e_l", "s_r", "e_r", binWidth = 32L,
        keys = Seq("pk_l" -> "pk_r"))
      .filter($"id_l" < $"id_r")
      .groupBy($"pk_l".as("partkey"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(least($"e_l", $"e_r") - greatest($"s_l", $"s_r")).as("overlap_days"))
      .orderBy($"partkey")
  }

  // Category-tree flatten over a derived part hierarchy (parent(k) =
  // max(k div 3, 1) — a ternary tree rooted at 1, depth ≈ log₃ N):
  // pointer doubling resolves every node's (root, depth) in
  // ⌈log₂ depth⌉ self-joins where a WITH-RECURSIVE walk (the oracle)
  // takes depth sequential ones.
  def q128HierarchyFlatten(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val edges = Tables.part(s, dir).select($"p_partkey".as("node"),
      greatest(expr("p_partkey div 3"), lit(1L)).as("parent"))
    graft.operators.Hierarchy.flatten(edges, "node", "parent")
      .orderBy($"node")
  }

  // Melt lineitem's four measure columns to long form (Expand —
  // map-side row fan-out, no shuffle, no UDF), then one generic
  // hash-agg over (flag, measure). Exact cents keep both engines
  // integer. The oracle melts with UNION ALL.
  def q129MeltMeasures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wide = Tables.lineitem(s, dir).select(
      $"l_returnflag".as("rf"),
      floor($"l_quantity" * 100).cast("long").as("quantity"),
      floor($"l_extendedprice" * 100).cast("long").as("extendedprice"),
      floor($"l_discount" * 100).cast("long").as("discount"),
      floor($"l_tax" * 100).cast("long").as("tax"))
    graft.operators.Reshape.melt(wide, Seq("rf"),
        Seq("quantity", "extendedprice", "discount", "tax"), "measure", "cents")
      .groupBy($"rf", $"measure")
      .agg(sum($"cents").as("total_cents"), count(lit(1)).as("n"))
      .orderBy($"rf", $"measure")
  }

  // Relational→nested training-example assembly: each order packs its
  // lines into a sorted array<struct> (one hash-agg + one
  // co-partitioned join, sort_array row-local). Compared via a
  // canonical string signature — struct hashing is engine-specific,
  // strings are not. Childless orders keep empty arrays ('' sig).
  def q130OrderDocuments(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val items = Tables.lineitem(s, dir).select(
      $"l_orderkey",
      $"l_linenumber".cast("long").as("ln"),
      $"l_partkey".as("pk"),
      $"l_quantity".cast("long").as("qty"),
      floor($"l_extendedprice" * 100).cast("long").as("cents"))
    graft.operators.Nest.assemble(
        Tables.orders(s, dir).select($"o_orderkey", $"o_custkey"),
        items, "o_orderkey", "l_orderkey", Seq("ln", "pk", "qty", "cents"))
      .select($"o_orderkey".as("order_key"), $"o_custkey".as("cust_key"),
        size($"items").cast("long").as("n_items"),
        expr("aggregate(items, 0L, (a, x) -> a + x.cents)").as("total_cents"),
        expr("array_join(transform(items, x -> " +
          "concat(x.ln, ':', x.pk, ':', x.qty, ':', x.cents)), '|')")
          .as("items_sig"))
      .orderBy($"order_key")
  }

  // Phrase mining: top bigram collocations by exact integer PMI lift
  // (DECIMAL(38,0) ≡ DuckDB HUGEINT — no log(), no doubles). The
  // oracle recounts unigrams/bigrams and replays the ppm division.
  def q131Collocations(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.text.Collocations.pmiBigrams(
      Tables.documents(s, dir), "text", minCount = 5L, k = 50)
  }

  // Tokenizer vocab of the top-30 tokens (GlobalRank ids — no
  // single-partition window) + per-doc OOV audit; id_sum pins the id
  // ASSIGNMENT, not just vocabulary membership.
  def q132VocabCoverage(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val vocab = graft.text.Vocab.build(docs, "text", vocabSize = 30)
    graft.text.Vocab.coverage(docs, vocab, "text", "doc_id")
      .orderBy($"doc_id")
  }

  // Quantile-normalize the event metric per type onto the global
  // distribution (exact integer rank mapping), then per-type summary.
  // The oracle replays both row_number ladders and the position join.
  def q133QuantileNorm(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.events(s, dir).select($"event_type".as("typ"),
      floor($"value" * 1000).cast("long").as("vm"), $"event_id")
    graft.operators.QuantileNorm.normalize(e, "typ", "vm", "event_id")
      .groupBy($"typ")
      .agg(count(lit(1)).as("n"), sum($"norm").as("sum_norm"),
        min($"norm").as("min_norm"), max($"norm").as("max_norm"))
      .orderBy($"typ")
  }

  // Deterministic integer Welch A/B readout per event type (arm =
  // user-id parity): one conditional-sum hash-agg; variances in
  // DECIMAL(38,0) ≡ HUGEINT; the 2σ gate is exact integer arithmetic
  // both engines replay bit-identically — no float, no order drift.
  def q134AbTest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.events(s, dir).select($"event_type".as("typ"),
      floor($"value" * 1000).cast("long").as("vm"),
      ($"user_id" % 2 === 1).as("arm_b"))
    graft.operators.AbTest.welchGate(e, "typ", "arm_b", "vm").orderBy($"typ")
  }

  // k-core (k=80) of the co-purchase graph: monotone peeling to a
  // fixpoint (degree agg + two id joins per round, lineage truncated).
  // The oracle unrolls 10 peeling rounds — rounds past the fixpoint
  // are no-ops, which is what makes a non-recursive replay sound.
  // Nonempty core at sf0.01, empty at sf0.001 — both gated.
  def q135KCore(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir).select($"l_orderkey", $"l_partkey")
    val edges = graft.operators.Edges.coOccurrence(li, "l_orderkey", "l_partkey",
      graft.operators.Edges.orderGroupCap)
      .select($"a".as("src"), $"b".as("dst"))
    graft.operators.KCore.core(edges, "src", "dst", k = 80).orderBy($"node")
  }

  // Missing-run detection over the delivered-order id sequence
  // (present = totalprice not ≡ 0 mod 5): GlobalRank + rank(r)↔(r+1)
  // equi-join — never a single-partition lead() window (that's the
  // oracle's job).
  def q136SequenceGaps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val present = Tables.orders(s, dir)
      .filter(expr("CAST(floor(o_totalprice) AS BIGINT) % 5 != 0"))
      .select($"o_orderkey")
    graft.operators.SequenceGaps.gaps(present, "o_orderkey")
      .orderBy($"gap_start")
  }

  // Referential-integrity audit over 5 declared relationships, one of
  // them a conformance rule with real violations (orders must point at
  // ACTIVE customers — negative balances orphan ~8% of orders). One
  // left join + conditional count per rule.
  def q137IntegrityAudit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.Integrity.RefRule
    val cust = Tables.customer(s, dir)
    graft.operators.Integrity.audit(Seq(
      RefRule("lineitem.orderkey->orders", Tables.lineitem(s, dir),
        "l_orderkey", Tables.orders(s, dir), "o_orderkey"),
      RefRule("lineitem.suppkey->supplier", Tables.lineitem(s, dir),
        "l_suppkey", Tables.supplier(s, dir), "s_suppkey"),
      RefRule("orders.custkey->customer", Tables.orders(s, dir),
        "o_custkey", cust, "c_custkey"),
      RefRule("orders.custkey->active_customer", Tables.orders(s, dir),
        "o_custkey", cust.filter($"c_acctbal" >= 0), "c_custkey"),
      RefRule("events.user_id->customer", Tables.events(s, dir),
        "user_id", cust, "c_custkey")))
  }

  /** q135's oracle: `rounds` unrolled peel rounds — sound because
    * peeling is monotone and idempotent past its fixpoint (verified ≤6
    * rounds at both gated SFs; 10 leaves margin).
    */
  private def kcoreOracle(k: Int, rounds: Int): String = {
    val sb = new StringBuilder
    sb.append(
      """WITH e0 AS MATERIALIZED (
        | SELECT DISTINCT x.l_partkey AS src, y.l_partkey AS dst
        | FROM lineitem x JOIN lineitem y
        |  ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey)""".stripMargin)
    for (i <- 0 until rounds) {
      sb.append(s""",
        |d${i + 1} AS MATERIALIZED (SELECT node, count(*) deg FROM
        |  (SELECT src AS node FROM e$i UNION ALL SELECT dst FROM e$i) GROUP BY 1),
        |e${i + 1} AS MATERIALIZED (SELECT e$i.src, e$i.dst FROM e$i
        |  JOIN d${i + 1} a ON e$i.src = a.node
        |  JOIN d${i + 1} b ON e$i.dst = b.node
        |  WHERE a.deg >= $k AND b.deg >= $k)""".stripMargin)
    }
    sb.append(s"""
      |SELECT node, CAST(count(*) AS BIGINT) AS core_deg FROM
      | (SELECT src AS node FROM e$rounds UNION ALL SELECT dst FROM e$rounds)
      |GROUP BY 1 ORDER BY node""".stripMargin)
    sb.toString
  }

  // Trending event types under a 7-day half-life: dyadic step decay in
  // exact 2^-16 integer units (one map-combinable hash-agg; no float
  // sum → summation-order-independent, hash-exact oracle). Value
  // stream integerized to cents with floor (round() ties differ across
  // engines; floor doesn't).
  def q138DecayedTrends(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val ref = ev.agg(max(to_date($"ts")).as("__ref"))
    val base = ev.crossJoin(broadcast(ref))
      .select($"event_type",
        datediff($"__ref", to_date($"ts")).as("age"),
        floor($"value" * 100).cast("long").as("vc"))
    graft.operators.Decay.decayedCounts(base, "event_type", "age", "vc",
        halfLife = 7L, maxK = 16)
      .orderBy($"event_type")
  }

  // lang × source contingency audit: exact cell/marginal counts, with
  // expected-under-independence and lift derived per cell by a fixed
  // two-op float expression (no cross-cell float sum — a summed chi²
  // would depend on summation order). Marginal windows run on the
  // cell frame (r×c rows), never on the documents.
  def q139LangSourceIndependence(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.operators.Independence.crosstab(
        Tables.documents(s, dir), "lang", "source")
      .orderBy($"lang", $"source")
  }

  // Benford leading-digit audit of order totals: exact integer ppm
  // math against hard-coded log10(1+1/d) ppm literals (libm log()
  // differs in the last ulp across engines; literals don't).
  def q140BenfordAudit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.operators.Benford.firstDigit(Tables.orders(s, dir), "o_totalprice")
      .orderBy($"digit")
  }

  // Asymmetric containment near-dup pairs on the q75 word-3-shingle
  // sets: |A∩B| ≥ 0.8·min(|A|,|B|) — catches excerpt/quote containment
  // that Jaccard misses (C ≥ J always, so this is a superset of q75's
  // pairs at the same threshold). Prefix-probe against a full inverted
  // index keeps the exact form subquadratic; the oracle brute-forces.
  def q141ContainmentPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // hash-element sets for the same reason as q75 (q157 convention)
    val sets = Tables.documents(s, dir)
      .repartition(s.sparkContext.defaultParallelism) // spread shingle work
      .select($"doc_id", graft.plans.GraftFunctions.wordShingleHashes($"text", 3).as("sh"))
    graft.dedup.SetSimJoin.containmentJoin(sets, "doc_id", "sh",
        tNum = 8, tDen = 10)
      .orderBy($"id_a", $"id_b")
  }

  // Blast radius: min hop distance within 2 undirected hops of seed
  // parts (p_partkey ≤ 5) over the co-purchase graph — frontier-join
  // BFS whose fixed hop budget the oracle unrolls as two CTE rounds
  // (same unroll-soundness argument as q135's peeling).
  def q142KhopReach(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir).select($"l_orderkey", $"l_partkey")
    val edges = graft.operators.Edges.coOccurrence(li, "l_orderkey", "l_partkey",
      graft.operators.Edges.orderGroupCap)
      .select($"a".as("src"), $"b".as("dst"))
    val seeds = Tables.part(s, dir).filter($"p_partkey" <= 5)
    graft.operators.Bfs.hops(edges, "src", "dst", seeds, "p_partkey",
        maxHops = 2)
      .orderBy($"node")
  }

  // Peak concurrent 5-minute sessions per epoch day: sweep-line as
  // relational algebra — ±1 minute deltas pre-aggregated (map-side) to
  // ≤1440 rows/day, running-sum window only on that bounded frame. All
  // integer minute indexes; DuckDB replays the identical windows.
  def q143PeakConcurrency(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val iv = Tables.events(s, dir)
      .select(unix_millis($"ts").as("sms"),
        (unix_millis($"ts") + 300000L).as("ems"))
    graft.operators.Concurrency.dailyPeak(iv, "sms", "ems")
      .orderBy($"day")
  }

  // Top 20 opening 3-event paths per user-day: one entity-day hash-agg
  // builds the ordered prefix row-locally (sorted-struct collect, never
  // a raw-row window); the path count frame is ≤|types|³.
  def q144TopPaths(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .select($"user_id", expr("unix_millis(ts) div 86400000L").as("day"),
        unix_millis($"ts").as("ms"), $"event_id", $"event_type")
    graft.operators.SessionPaths.topPaths(ev, "user_id", "day",
      "ms", "event_id", "event_type", k = 3, topK = 20)
  }

  // Floored running balance per customer (credits floored at zero):
  // order totals as deposits, every third order key a withdrawal. The
  // sequential-looking clamp recurrence runs as two key-partitioned
  // prefix windows via b_i = cum_i − min(0, runmin_i).
  def q145FlooredBalance(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = Tables.orders(s, dir)
      .select($"o_custkey".as("custkey"), $"o_orderdate", $"o_orderkey",
        (floor($"o_totalprice" * 100).cast("long") *
          when($"o_orderkey" % 3 === 0, -1L).otherwise(1L)).as("delta"))
    graft.operators.RunningBalance.floored(d, "custkey",
        Seq("o_orderdate", "o_orderkey"), "delta")
      .orderBy($"custkey")
  }

  // Gini concentration of document length per language — "how unequal
  // is the char mass across docs". Exact integer rank form (decimal
  // intermediates, q134 convention), one group sort + one hash-agg.
  def q146GiniConcentration(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.operators.Gini.concentration(
        Tables.documents(s, dir).select($"lang", $"n_chars", $"doc_id"),
        "lang", "n_chars", "doc_id")
      .orderBy($"lang")
  }

  // Embedding-column quality gate per label: dimensionality, finite-
  // ness, and integerized-squared-norm degeneracy checks, one scan.
  def q147EmbeddingAudit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.similarity.EmbeddingAudit.audit(
        Tables.embeddings(s, dir).withColumn("label", $"label".cast("long")),
        "label", "embedding", expectedDim = 64, minSqNorm = 100000L)
      .orderBy($"label")
  }

  // Language-ID confusion matrix: predicted langId vs labeled lang,
  // with exact integer per-true-class ppm shares. One scan + one cell
  // hash-agg; the row-total window runs on the |langs|² cell frame.
  def q148LangConfusion(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cells = Tables.documents(s, dir)
      .select($"lang", graft.text.TextAnalysis.langId($"text").as("lang_id"))
      .groupBy($"lang", $"lang_id").agg(count(lit(1)).as("n"))
    val byTrue = org.apache.spark.sql.expressions.Window.partitionBy($"lang")
    cells.withColumn("row_total", sum($"n").over(byTrue))
      .withColumn("share_ppm", expr("(n * 1000000L) div row_total"))
      .orderBy($"lang", $"lang_id")
  }

  // Lag-1/lag-7 autocorrelation of daily per-type event value: exact
  // BIGINT sufficient stats over the lag self-join of the AGGREGATED
  // series; only the final Pearson r is float (IEEE sqrt reproduces).
  def q149Autocorrelation(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = Tables.events(s, dir)
      .groupBy($"event_type",
        expr("unix_millis(ts) div 86400000L").as("day"))
      // whole-unit (not milli) quantization keeps n·Σx² inside int64
      // at bench scale — the Correlate caller-scaling convention
      .agg(sum(floor($"value").cast("long")).as("vm"))
    graft.operators.Autocorr.lagK(daily, "event_type", "day", "vm",
        lags = Seq(1L, 7L))
      .orderBy($"event_type", $"lag")
  }

  // Cohort LTV curves: users cohorted by first event day; per age the
  // active count, value collected (cents), and running cohort total.
  def q150CohortValue(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .select($"user_id", expr("unix_millis(ts) div 86400000L").as("day"),
        floor($"value" * 100).cast("long").as("vc"))
    graft.operators.CohortValue.curves(ev, "user_id", "day", "vc")
      .orderBy($"cohort_day", $"age")
  }

  // Revenue concentration per nation: HHI + CR-4 of customer order
  // totals in exact truncating ppm — the dominance audit next to
  // q146's Gini. Holder totals pre-aggregate; windows on the holder
  // frame only.
  def q151RevenueConcentration(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rev = Tables.orders(s, dir)
      .join(Tables.customer(s, dir),
        $"o_custkey" === $"c_custkey")
      .select($"c_nationkey".as("nationkey"), $"o_custkey".as("custkey"),
        floor($"o_totalprice" * 100).cast("long").as("cents"))
    graft.operators.Concentration.hhi(rev, "nationkey", "custkey",
        "cents", k = 4)
      .orderBy($"nationkey")
  }

  // Hierarchical share-of-parent: nation revenue as ppm of its region,
  // region as ppm of the grand total — percent-of-parent at every
  // drill level. Fact side shuffles once on the customer key; nation/
  // region broadcast; all windows on the 25-row nation frame. (ppm
  // numerators bound totals to ~9e12 value-units per int64 — cents at
  // planetary revenue want a coarser unit, the q126 convention.)
  def q152ShareOfParent(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rev = Tables.orders(s, dir)
      .join(Tables.customer(s, dir), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(s, dir)), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(sum(floor($"o_totalprice" * 100).cast("long")).as("cents"))
    val byRegion = org.apache.spark.sql.expressions.Window.partitionBy($"r_name")
    val overall = org.apache.spark.sql.expressions.Window.partitionBy()
    rev
      .withColumn("region_cents", sum($"cents").over(byRegion))
      .withColumn("total_cents", sum($"cents").over(overall))
      .withColumn("nation_share_ppm", expr("(cents * 1000000L) div region_cents"))
      .withColumn("region_share_ppm", expr("(region_cents * 1000000L) div total_cents"))
      .orderBy($"r_name", $"n_name")
  }

  // New-vs-returning daily split: one user-keyed min-agg + join back
  // (co-partitioned), then a day agg with a conditional distinct.
  def q153NewVsReturning(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.events(s, dir)
      .select($"user_id", expr("unix_millis(ts) div 86400000L").as("day"))
    val first = e.groupBy($"user_id").agg(min($"day").as("fd"))
    e.join(first, "user_id")
      .groupBy($"day")
      .agg(countDistinct($"user_id").as("n_users"),
        countDistinct(when($"day" === $"fd", $"user_id")).as("n_new"))
      .withColumn("n_returning", $"n_users" - $"n_new")
      .orderBy($"day")
  }

  // Recency/churn buckets: last-activity distance from the corpus max
  // day, CASE-bucketed — one user max-agg, broadcast reference, tiny
  // bucket agg.
  def q154RecencyChurn(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.events(s, dir)
      .select($"user_id", expr("unix_millis(ts) div 86400000L").as("day"))
    val last = e.groupBy($"user_id").agg(max($"day").as("ld"))
    val ref = e.agg(max($"day").as("__ref"))
    last.crossJoin(broadcast(ref))
      .withColumn("rec", $"__ref" - $"ld")
      .withColumn("bucket_id",
        when($"rec" < 7, 0L).when($"rec" < 14, 1L)
          .when($"rec" < 30, 2L).otherwise(3L))
      .withColumn("bucket",
        when($"rec" < 7, "active").when($"rec" < 14, "cooling")
          .when($"rec" < 30, "at_risk").otherwise("churned"))
      .groupBy($"bucket_id", $"bucket")
      .agg(count(lit(1)).as("n_users"),
        min($"rec").as("min_recency"), max($"rec").as("max_recency"))
      .orderBy($"bucket_id")
  }

  // Ship-SLA attainment per order priority: order→ship lag in days
  // (date arithmetic, never epoch millis on NTZ dates), exact ppm.
  def q155SlaAttainment(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val j = Tables.lineitem(s, dir).select($"l_orderkey", $"l_shipdate")
      .join(Tables.orders(s, dir).select($"o_orderkey", $"o_orderdate",
        $"o_orderpriority"), $"l_orderkey" === $"o_orderkey")
      .select($"o_orderpriority".as("priority"),
        datediff($"l_shipdate", $"o_orderdate").cast("long").as("d"))
    j.groupBy($"priority")
      .agg(count(lit(1)).as("n_lines"),
        sum(when($"d" <= 7, 1L).otherwise(0L)).as("n_within_7d"),
        max($"d").as("max_delay_days"))
      .withColumn("attain_ppm", expr("(n_within_7d * 1000000L) div n_lines"))
      .orderBy($"priority")
  }

  // Pareto point per nation: how many top customers carry 80% of
  // revenue — exact integer threshold on holder-frame running mass.
  def q156ParetoK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rev = Tables.orders(s, dir)
      .join(Tables.customer(s, dir), $"o_custkey" === $"c_custkey")
      .select($"c_nationkey".as("nationkey"), $"o_custkey".as("custkey"),
        floor($"o_totalprice" * 100).cast("long").as("cents"))
    graft.operators.Concentration.paretoK(rev, "nationkey", "custkey",
        "cents", tNum = 8, tDen = 10)
      .orderBy($"nationkey")
  }

  // Corpus novelty per ingestion batch (50 docs each, doc_id order):
  // the fraction of a batch's distinct word 3-shingles whose corpus-
  // wide FIRST occurrence is that batch — the "are we still finding
  // new text" curve. First-occurrence-by-min keeps the cumulative
  // semantics order-free: one gram-keyed shuffle, no stateful scan.
  def q157NgramNovelty(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // codegen'd one-pass shingle hashing (the q18 lesson: the
    // interpreted HOF shingle build was the whole query's cost — 3.6 s
    // vs 0.4 s at sf0.1). Distinct-on-hash ≡ distinct-on-string absent
    // xxhash64 collisions (~n²/2⁶⁵: ~2e-9 at the bench corpus), the
    // same contract q18's banded candidates rest on; the exchange
    // carries 8-byte longs instead of shingle strings.
    val d = Tables.documents(s, dir)
      .select(expr("doc_id div 50").as("batch"),
        graft.plans.GraftFunctions.wordShingleHashes($"text", 3).as("sh"))
    graft.operators.Novelty.ngramNovelty(d, "batch", $"sh")
      .orderBy($"batch")
  }

  // Join-key health audit over the keys the pipeline's joins depend
  // on: null ppm, duplicate ppm, worst multiplicity — each audit is
  // the key-partitioned count the real join would shuffle anyway.
  def q158KeyHealth(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.KeyHealth.KeySpec
    graft.operators.KeyHealth.keyHealth(s, Seq(
        KeySpec(Tables.customer(s, dir), "customer", "c_custkey"),
        KeySpec(Tables.orders(s, dir), "orders", "o_custkey"),
        KeySpec(Tables.lineitem(s, dir), "lineitem", "l_orderkey"),
        KeySpec(Tables.lineitem(s, dir), "lineitem", "l_partkey"),
        KeySpec(Tables.events(s, dir), "events", "user_id")))
      .orderBy($"table_name", $"key_name")
  }

  // Join-fanout explosion detector on the events self-join key: the
  // 20 user_ids whose n² pair count would dominate a sessionization
  // self-join — counts shuffle, rows never do.
  def q159JoinFanout(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.events(s, dir)
    graft.operators.KeyHealth.joinFanout(e, "user_id", e, "user_id", 20)
      .orderBy($"fanout".desc, $"key")
  }

  // Near-time duplicate rate per event type: same (user, type) within
  // one hour = delivery replay / client retry. One shuffle on the
  // entity-type composite; the lag frame is per-entity, never global.
  def q160EventDedupWindow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.operators.WindowDedup.dupStats(
        Tables.events(s, dir)
          .select($"user_id", $"event_type", unix_millis($"ts").as("ms"),
            $"event_id"),
        entityCol = "user_id", typeCol = "event_type", tsMsCol = "ms",
        tieCol = "event_id", windowMs = 3600000L)
      .orderBy($"event_type")
  }

  // Keyset ("search_after") pagination — the deep-page shape that
  // stays O(page) at any offset: the cursor row (rank 100 in the
  // (ms, event_id) DESC sort) is a 1-row broadcast; the page is a
  // keyset-predicate filter + TakeOrdered(50). An OFFSET plan would
  // sort/skip the whole prefix on one node; this never materializes
  // more than topK rows per partition.
  def q161SearchAfter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.events(s, dir)
      .select($"event_id", $"user_id", $"event_type", unix_millis($"ts").as("ms"))
    val cursor = e.orderBy($"ms".desc, $"event_id".desc).limit(100)
      .orderBy($"ms".asc, $"event_id".asc).limit(1)
      .select($"ms".as("cms"), $"event_id".as("cid"))
    e.crossJoin(broadcast(cursor))
      .filter($"ms" < $"cms" || ($"ms" === $"cms" && $"event_id" < $"cid"))
      .select($"event_id", $"user_id", $"event_type", $"ms")
      .orderBy($"ms".desc, $"event_id".desc)
      .limit(50)
  }

  // Trailing 7-day exact p95 of event value per day — the dashboard
  // latency line, rank-exact (no interpolation). ×7 bounded
  // replication against a broadcast day spine; sketch path = q88.
  def q162RollingP95(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.events(s, dir)
      .select(expr("unix_millis(ts) div 86400000L").as("day"),
        floor($"value" * 100).cast("long").as("cents"), $"event_id")
    graft.operators.RollingPercentile.trailingExact(e, "day", "cents",
        "event_id", window = 7, pNum = 95)
      .orderBy($"day")
  }

  // Signup→purchase conversion-lag histogram: per user the first
  // signup and first subsequent purchase — two user-keyed min-aggs
  // that co-partition, then a tiny day-bucket rollup.
  def q163TimeToConvert(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .select($"user_id", $"event_type", unix_millis($"ts").as("ms"))
    val su = ev.filter($"event_type" === "signup")
      .groupBy($"user_id").agg(min($"ms").as("sms"))
    val conv = ev.filter($"event_type" === "purchase")
      .join(su, "user_id").filter($"ms" >= $"sms")
      .groupBy($"user_id").agg(min($"ms").as("pms"), min($"sms").as("s0"))
    conv.select(expr("(pms - s0) div 86400000L").as("days_to_convert"))
      .groupBy($"days_to_convert").agg(count(lit(1)).as("n_users"))
      .orderBy($"days_to_convert")
  }

  // Cross-source corpus overlap: pairwise shingle-set jaccard between
  // sources — contamination/redundancy structure. Hashed grams (the
  // q157 contract); the only quadratic object is the per-gram source
  // set, bounded by |sources|².
  def q164SourceOverlap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = Tables.documents(s, dir)
      .select($"source",
        graft.plans.GraftFunctions.wordShingleHashes($"text", 3).as("sh"))
    graft.operators.SetOverlap.pairwise(d, "source", $"sh")
      .orderBy($"source_a", $"source_b")
  }

  // Free audit metrics via the Observation API: the ingest write runs
  // ONCE, and row counts / null rates / value totals / day bounds ride
  // the same pass as named observe() metrics (Spark's
  // CollectMetricsExec) — zero additional scans, the mechanism a
  // write-audit-publish gate should use instead of re-reading its own
  // sink (contrast q92, which audits by querying the published table).
  // The metric values ARE the query result; the oracle recomputes them
  // from the source, so a metric dropped or double-counted by the
  // piggyback path breaks the hash match.
  def q230ObservedIngest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val obs = org.apache.spark.sql.Observation("q230_metrics")
    val tmp = tempDir("graft-q230")
    Tables.events(s, dir)
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum(when($"user_id".isNull, 1L).otherwise(0L)).as("null_users"),
        coalesce(sum(floor($"value" * 100).cast("long")), lit(0L)).as("sum_cents"),
        min(expr("unix_millis(ts) div 86400000")).as("min_day"),
        max(expr("unix_millis(ts) div 86400000")).as("max_day"))
      .write.mode("overwrite").parquet(s"$tmp/tables/events_copy")
    val m = obs.get
    Seq((m("n_rows").asInstanceOf[Long], m("null_users").asInstanceOf[Long],
      m("sum_cents").asInstanceOf[Long], m("min_day").asInstanceOf[Long],
      m("max_day").asInstanceOf[Long]))
      .toDF("n_rows", "null_users", "sum_cents", "min_day", "max_day")
  }

  // Stream-STATIC broadcast enrichment (the third join mode next to
  // q68's stream-stream and the batch q11): the events stream joins
  // the static customer dimension per micro-batch with a broadcast
  // hash join — no stream state, no watermark, the dimension is simply
  // re-read/broadcast each trigger, which is exactly the 100 TB shape
  // for fact-stream × small-dim enrichment. Sink totals per segment
  // must equal the batch join (oracle).
  def q235StreamEnrich(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val schema = Tables.eventsFileSchema(s, dir)
    val tmp = tempDir("graft-q235")
    val spool = java.nio.file.Files.createDirectories(tmp.resolve("spool"))
    java.nio.file.Files.createSymbolicLink(
      spool.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val s2 = s.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    val raw = s2.readStream.schema(schema)
      .option("maxFilesPerTrigger", 100000).parquet(spool.toString)
    val dim = Tables.customer(s2, dir)
      .select($"c_custkey", $"c_mktsegment")
    Tables.normalizeEventTs(raw)
      .join(broadcast(dim), $"user_id" === $"c_custkey")
      .writeStream.format("parquet")
      .option("path", s"$tmp/tables/enriched")
      .option("checkpointLocation", s"$tmp/ckpt/enriched")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination()
    s.read.parquet(s"$tmp/tables/enriched")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_events"),
        countDistinct($"user_id").as("n_users"),
        coalesce(sum(floor($"value" * 100).cast("long")), lit(0L)).as("cents"))
      .orderBy($"c_mktsegment")
  }

  // TPC-H Q3 analog (shipping priority): top-10 unshipped-revenue
  // orders for one segment at a cutoff date. Fact-side joins shuffle
  // on their keys, the date filters push to both scans, revenue is
  // per-row cents (exact long sums — never a float total), and the
  // top-10 is a TakeOrdered, not a global sort.
  def q243ShippingPriority(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cutoff = java.sql.Date.valueOf("1997-07-01")
    Tables.customer(s, dir).filter($"c_mktsegment" === "BUILDING")
      .select($"c_custkey")
      .join(Tables.orders(s, dir)
        .filter($"o_orderdate".cast("date") < cutoff), $"c_custkey" === $"o_custkey")
      .join(Tables.lineitem(s, dir)
        .filter($"l_shipdate".cast("date") > cutoff), $"o_orderkey" === $"l_orderkey")
      .groupBy($"o_orderkey",
        date_format($"o_orderdate", "yyyy-MM-dd").as("o_date"),
        $"o_orderpriority")
      .agg(sum(floor($"l_extendedprice" * (lit(1.0) - $"l_discount") * 100.0)
        .cast("long")).as("revenue_cents"))
      .orderBy($"revenue_cents".desc, $"o_orderkey")
      .limit(10)
  }

  // TPC-H Q5 analog (local supplier volume): revenue per nation for
  // one region-year where the supplier is LOCAL to the customer
  // (c_nationkey = s_nationkey rides the join condition). nation and
  // region broadcast; customer/orders/lineitem/supplier shuffle on
  // uniform keys only.
  def q244LocalSupplierVolume(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir).filter(year($"o_orderdate") === 1997),
        $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(s, dir), $"o_custkey" === $"c_custkey")
      .join(Tables.supplier(s, dir),
        $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(Tables.nation(s, dir)), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(s, dir).filter($"r_name" === "ASIA")),
        $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name")
      .agg(sum(floor($"l_extendedprice" * (lit(1.0) - $"l_discount") * 100.0)
        .cast("long")).as("revenue_cents"))
      .orderBy($"revenue_cents".desc, $"n_name")
  }

  // TPC-H Q16 analog (parts/supplier relationship): distinct supplier
  // counts per surviving (brand, type, size) bucket, with brand/type/
  // size exclusions pushed to the part scan and low-balance suppliers
  // removed by a broadcast anti-join (the NOT IN). The part-supplier
  // relation is lineitem's distinct (partkey, suppkey) pairs.
  def q245PartsSupplier(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ps = Tables.lineitem(s, dir)
      .select($"l_partkey", $"l_suppkey").distinct()
    val badSupp = Tables.supplier(s, dir)
      .filter($"s_acctbal" < 1500.0).select($"s_suppkey")
    ps.join(broadcast(badSupp), $"l_suppkey" === $"s_suppkey", "left_anti")
      .join(Tables.part(s, dir)
        .filter($"p_brand" =!= "Brand#5" && $"p_type" =!= "PROMO" &&
          $"p_size" <= 10),
        $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand", $"p_type", $"p_size".cast("long").as("p_size"))
      .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
      .orderBy($"supplier_cnt".desc, $"p_brand", $"p_type", $"p_size")
      .limit(20)
  }

  // TPC-H Q17 analog (small-quantity revenue): lineitems under 20% of
  // their part's average quantity. The correlated subquery decorrelates
  // into one per-part aggregate re-joined to the fact; the fractional
  // average compare is CROSS-MULTIPLIED (qty·5·n < Σqty) so the gate
  // is exact integer arithmetic on both engines.
  def q246SmallQuantityRevenue(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir)
      .select($"l_partkey", $"l_quantity".cast("long").as("qty"),
        $"l_extendedprice")
    val th = li.groupBy($"l_partkey")
      .agg(count(lit(1)).as("n"), sum($"qty").as("sq"))
    li.join(th, Seq("l_partkey"))
      .filter($"qty" * 5L * $"n" < $"sq")
      .agg(count(lit(1)).as("n_small"),
        coalesce(sum(floor($"l_extendedprice" * 100.0).cast("long")), lit(0L))
          .as("revenue_cents"))
  }

  // TPC-H Q18 analog (large-volume customers): orders whose line
  // quantity total reaches 150, top-10 by (quantity, orderkey). The
  // HAVING collapses in the per-order aggregate BEFORE the customer
  // join, so only qualifying orders ever join the dimension.
  def q247LargeVolumeCustomers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val big = Tables.lineitem(s, dir)
      .groupBy($"l_orderkey")
      .agg(sum($"l_quantity".cast("long")).as("total_qty"))
      .filter($"total_qty" >= 150L)
    big.join(Tables.orders(s, dir), $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(s, dir), $"o_custkey" === $"c_custkey")
      .select($"c_name", $"o_orderkey",
        date_format($"o_orderdate", "yyyy-MM-dd").as("o_date"),
        floor($"o_totalprice" * 100.0).cast("long").as("total_cents"),
        $"total_qty")
      .orderBy($"total_qty".desc, $"o_orderkey")
      .limit(10)
  }

  // Set-operation audit (INTERSECT / EXCEPT physical operators):
  // customers active in 1996 vs 1997 — retained, churned, and new,
  // through Spark's intersect/except (which plan as aggregates, not
  // joins the optimizer can't reorder). One stacked 3-row output.
  def q248SetOps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def active(yr: Int) = Tables.orders(s, dir)
      .filter(year($"o_orderdate") === yr).select($"o_custkey").distinct()
    val (a, b) = (active(1996), active(1997))
    val rows = Seq(
      ("retained_96_97", a.intersect(b).count()),
      ("churned_after_96", a.except(b).count()),
      ("new_in_97", b.except(a).count()))
    rows.toDF("cohort", "n_customers").orderBy($"cohort")
  }

  // TPC-H Q22 analog (global sales opportunity): customers whose
  // balance beats the positive-balance average but who have gone
  // DORMANT (no order since 1999 — every synthetic customer has SOME
  // order, so the classic never-ordered form is empty by construction).
  // The average gate is cross-multiplied at cents scale (bal·n > Σbal)
  // against a 1-row broadcast; the dormancy check is an anti-join
  // whose date filter pushes to the orders scan.
  def q249SalesOpportunity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cust = Tables.customer(s, dir)
      .select($"c_custkey", $"c_nationkey",
        floor($"c_acctbal" * 100.0).cast("long").as("bal_cents"))
    val avgPos = cust.filter($"bal_cents" > 0L)
      .agg(count(lit(1)).as("n"), sum($"bal_cents").as("sb"))
    cust.crossJoin(broadcast(avgPos))
      .filter($"bal_cents" * $"n" > $"sb")
      .join(Tables.orders(s, dir).filter(year($"o_orderdate") >= 1999)
        .select($"o_custkey").distinct(),
        $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_nationkey".cast("long").as("c_nationkey"))
      .agg(count(lit(1)).as("n_custs"), sum($"bal_cents").as("total_cents"))
      .orderBy($"c_nationkey")
  }

  // ORC format roundtrip (the third on-disk format next to parquet and
  // q215's CSV): the integerized lineitem slice written as ORC, read
  // back, and aggregated — the readback aggregate must equal the
  // parquet-source recompute (sink ≡ source, q78's discipline). ORC
  // is columnar+typed so values roundtrip exactly; the oracle never
  // touches the ORC file (DuckDB reads only the original parquet).
  def q250OrcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tmp = tempDir("graft-q250")
    Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_partkey",
        $"l_quantity".cast("long").as("qty"),
        floor($"l_extendedprice" * 100.0).cast("long").as("cents"),
        $"l_returnflag")
      .write.mode("overwrite").orc(s"$tmp/tables/li_orc")
    s.read.orc(s"$tmp/tables/li_orc")
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum($"qty").as("sum_qty"),
        sum($"cents").as("sum_cents"),
        countDistinct($"l_partkey").as("n_parts"))
      .orderBy($"l_returnflag")
  }

  // The plain-SQL interface: temp views + spark.sql(...) running a
  // multi-CTE windowed statement — proof that a SQL-only user drives
  // this engine without touching the DataFrame API (Catalyst plans it
  // identically). Monthly revenue share of the running year total, all
  // integer cents.
  def q256SqlInterface(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir).createOrReplaceTempView("li_v")
    s.sql(
      """WITH m AS (
        |  SELECT date_format(date_trunc('month', l_shipdate), 'yyyy-MM') AS month,
        |         CAST(date_format(l_shipdate, 'yyyy') AS BIGINT) AS yr,
        |         sum(CAST(floor(l_extendedprice * 100.0) AS BIGINT)) AS cents
        |  FROM li_v GROUP BY 1, 2),
        |w AS (
        |  SELECT month, yr, cents,
        |         sum(cents) OVER (PARTITION BY yr ORDER BY month
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ytd_cents
        |  FROM m)
        |SELECT month, cents, ytd_cents,
        |       cents * 1000000 div ytd_cents AS share_of_ytd_ppm
        |FROM w ORDER BY month""".stripMargin)
  }

  // The TYPED Dataset path: case-class Encoders, groupByKey/mapGroups —
  // where compile-time row types matter more than codegen (the brief's
  // Dataset[T] surface). Verified against the same untyped aggregate
  // the oracle computes, so the typed path must agree exactly.
  def q257TypedPipeline(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // keys are (type, day) — 30× the type cardinality, so group state
    // stays bounded and the shuffle keys aren't a 5-value column
    val ds = Tables.events(s, dir)
      .select($"event_type", expr("unix_millis(ts) div 86400000").as("day"),
        coalesce($"user_id", lit(-1L)).as("user_id"),
        coalesce(floor($"value" * 100).cast("long"), lit(0L)).as("cents"))
      .as[(String, Long, Long, Long)]
    ds.groupByKey(r => (r._1, r._2))
      .mapGroups { (key: (String, Long), rows: Iterator[(String, Long, Long, Long)]) =>
        val (typ, day) = key
        var n = 0L; var total = 0L; var maxC = Long.MinValue
        val users = scala.collection.mutable.Set[Long]()
        rows.foreach { case (_, _, u, c) =>
          n += 1; total += c; if (c > maxC) maxC = c
          if (u >= 0) users += u
        }
        (typ, day, n, total, maxC, users.size.toLong)
      }
      .toDF("event_type", "day", "n", "total_cents", "max_cents", "n_users")
      .orderBy($"event_type", $"day")
  }

  // Federated multi-format read: the same fact slice served from
  // parquet, CSV and ORC at once, unioned by name and aggregated — the
  // lakehouse reality where one logical table spans formats. Counts
  // and sums must triple; the per-type distinct id set must NOT
  // (identity survives every format roundtrip).
  def q258FederatedFormats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tmp = tempDir("graft-q258")
    val base = Tables.events(s, dir)
      .select($"event_id", $"event_type",
        coalesce(floor($"value" * 100).cast("long"), lit(0L)).as("cents"))
    base.write.mode("overwrite").option("header", "true")
      .csv(s"$tmp/tables/ev_csv")
    base.write.mode("overwrite").orc(s"$tmp/tables/ev_orc")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "event_id BIGINT, event_type STRING, cents BIGINT")
    val csv = s.read.option("header", "true").schema(schema)
      .csv(s"$tmp/tables/ev_csv")
    val orc = s.read.orc(s"$tmp/tables/ev_orc")
    base.unionByName(csv).unionByName(orc)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_rows"),
        sum($"cents").as("sum_cents"),
        countDistinct($"event_id").as("n_ids"))
      .orderBy($"event_type")
  }

  // Daily latency-percentile bands (p50/p95/p99 of the value metric
  // per day) — THE operational time-series chart. q172's two-phase
  // value-domain shape keyed by day: one (day × distinct-cents) count
  // shuffle, cumulative ranks on the compressed frame only.
  def q259DailyPercentiles(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val c = Tables.events(s, dir)
      .filter($"value".isNotNull)
      .select(expr("unix_millis(ts) div 86400000").as("day"),
        floor($"value" * 100).cast("long").as("cents"))
      .groupBy($"day", $"cents")
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy($"day").orderBy($"cents")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wT = Window.partitionBy($"day")
    def pick(p: Int) = {
      val rp = expr(s"($p * (n - 1)) div 100 + 1")
      max(when($"lo" < rp && rp <= $"hi", $"cents")).as(s"p$p")
    }
    c.withColumn("hi", sum($"cnt").over(w))
      .withColumn("n", sum($"cnt").over(wT))
      .withColumn("lo", $"hi" - $"cnt")
      .groupBy($"day", $"n")
      .agg(pick(50), pick(95), pick(99))
      .orderBy($"day")
  }

  // Apdex score per day: satisfied (value ≤ 250) + tolerating/2
  // (≤ 1000) over total, in exact ppm — the one-number SLA digest.
  // One conditional-agg scan; the half weight is cross-multiplied
  // (2·sat + tol over 2·n) so no fraction ever materializes.
  def q260Apdex(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .filter($"value".isNotNull)
      .groupBy(expr("unix_millis(ts) div 86400000").as("day"))
      .agg(count(lit(1)).as("n"),
        sum(when($"value" <= 250.0, 1L).otherwise(0L)).as("satisfied"),
        sum(when($"value" > 250.0 && $"value" <= 1000.0, 1L).otherwise(0L))
          .as("tolerating"))
      .withColumn("apdex_ppm",
        expr("(2 * satisfied + tolerating) * 1000000 div (2 * n)"))
      .orderBy($"day")
  }

  // Ledger reconciliation: order header totals vs the sum of their
  // lines — the cross-table consistency audit every financial pipeline
  // runs. Discrepancies bucketed by magnitude with net and absolute
  // exposure per bucket; headers with no lines are their own bucket
  // (left join, never dropped). One join on the order key + one agg.
  def q261Reconciliation(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val lines = Tables.lineitem(s, dir)
      .groupBy($"l_orderkey")
      .agg(sum(floor($"l_extendedprice" * 100.0).cast("long")).as("lc"))
    Tables.orders(s, dir)
      .select($"o_orderkey", floor($"o_totalprice" * 100.0).cast("long").as("oc"))
      .join(lines, $"o_orderkey" === $"l_orderkey", "left")
      .withColumn("d", $"oc" - $"lc")
      .withColumn("bucket", expr(
        """CASE WHEN lc IS NULL THEN 'a_no_lines'
          |     WHEN abs(d) < 1000000 THEN 'b_under_10k'
          |     WHEN abs(d) < 10000000 THEN 'c_under_100k'
          |     ELSE 'd_over_100k' END""".stripMargin))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_orders"),
        coalesce(sum($"d"), lit(0L)).as("net_cents"),
        coalesce(sum(abs($"d")), lit(0L)).as("abs_cents"))
      .orderBy($"bucket")
  }

  // Top-k WITH ties (the rank()-cutoff semantics dashboards need when
  // "3rd place" is shared): top-3 revenue days at hundred-dollar
  // granularity, ties included — rank(), not row_number(), so the
  // result can exceed 3 rows. The window runs on the bounded daily
  // bucket frame.
  def q262TopWithTies(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    Tables.events(s, dir)
      .filter($"event_type" === "purchase" && $"value".isNotNull)
      .groupBy(expr("unix_millis(ts) div 86400000").as("day"))
      .agg(expr("sum(CAST(floor(value * 100) AS BIGINT)) div 100000")
        .as("rev_hundreds"))
      .withColumn("rk", rank().over(Window.orderBy($"rev_hundreds".desc))
        .cast("long"))
      .filter($"rk" <= 3L)
      .orderBy($"rk", $"day")
  }

  // Join-skew salt planner: turn the q159 fanout diagnostic into an
  // executable mitigation — per hot key, the salt factor that caps its
  // build-side partition at ~50k rows (ceil division, clamped to 32 =
  // the executor-thread budget), and the post-salt residual fanout.
  // Keys needing no salt report 1 — the whole top-10 plan a skew-aware
  // join wrapper (q84's SaltedAgg) would consume.
  def q263SaltPlanner(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.events(s, dir)
    graft.operators.KeyHealth.joinFanout(e, "user_id", e, "user_id", 10)
      .withColumn("salt", expr(
        "greatest(CAST(1 AS BIGINT), least(CAST(32 AS BIGINT), " +
          "(n_right + 49999) div 50000))"))
      .withColumn("rows_per_task", expr("n_right div salt"))
      .select($"key", $"n_left", $"n_right", $"fanout", $"salt",
        $"rows_per_task")
      .orderBy($"fanout".desc, $"key")
  }

  // Filtered vector search — the metadata-predicate ANN problem: exact
  // top-10 among vectors of a DIFFERENT label than the query (the
  // correct pre-filter semantics) side by side with the naive
  // post-filter of an unfiltered top-50, tagged so the result exposes
  // any recall the post-filter loses. Both paths broadcast + TakeOrdered
  // (zero shuffle); the query label is one bounded driver literal.
  def q264FilteredAnn(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    val qv = emb.filter($"vec_id" === 2).select($"embedding".as("qvec"))
    val qlabel = emb.filter($"vec_id" === 2)
      .select($"label").as[Int].head() // 1-row driver literal
    val exact = Similarity.bruteForceTopK(
        emb.filter($"label" =!= qlabel), "vec_id", "embedding", qv, 10)
      .withColumn("method", lit("a_prefilter_exact"))
    val post = Similarity.bruteForceTopK(emb, "vec_id", "embedding", qv, 50)
    val postFiltered = emb.select($"vec_id", $"label")
      .join(broadcast(post), Seq("vec_id"))
      .filter($"label" =!= qlabel)
      .orderBy($"cos".desc, $"vec_id").limit(10)
      .select($"vec_id", $"cos")
      .withColumn("method", lit("b_postfilter_50"))
    exact.unionByName(postFiltered)
      .select($"method", $"vec_id", $"cos")
      .orderBy($"method", $"cos".desc, $"vec_id")
  }

  /** q265's oracle: the identical integer-µ greedy unrolled as 5 CTE
    * rounds (selected set grows by UNION each round).
    */
  private lazy val q265Sql: String = {
    val head =
      """WITH e AS (SELECT vec_id,
        |        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |       FROM embeddings),
        |q AS (SELECT v AS qv FROM e WHERE vec_id = 5),
        |sc0 AS (SELECT vec_id, v,
        |        round(list_dot_product(v, qv) /
        |          (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))),
        |          6) AS cosr
        |       FROM e, q WHERE vec_id <> 5),
        |c AS MATERIALIZED (SELECT vec_id, v,
        |       CAST(round(cosr * 1000000, 0) AS BIGINT) AS rel
        |      FROM sc0 ORDER BY cosr DESC, vec_id LIMIT 20),
        |sims AS MATERIALIZED (SELECT a.vec_id AS u, b.vec_id AS vv,
        |       CAST(round(list_dot_product(a.v, b.v) /
        |         (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
        |         * 1000000, 0) AS BIGINT) AS sim
        |      FROM c a JOIN c b ON a.vec_id <> b.vec_id),
        |p1 AS MATERIALIZED (SELECT vec_id, rel, rel * 7 AS score
        |      FROM c ORDER BY score DESC, vec_id LIMIT 1)""".stripMargin
    val rounds = (2 to 5).map { r =>
      val sel = (1 until r).map(i => s"SELECT vec_id FROM p$i")
        .mkString(" UNION ")
      s""",
         |p$r AS MATERIALIZED (SELECT c.vec_id, c.rel,
         |      c.rel * 7 - m.mx * 3 AS score
         |     FROM c JOIN (SELECT u, max(sim) AS mx FROM sims
         |       WHERE vv IN ($sel) GROUP BY 1) m ON m.u = c.vec_id
         |     WHERE c.vec_id NOT IN ($sel)
         |     ORDER BY score DESC, c.vec_id LIMIT 1)""".stripMargin
    }.mkString
    val out = (1 to 5).map(r =>
      s"SELECT CAST($r AS BIGINT) AS rank, vec_id, rel AS rel_mu, " +
        s"CAST(score AS BIGINT) AS score_mu FROM p$r")
      .mkString("\nUNION ALL ")
    s"$head$rounds\nSELECT * FROM (\n$out\n) u ORDER BY rank"
  }

  // Maximal-marginal-relevance re-ranking: the top-20 cosine
  // candidates re-ordered for DIVERSITY — each round picks
  // argmax(7·rel − 3·max_sim_to_selected) in exact micro-units
  // (λ=0.7 ×10, similarities quantized at 1e-6 on both engines, so
  // the greedy trajectory is bit-deterministic). The data-scale work
  // is the one top-20 scan; pairwise sims and all 5 greedy rounds run
  // on the bounded 20-row candidate frame (1-row argmax collects, the
  // Coverage precedent).
  def q265MmrRerank(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    val qv = emb.filter($"vec_id" === 5).select($"embedding".as("qvec"))
    val cand = emb.select($"vec_id", $"embedding")
      .join(broadcast(Similarity.bruteForceTopK(
          emb.filter($"vec_id" =!= 5), "vec_id", "embedding", qv, 20)),
        Seq("vec_id"))
      .withColumn("rel", expr("CAST(round(cos * 1000000, 0) AS BIGINT)"))
      .persist() // 20 rows: pairwise sims + every greedy round
    val sims = cand.as("a").crossJoin(broadcast(cand.as("b")))
      .filter($"a.vec_id" =!= $"b.vec_id")
      .select($"a.vec_id".as("u"), $"b.vec_id".as("v"),
        round(Similarity.cosine(
          Similarity.toDoubleVec($"a.embedding"),
          Similarity.toDoubleVec($"b.embedding")) * 1000000.0, 0)
          .cast("long").as("sim"))
      .persist()
    var picks = List.empty[(Long, Long, Long, Long)] // rank, id, rel, score
    for (r <- 1 to 5) {
      val sel = picks.map(_._2)
      val pool = cand.select($"vec_id", $"rel")
        .filter(!$"vec_id".isin(sel: _*))
      val scored =
        if (sel.isEmpty) pool.withColumn("score", $"rel" * 7L)
        else pool.join(
            sims.filter($"v".isin(sel: _*))
              .groupBy($"u").agg(max($"sim").as("mx")),
            $"vec_id" === $"u")
          .select($"vec_id", $"rel", ($"rel" * 7L - $"mx" * 3L).as("score"))
      val row = scored.orderBy($"score".desc, $"vec_id")
        .limit(1).select($"vec_id", $"rel", $"score")
        .as[(Long, Long, Long)].head()
      picks = picks :+ ((r.toLong, row._1, row._2, row._3))
    }
    cand.unpersist(); sims.unpersist()
    picks.toDF("rank", "vec_id", "rel_mu", "score_mu").orderBy($"rank")
  }

  // Day × value-decile heatmap (the dashboard density matrix): global
  // type-1 decile boundaries computed once on the compressed
  // (distinct-cents × count) frame, broadcast back as ten literals in
  // a single CASE ladder, then one (day, decile) hash agg. Value-based
  // bucketing — equal values land in one decile on both engines.
  def q266DecileHeatmap(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val ev = Tables.events(s, dir).filter($"value".isNotNull)
      .select(expr("unix_millis(ts) div 86400000").as("day"),
        floor($"value" * 100).cast("long").as("cents"))
    val vc = ev.groupBy($"cents").agg(count(lit(1)).as("cnt"))
      .persist() // the total and the cumulative bounds both read it
    val wc = Window.orderBy($"cents")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = vc.agg(sum($"cnt").as("n"))
    val bAggs = (1 to 10).map(d =>
      min(when($"cum" >= expr(s"($d * n + 9) div 10"), $"cents")).as(s"b$d"))
    val bounds = vc.withColumn("cum", sum($"cnt").over(wc))
      .crossJoin(broadcast(tot))
      .agg(bAggs.head, bAggs.tail: _*)
    val caseLadder = (1 to 9).map(d =>
      s"WHEN cents <= b$d THEN CAST($d AS BIGINT)").mkString(" ")
    ev.crossJoin(broadcast(bounds))
      .withColumn("decile",
        expr(s"CASE $caseLadder ELSE CAST(10 AS BIGINT) END"))
      .groupBy($"day", $"decile")
      .agg(count(lit(1)).as("n"))
      .orderBy($"day", $"decile")
  }

  // Arrival-disorder audit: how often event time runs BACKWARD along
  // the arrival sequence (adjacent-pair inversions per type) — the
  // out-of-orderness measure that sizes streaming watermarks. Adjacent
  // pairs come from ONE distributed GlobalRank over (type, id) and a
  // rank↔rank+1 equi-join (q136's shape) — never a type-partitioned
  // window over raw rows; cross-type boundary pairs drop in the
  // same-type filter.
  def q267DisorderRate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .select($"event_type", $"event_id", unix_millis($"ts").as("ms"))
    val ranked = graft.operators.GlobalRank.rowNumber(
      ev, Seq("event_type", "event_id"), "gr")
    val cur = ranked.select($"event_type".as("t1"), $"gr", $"ms".as("ms1"))
    val nxt = ranked.select($"event_type".as("t2"), ($"gr" - 1L).as("gr"),
      $"ms".as("ms2"))
    cur.join(nxt, Seq("gr"))
      .filter($"t1" === $"t2")
      .groupBy($"t1")
      .agg(count(lit(1)).as("n_pairs"),
        sum(when($"ms2" < $"ms1", 1L).otherwise(0L)).as("n_inversions"))
      .withColumn("inversion_ppm",
        expr("n_inversions * 1000000 div n_pairs"))
      .withColumnRenamed("t1", "event_type")
      .orderBy($"event_type")
  }

  // Right-to-erasure rewrite: the subject set (every 97th user) is
  // anti-joined out, the surviving table is REWRITTEN to a real sink
  // and read back, and the result audits the rewritten copy — per-type
  // survivor counts plus the erased-rows-remaining counter the
  // compliance gate requires to be zero. Sink ≡ filtered source
  // (q78's discipline); the erase predicate pushes to the scan.
  def q268ErasureRewrite(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tmp = tempDir("graft-q268")
    Tables.events(s, dir)
      .filter($"user_id".isNull || $"user_id" % 97 =!= 0)
      .write.mode("overwrite").parquet(s"$tmp/tables/events_clean")
    val back = s.read.parquet(s"$tmp/tables/events_clean")
    back.groupBy($"event_type")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct($"user_id").as("n_users"),
        sum(when($"user_id".isNotNull && $"user_id" % 97 === 0, 1L)
          .otherwise(0L)).as("erased_remaining"))
      .orderBy($"event_type")
  }

  // ---------------------------------------------------------------- q281

  // Ingestion-pipeline YAML as CONFIG: parse a Data Prepper pipeline
  // document (the reference's metrics-pipeline.yaml shape — named
  // JSON-pointer route conditions + routed/unrouted opensearch sinks)
  // with ingest.PipelineConfig and execute the declared routing over
  // the events table. Each sink is ONE predicate-pushed filter of the
  // shared frame (OR across its routes; an unrouted sink receives
  // everything; routes are non-exclusive — one record can land in
  // several sinks, Data Prepper semantics; != is null-safe like Data
  // Prepper's missing-key match). The oracle replays each sink's WHERE
  // clause; the config-driven "purchase-or-click" routing ≡ what the
  // hard-coded Transforms.route plane does with the same discriminator.
  def q281PipelineYaml(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val cfg = graft.ingest.PipelineConfig.parse(
      """version: "2"
        |pipeline:
        |  source:
        |    http:
        |      path: "/ingest"
        |  route:
        |    - purchases: '/event_type == "purchase"'
        |    - clicks: '/event_type == "click"'
        |    - non-purchase: '/event_type != "purchase"'
        |  sink:
        |    - opensearch:
        |        index: "purchase-or-click"
        |        routes:
        |          - purchases
        |          - clicks
        |    - opensearch:
        |        index: "non-purchase"
        |        routes:
        |          - non-purchase
        |    - opensearch:
        |        index: "all-events"
        |""".stripMargin)
    cfg.routedFrames(ev).map { case (idx, df) =>
      df.agg(count(lit(1)).as("n"),
          coalesce(sum(expr("CAST(floor(value * 100) AS BIGINT)")), lit(0L))
            .as("total_cents"))
        .select(lit(idx).as("sink_index"), $"n", $"total_cents")
    }.reduce(_.unionAll(_)).orderBy($"sink_index")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q281_pipeline_yaml" -> q281PipelineYaml _,
    "q268_erasure_rewrite" -> q268ErasureRewrite _,
    "q267_disorder_rate" -> q267DisorderRate _,
    "q266_decile_heatmap" -> q266DecileHeatmap _,
    "q265_mmr_rerank" -> q265MmrRerank _,
    "q264_filtered_ann" -> q264FilteredAnn _,
    "q263_salt_planner" -> q263SaltPlanner _,
    "q261_reconciliation" -> q261Reconciliation _,
    "q262_top_with_ties" -> q262TopWithTies _,
    "q230_observed_ingest" -> q230ObservedIngest _,
    "q235_stream_enrich" -> q235StreamEnrich _,
    "q249_sales_opportunity" -> q249SalesOpportunity _,
    "q250_orc_roundtrip" -> q250OrcRoundtrip _,
    "q256_sql_interface" -> q256SqlInterface _,
    "q257_typed_pipeline" -> q257TypedPipeline _,
    "q258_federated_formats" -> q258FederatedFormats _,
    "q259_daily_percentiles" -> q259DailyPercentiles _,
    "q260_apdex" -> q260Apdex _,
    "q246_small_quantity_revenue" -> q246SmallQuantityRevenue _,
    "q247_large_volume_customers" -> q247LargeVolumeCustomers _,
    "q248_set_ops" -> q248SetOps _,
    "q243_shipping_priority" -> q243ShippingPriority _,
    "q244_local_supplier_volume" -> q244LocalSupplierVolume _,
    "q245_parts_supplier" -> q245PartsSupplier _,
    "q15_nested_topk" -> q15NestedTopK _,
    "q25_stream_ingest" -> q25StreamIngest _,
    "q28_json_serialize" -> q28JsonSerialize _,
    "q29_knn_join" -> q29KnnJoin _,
    "q30_frame_sample" -> q30FrameSample _,
    "q31_calendar_histogram" -> q31CalendarHistogram _,
    "q32_rollup" -> q32Rollup _,
    "q33_rolling_fingerprint" -> q33RollingFingerprint _,
    "q16_auto_histogram" -> q16AutoHistogram _,
    "q17_exact_dedup" -> q17ExactDedup _,
    "q18_neardup_pairs" -> q18NeardupPairs _,
    "q19_simhash_pairs" -> q19SimhashPairs _,
    "q20_text_stats" -> q20TextStats _,
    "q21_lang_quality" -> q21LangQuality _,
    "q22_cosine_topk" -> q22CosineTopK _,
    "q23_ann_topk" -> q23AnnTopK _,
    "q24_multimodal_meta" -> q24MultimodalMeta _,
    "q34_ann_lsh_index" -> q34AnnLshIndex _,
    "q35_ann_ivf_index" -> q35AnnIvfIndex _,
    "q36_minhash_dedup" -> q36MinhashDedup _,
    "q37_cosine_neardup" -> q37CosineNearDup _,
    "q38_deep_log_ingest" -> q38DeepLogIngest _,
    "q39_stateful_stage_agg" -> q39StatefulStageAgg _,
    "q45_tws_stage_agg" -> q45TwsStageAgg _,
    "q46_hash_split" -> q46HashSplit _,
    "q47_token_shards" -> q47TokenShards _,
    "q48_stratified_sample" -> q48StratifiedSample _,
    "q49_sessionize" -> q49Sessionize _,
    "q50_asof_enrich" -> q50AsofEnrich _,
    "q51_cube" -> q51Cube _,
    "q52_quantize_int8" -> q52QuantizeInt8 _,
    "q53_percentile_ranks" -> q53PercentileRanks _,
    "q54_stream_sessions" -> q54StreamSessions _,
    "q55_dedup_delivery" -> q55DedupDelivery _,
    "q56_range_join" -> q56RangeJoin _,
    "q57_weighted_sample" -> q57WeightedSample _,
    "q58_decontaminate" -> q58Decontaminate _,
    "q59_stream_lsh_index" -> q59StreamLshIndex _,
    "q60_funnel" -> q60Funnel _,
    "q61_dedup_clusters" -> q61DedupClusters _,
    "q62_repetition_filter" -> q62RepetitionFilter _,
    "q63_pii_redact" -> q63PiiRedact _,
    "q64_tfidf_search" -> q64TfidfSearch _,
    "q65_inverted_search" -> q65InvertedSearch _,
    "q66_retention_cohorts" -> q66RetentionCohorts _,
    "q67_anomaly_zscore" -> q67AnomalyZscore _,
    "q68_stream_attribution" -> q68StreamAttribution _,
    "q69_embedding_cohesion" -> q69EmbeddingCohesion _,
    "q71_bloom_semijoin" -> q71BloomSemiJoin _,
    "q72_scd2" -> q72Scd2 _,
    "q73_pagerank" -> q73PageRank _,
    "q74_transitions" -> q74Transitions _,
    "q75_setsim_join" -> q75SetSimJoin _,
    "q76_profile" -> q76Profile _,
    "q77_equidepth" -> q77EquiDepth _,
    "q78_compact" -> q78Compact _,
    "q79_zorder" -> q79Zorder _,
    "q80_pivot" -> q80Pivot _,
    "q81_correlate" -> q81Correlate _,
    "q82_snapshot_diff" -> q82SnapshotDiff _,
    "q83_golden_record" -> q83GoldenRecord _,
    "q84_salted_join" -> q84SaltedJoin _,
    "q85_sliding_window" -> q85SlidingWindow _,
    "q86_trigrams" -> q86Trigrams _,
    "q87_class_cap" -> q87ClassCap _,
    "q88_range_quantiles" -> q88RangeQuantiles _,
    "q89_interval_merge" -> q89IntervalMerge _,
    "q90_chunk_roundtrip" -> q90ChunkRoundtrip _,
    "q91_stream_scd2" -> q91StreamScd2 _,
    "q92_wap" -> q92Wap _,
    "q93_schema_merge" -> q93SchemaMerge _,
    "q94_kmeans" -> q94Kmeans _,
    "q95_hybrid_search" -> q95HybridSearch _,
    "q96_bm25" -> q96Bm25 _,
    "q97_cluster_split" -> q97ClusterSplit _,
    "q98_merge_cdc" -> q98MergeCdc _,
    "q99_file_skip" -> q99FileSkip _,
    "q100_temperature_mix" -> q100TemperatureMix _,
    "q101_segment_dedup" -> q101SegmentDedup _,
    "q102_fuzzy_join" -> q102FuzzyJoin _,
    "q103_star_join" -> q103StarJoin _,
    "q104_winsorize" -> q104Winsorize _,
    "q105_expectations" -> q105Expectations _,
    "q106_robust_scale" -> q106RobustScale _,
    "q107_triangles" -> q107Triangles _,
    "q108_k_anonymity" -> q108KAnonymity _,
    "q109_grouping_sets" -> q109GroupingSets _,
    "q110_entity_resolution" -> q110EntityResolution _,
    "q111_incremental_view" -> q111IncrementalView _,
    "q112_sorted_neighborhood" -> q112SortedNeighborhood _,
    "q113_gap_fill" -> q113GapFill _,
    "q114_skyline" -> q114Skyline _,
    "q115_group_regression" -> q115GroupRegression _,
    "q116_frequency_drift" -> q116FrequencyDrift _,
    "q117_association_rules" -> q117AssociationRules _,
    "q118_record_linkage" -> q118RecordLinkage _,
    "q119_activity_islands" -> q119ActivityIslands _,
    "q120_rolling_metrics" -> q120RollingMetrics _,
    "q121_inter_arrival" -> q121InterArrival _,
    "q122_clustering_coefficient" -> q122ClusteringCoefficient _,
    "q123_rolling_active_users" -> q123RollingActiveUsers _,
    "q124_weighted_median" -> q124WeightedMedian _,
    "q125_change_point" -> q125ChangePoint _,
    "q126_contribution" -> q126Contribution _,
    "q127_overlap_shipments" -> q127OverlapShipments _,
    "q128_hierarchy_flatten" -> q128HierarchyFlatten _,
    "q129_melt_measures" -> q129MeltMeasures _,
    "q130_order_documents" -> q130OrderDocuments _,
    "q131_collocations" -> q131Collocations _,
    "q132_vocab_coverage" -> q132VocabCoverage _,
    "q133_quantile_norm" -> q133QuantileNorm _,
    "q134_ab_test" -> q134AbTest _,
    "q135_kcore" -> q135KCore _,
    "q136_sequence_gaps" -> q136SequenceGaps _,
    "q137_integrity_audit" -> q137IntegrityAudit _,
    "q138_decayed_trends" -> q138DecayedTrends _,
    "q139_lang_source_independence" -> q139LangSourceIndependence _,
    "q140_benford_audit" -> q140BenfordAudit _,
    "q141_containment_pairs" -> q141ContainmentPairs _,
    "q142_khop_reach" -> q142KhopReach _,
    "q143_peak_concurrency" -> q143PeakConcurrency _,
    "q144_top_paths" -> q144TopPaths _,
    "q145_floored_balance" -> q145FlooredBalance _,
    "q146_gini_concentration" -> q146GiniConcentration _,
    "q147_embedding_audit" -> q147EmbeddingAudit _,
    "q148_lang_confusion" -> q148LangConfusion _,
    "q149_autocorrelation" -> q149Autocorrelation _,
    "q150_cohort_value" -> q150CohortValue _,
    "q151_revenue_concentration" -> q151RevenueConcentration _,
    "q152_share_of_parent" -> q152ShareOfParent _,
    "q153_new_vs_returning" -> q153NewVsReturning _,
    "q154_recency_churn" -> q154RecencyChurn _,
    "q155_sla_attainment" -> q155SlaAttainment _,
    "q156_pareto_k" -> q156ParetoK _,
    "q157_ngram_novelty" -> q157NgramNovelty _,
    "q158_key_health" -> q158KeyHealth _,
    "q159_join_fanout" -> q159JoinFanout _,
    "q160_event_dedup_window" -> q160EventDedupWindow _,
    "q161_search_after" -> q161SearchAfter _,
    "q162_rolling_p95" -> q162RollingP95 _,
    "q163_time_to_convert" -> q163TimeToConvert _,
    "q164_source_overlap" -> q164SourceOverlap _,
    "q41_char_ngram_pairs" -> q41CharNgramPairs _,
    "q42_upsert_stage_agg" -> q42UpsertStageAgg _,
    "q43_windowed_stage_agg" -> q43WindowedStageAgg _,
    "q44_pipeline_aggs" -> q44PipelineAggs _
  )

  private val annBits = 12
  private val annMaxHamming = 3
  // indexed-ANN parameters: 6 signature bits bound the physical layout
  // at 64 partitions (bucket count should track data size — at test SF
  // more buckets just means more empty files); the hamming-1 probe ball
  // reads 7 of the 64
  private val idxBits = 6
  private val idxMaxHamming = 1
  private val ivfCells = 16
  private val ivfProbe = 3

  /** DuckDB word-3-shingle expression over `text` (mirrors
    * Dedup.shingles: slice-of-3 concat, distinct, clamped at the end).
    */
  /** Batch SCD2 gaps-and-islands — shared by q72 (batch build) and q91
    * (streaming maintenance: the maintained dim must equal this).
    */
  private val scd2OracleSql: String =
    """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) ms, event_type FROM events),
      |l AS (SELECT *, lag(event_type) OVER (PARTITION BY user_id ORDER BY ms, event_id) prev FROM e),
      |r AS (SELECT *, sum(CASE WHEN prev IS DISTINCT FROM event_type THEN 1 ELSE 0 END)
      |        OVER (PARTITION BY user_id ORDER BY ms, event_id ROWS UNBOUNDED PRECEDING) run FROM l),
      |g AS (SELECT user_id, run, min(event_type) AS value, min(ms) valid_from,
      |        count(*) n_events FROM r GROUP BY 1, 2),
      |v AS (SELECT user_id, value, valid_from,
      |        lead(valid_from) OVER (PARTITION BY user_id ORDER BY run) valid_to, n_events FROM g)
      |SELECT user_id, value, valid_from, valid_to,
      | CAST(n_events AS BIGINT) n_events,
      | CAST(valid_to IS NULL AS BIGINT) is_current
      |FROM v ORDER BY user_id, valid_from, value""".stripMargin

  /** Brute-force 0.8-jaccard pairs closed transitively (recursive CTE)
    * — shared by q61 (cluster labels) and q97 (cluster-keyed split).
    * Requires `shingleSql` and a WITH RECURSIVE context.
    */
  private val clusterCtes: String =
    """pairs AS (
      | SELECT a.doc_id id_a, b.doc_id id_b
      | FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      | WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      |   / (len(a.sh) + len(b.sh) - CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)) >= 0.8),
      |ed AS (SELECT id_a a, id_b b FROM pairs UNION SELECT id_b, id_a FROM pairs),
      |reach AS (
      | SELECT a AS node, a AS lbl FROM ed
      | UNION
      | SELECT e.b, r.lbl FROM ed e JOIN reach r ON e.a = r.node)""".stripMargin

  private[queries] val shingleSql: String =
    """toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') tk FROM documents),
      |sh AS (SELECT doc_id,
      |  list_distinct([array_to_string(list_slice(tk, i, i + 2), ' ')
      |                 FOR i IN range(1, greatest(len(tk) - 1, 2))]) sh
      | FROM toks)""".stripMargin

  /** DuckDB mirror of TextAnalysis.langScore for one profile. */
  private def langScoreSql(words: Seq[String]): String =
    words.map(w => s"len(regexp_extract_all(text, '\\b$w\\b'))").mkString(" + ")

  /** q148's oracle: the q21 langId replication feeding a confusion
    * matrix with integer ppm shares per true class.
    */
  private lazy val q148Sql: String = {
    val scores = TextAnalysis.langProfiles.map { case (lang, words) =>
      s"${langScoreSql(words)} AS s_$lang"
    }.mkString(",\n  ")
    val langs = TextAnalysis.langProfiles.map(_._1)
    val anyVote = langs.map(l => s"s_$l").mkString(" + ") + " > 0"
    val chain = langs.map { l =>
      val conds = langs.filter(_ != l).map(o => s"s_$l >= s_$o").mkString(" AND ")
      s"WHEN $conds THEN '$l'"
    }.mkString("\n      ")
    s"""WITH scored AS (SELECT lang, text, $scores FROM documents),
       |p AS (SELECT lang,
       |       CASE WHEN NOT ($anyVote) THEN 'und'
       |       $chain
       |       ELSE 'und' END AS lang_id FROM scored),
       |c AS (SELECT lang, lang_id, count(*) AS n FROM p GROUP BY 1, 2),
       |t AS (SELECT *, CAST(sum(n) OVER (PARTITION BY lang) AS BIGINT) AS row_total FROM c)
       |SELECT lang, lang_id, n, row_total,
       | CAST((n * 1000000) // row_total AS BIGINT) AS share_ppm
       |FROM t ORDER BY lang, lang_id""".stripMargin
  }

  private lazy val q21Sql: String = {
    val scores = TextAnalysis.langProfiles.map { case (lang, words) =>
      s"${langScoreSql(words)} AS s_$lang"
    }.mkString(",\n  ")
    val langs = TextAnalysis.langProfiles.map(_._1)
    val anyVote = langs.map(l => s"s_$l").mkString(" + ") + " > 0"
    val chain = langs.map { l =>
      val conds = langs.filter(_ != l).map(o => s"s_$l >= s_$o").mkString(" AND ")
      s"WHEN $conds THEN '$l'"
    }.mkString("\n      ")
    // qualityScore mirror: identical operation order (see TextAnalysis).
    s"""WITH scored AS (
       | SELECT doc_id, lang, text,
       |  $scores,
       |  CASE WHEN length(trim(text)) = 0 THEN 0
       |       ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_toks,
       |  length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS n_alpha
       | FROM documents)
       |SELECT doc_id, lang,
       | CASE WHEN NOT ($anyVote) THEN 'und'
       |      $chain
       |      ELSE 'und' END AS lang_id,
       | round(n_alpha / CAST(greatest(length(text), 1) AS DOUBLE) * 0.4
       |     + least(s_en * 5.0 / CAST(greatest(n_toks, 1) AS DOUBLE), 1.0) * 0.3
       |     + least(CAST(greatest(n_toks, 1) AS DOUBLE) / 100.0, 1.0) * 0.3, 6) AS quality
       |FROM scored ORDER BY doc_id""".stripMargin
  }

  /** Oracle for the stage-agg delivery gates: re-derive the task metrics
    * from events exactly as [[taskMetricSpool]] does, aggregate per
    * stage (optionally per 1-minute event-time window), and compute the
    * same max-relative-distance skew with the range-0 guard.
    */
  private def stageAggOracleSql(windowed: Boolean, winMs: Long = 60000L): String = {
    val winCol = if (windowed) s", (ms // $winMs) * $winMs AS win_ms" else ""
    val winKey = if (windowed) ", 4" else ""
    val winOut = if (windowed) ", win_ms" else ""
    s"""WITH t AS (
       | SELECT 'app-' || CAST(user_id % 3 AS VARCHAR) AS app_id,
       |  CAST(user_id % 4 AS VARCHAR) AS job_id,
       |  user_id % 10 AS stage_id,
       |  CAST(floor(value * 1000) AS BIGINT) AS in_b,
       |  event_id % 997 AS sh_b,
       |  epoch_ms(ts) AS ms
       | FROM events),
       |g AS (
       | SELECT app_id, job_id, stage_id$winCol, count(*) n,
       |  sum(in_b) sum_in, min(in_b) min_in, max(in_b) max_in,
       |  sum(sh_b) sum_sh, min(sh_b) min_sh, max(sh_b) max_sh,
       |  max(ms) last_ms
       | FROM t GROUP BY 1, 2, 3$winKey)
       |SELECT app_id, job_id, CAST(stage_id AS BIGINT) AS stage_id,
       | round(greatest(max_in - CAST(sum_in AS DOUBLE) / n, CAST(sum_in AS DOUBLE) / n - min_in)
       |   / (CASE WHEN max_in = min_in THEN 1 ELSE max_in - min_in END), 6) AS in_skew,
       | max_in AS max_in,
       | round(greatest(max_sh - CAST(sum_sh AS DOUBLE) / n, CAST(sum_sh AS DOUBLE) / n - min_sh)
       |   / (CASE WHEN max_sh = min_sh THEN 1 ELSE max_sh - min_sh END), 6) AS sh_skew,
       | max_sh AS max_sh, last_ms$winOut
       |FROM g ORDER BY 1, 2, 3${if (windowed) ", win_ms" else ""}""".stripMargin
  }

  /** SRP-LSH oracle: embed the engine's deterministic hyperplanes as SQL
    * literals so DuckDB recomputes the identical signatures. Shared by
    * the scan-filter form (q23) and the partition-pruned index form
    * (q34) — "sig_bucket IN hammingBall(qsig, r)" is exactly
    * "bit_count(xor(s, qsig)) <= r" over all rows.
    */
  private def srpOracleSql(bits: Int, queryVecId: Int, maxHamming: Int): String = {
    val planes = Similarity.hyperplanes(bits, 64)
      .map(p => "[" + p.map(_.toString).mkString(",") + "]")
    def sigTerms(v: String) = planes.zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN list_dot_product($v, $p) > 0 THEN (1::BIGINT << $i) ELSE 0::BIGINT END)"
    }.mkString(" + ")
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v FROM embeddings),
       |q AS (SELECT v qv FROM e WHERE vec_id = $queryVecId),
       |sig AS (SELECT vec_id, v, ${sigTerms("v")} AS s FROM e),
       |qs AS (SELECT qv, ${sigTerms("qv")} AS qsig FROM q)
       |SELECT vec_id,
       | round(list_dot_product(v, qv) / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) AS cos
       |FROM sig, qs
       |WHERE bit_count(xor(s, qsig)) <= $maxHamming
       |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin
  }

  private lazy val q23Sql: String = srpOracleSql(annBits, 1, annMaxHamming)
  private lazy val q34Sql: String = srpOracleSql(idxBits, 2, idxMaxHamming)
  private lazy val q59Sql: String = srpOracleSql(idxBits, 4, idxMaxHamming)

  /** IVF oracle: assign every vector to its argmax-dot cell from the
    * engine's centroid literals (ties → first index, matching
    * array_position), rank cells for the query the same way the engine's
    * driver-side probe does (desc dot, tie → lower cell), keep nProbe.
    */
  private lazy val q35Sql: String = {
    val csLit = "[" + Similarity.ivfCentroids(ivfCells, 64)
      .map(c => "[" + c.map(_.toString).mkString(",") + "]").mkString(",") + "]"
    s"""WITH cs AS (SELECT $csLit AS cs),
       |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v FROM embeddings),
       |q AS (SELECT v qv FROM e WHERE vec_id = 3),
       |ad AS (SELECT vec_id, v, [list_dot_product(v, c) FOR c IN cs.cs] dots FROM e, cs),
       |assigned AS (SELECT vec_id, v, list_position(dots, list_max(dots)) - 1 AS cell FROM ad),
       |cd AS (SELECT r.i AS cell, list_dot_product(q.qv, cs.cs[CAST(r.i AS INT) + 1]) d
       |       FROM q, cs, range(0, $ivfCells) r(i)),
       |probes AS (SELECT cell FROM (
       |  SELECT cell, row_number() OVER (ORDER BY d DESC, cell) rk FROM cd) t
       |  WHERE rk <= $ivfProbe)
       |SELECT a.vec_id,
       | round(list_dot_product(a.v, q.qv) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos
       |FROM assigned a, probes p, q WHERE a.cell = p.cell
       |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q281_pipeline_yaml" ->
      """SELECT * FROM (
        | SELECT 'all-events' AS sink_index, CAST(count(*) AS BIGINT) AS n,
        |  CAST(coalesce(sum(CAST(floor(value * 100) AS BIGINT)), 0)
        |    AS BIGINT) AS total_cents
        | FROM events
        |UNION ALL
        | SELECT 'non-purchase', CAST(count(*) AS BIGINT),
        |  CAST(coalesce(sum(CAST(floor(value * 100) AS BIGINT)), 0) AS BIGINT)
        | FROM events WHERE event_type IS DISTINCT FROM 'purchase'
        |UNION ALL
        | SELECT 'purchase-or-click', CAST(count(*) AS BIGINT),
        |  CAST(coalesce(sum(CAST(floor(value * 100) AS BIGINT)), 0) AS BIGINT)
        | FROM events WHERE event_type = 'purchase' OR event_type = 'click'
        |) u ORDER BY sink_index""".stripMargin,
    "q268_erasure_rewrite" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
        | CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        | CAST(0 AS BIGINT) AS erased_remaining
        |FROM events WHERE user_id IS NULL OR user_id % 97 <> 0
        |GROUP BY 1 ORDER BY event_type""".stripMargin,
    "q267_disorder_rate" ->
      """WITH e AS (SELECT event_type, event_id, epoch_ms(ts) AS ms FROM events),
        |r AS (SELECT *, lag(ms) OVER (PARTITION BY event_type
        |       ORDER BY event_id) AS pms FROM e)
        |SELECT event_type,
        | CAST(sum(CASE WHEN pms IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs,
        | CAST(sum(CASE WHEN pms IS NOT NULL AND ms < pms THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_inversions,
        | CAST(sum(CASE WHEN pms IS NOT NULL AND ms < pms THEN 1 ELSE 0 END)
        |   * 1000000 // sum(CASE WHEN pms IS NOT NULL THEN 1 ELSE 0 END)
        |   AS BIGINT) AS inversion_ppm
        |FROM r GROUP BY 1 ORDER BY event_type""".stripMargin,
    "q266_decile_heatmap" ->
      ("""WITH e AS (SELECT epoch_ms(ts) // 86400000 AS day,
        |        CAST(floor(value * 100) AS BIGINT) AS cents
        |       FROM events WHERE value IS NOT NULL),
        |vc AS (SELECT cents, count(*) AS cnt FROM e GROUP BY 1),
        |r AS (SELECT *, sum(cnt) OVER (ORDER BY cents
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |       sum(cnt) OVER () AS n FROM vc),
        |b AS (SELECT """ +
        (1 to 10).map(d =>
          s"min(CASE WHEN cum >= ($d * n + 9) // 10 THEN cents END) AS b$d")
          .mkString(",\n        ") +
        """ FROM r)
        |SELECT day, CASE """ +
        (1 to 9).map(d => s"WHEN cents <= b$d THEN CAST($d AS BIGINT)")
          .mkString(" ") +
        """ ELSE CAST(10 AS BIGINT) END AS decile,
        | CAST(count(*) AS BIGINT) AS n
        |FROM e, b GROUP BY 1, 2 ORDER BY day, decile""").stripMargin,
    "q265_mmr_rerank" -> q265Sql,
    "q264_filtered_ann" ->
      """WITH e AS (SELECT vec_id, label,
        |        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |       FROM embeddings),
        |q AS (SELECT v AS qv, label AS ql FROM e WHERE vec_id = 2),
        |sc AS (SELECT vec_id, label,
        |        round(list_dot_product(v, qv) /
        |          (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))),
        |          6) AS cos, ql
        |       FROM e, q),
        |ex AS (SELECT 'a_prefilter_exact' AS method, vec_id, cos
        |       FROM sc WHERE label <> ql ORDER BY cos DESC, vec_id LIMIT 10),
        |t50 AS (SELECT * FROM sc ORDER BY cos DESC, vec_id LIMIT 50),
        |pf AS (SELECT 'b_postfilter_50' AS method, vec_id, cos
        |       FROM t50 WHERE label <> ql ORDER BY cos DESC, vec_id LIMIT 10)
        |SELECT * FROM (SELECT * FROM ex UNION ALL SELECT * FROM pf) u
        |ORDER BY method, cos DESC, vec_id""".stripMargin,
    "q263_salt_planner" ->
      """WITH k AS (SELECT user_id AS key, count(*) AS n
        |       FROM events WHERE user_id IS NOT NULL GROUP BY 1),
        |f AS (SELECT key, n AS n_left, n AS n_right, n * n AS fanout FROM k
        |      ORDER BY fanout DESC, key LIMIT 10)
        |SELECT key, CAST(n_left AS BIGINT) AS n_left,
        | CAST(n_right AS BIGINT) AS n_right, CAST(fanout AS BIGINT) AS fanout,
        | CAST(greatest(1, least(32, (n_right + 49999) // 50000)) AS BIGINT) AS salt,
        | CAST(n_right // greatest(1, least(32, (n_right + 49999) // 50000))
        |   AS BIGINT) AS rows_per_task
        |FROM f ORDER BY fanout DESC, key""".stripMargin,
    "q261_reconciliation" ->
      """WITH l AS (SELECT l_orderkey,
        |        sum(CAST(floor(l_extendedprice * 100.0) AS BIGINT)) AS lc
        |       FROM lineitem GROUP BY 1),
        |j AS (SELECT CAST(floor(o_totalprice * 100.0) AS BIGINT) - lc AS d, lc
        |      FROM orders LEFT JOIN l ON o_orderkey = l_orderkey),
        |b AS (SELECT CASE WHEN lc IS NULL THEN 'a_no_lines'
        |             WHEN abs(d) < 1000000 THEN 'b_under_10k'
        |             WHEN abs(d) < 10000000 THEN 'c_under_100k'
        |             ELSE 'd_over_100k' END AS bucket, d FROM j)
        |SELECT bucket, CAST(count(*) AS BIGINT) AS n_orders,
        | CAST(coalesce(sum(d), 0) AS BIGINT) AS net_cents,
        | CAST(coalesce(sum(abs(d)), 0) AS BIGINT) AS abs_cents
        |FROM b GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q262_top_with_ties" ->
      """WITH d AS (SELECT epoch_ms(ts) // 86400000 AS day,
        |        sum(CAST(floor(value * 100) AS BIGINT)) // 100000 AS rev_hundreds
        |       FROM events
        |       WHERE event_type = 'purchase' AND value IS NOT NULL GROUP BY 1),
        |r AS (SELECT *, rank() OVER (ORDER BY rev_hundreds DESC) AS rk FROM d)
        |SELECT CAST(day AS BIGINT) AS day, CAST(rev_hundreds AS BIGINT) AS rev_hundreds,
        | CAST(rk AS BIGINT) AS rk
        |FROM r WHERE rk <= 3 ORDER BY rk, day""".stripMargin,
    "q258_federated_formats" ->
      """SELECT event_type,
        | CAST(3 * count(*) AS BIGINT) AS n_rows,
        | CAST(3 * sum(coalesce(CAST(floor(value * 100) AS BIGINT), 0)) AS BIGINT)
        |   AS sum_cents,
        | CAST(count(DISTINCT event_id) AS BIGINT) AS n_ids
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,
    "q259_daily_percentiles" ->
      """WITH c AS (SELECT epoch_ms(ts) // 86400000 AS day,
        |        CAST(floor(value * 100) AS BIGINT) AS cents, count(*) AS cnt
        |       FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |r AS (SELECT *, sum(cnt) OVER (PARTITION BY day ORDER BY cents
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi,
        |       sum(cnt) OVER (PARTITION BY day) AS n
        |      FROM c)
        |SELECT CAST(day AS BIGINT) AS day, CAST(max(n) AS BIGINT) AS n,
        | max(CASE WHEN hi - cnt < (50 * (n - 1)) // 100 + 1
        |      AND (50 * (n - 1)) // 100 + 1 <= hi THEN cents END) AS p50,
        | max(CASE WHEN hi - cnt < (95 * (n - 1)) // 100 + 1
        |      AND (95 * (n - 1)) // 100 + 1 <= hi THEN cents END) AS p95,
        | max(CASE WHEN hi - cnt < (99 * (n - 1)) // 100 + 1
        |      AND (99 * (n - 1)) // 100 + 1 <= hi THEN cents END) AS p99
        |FROM r GROUP BY day ORDER BY day""".stripMargin,
    "q260_apdex" ->
      """SELECT CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day,
        | CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(CASE WHEN value <= 250.0 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS satisfied,
        | CAST(sum(CASE WHEN value > 250.0 AND value <= 1000.0 THEN 1 ELSE 0 END)
        |   AS BIGINT) AS tolerating,
        | CAST((2 * sum(CASE WHEN value <= 250.0 THEN 1 ELSE 0 END)
        |   + sum(CASE WHEN value > 250.0 AND value <= 1000.0 THEN 1 ELSE 0 END))
        |   * 1000000 // (2 * count(*)) AS BIGINT) AS apdex_ppm
        |FROM events WHERE value IS NOT NULL
        |GROUP BY 1 ORDER BY day""".stripMargin,
    "q256_sql_interface" ->
      """WITH m AS (
        |  SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m') AS month,
        |         date_part('year', l_shipdate) AS yr,
        |         sum(CAST(floor(l_extendedprice * 100.0) AS BIGINT)) AS cents
        |  FROM lineitem GROUP BY 1, 2),
        |w AS (
        |  SELECT month, cents,
        |         sum(cents) OVER (PARTITION BY yr ORDER BY month
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ytd_cents
        |  FROM m)
        |SELECT month, CAST(cents AS BIGINT) AS cents,
        | CAST(ytd_cents AS BIGINT) AS ytd_cents,
        | CAST(cents * 1000000 // ytd_cents AS BIGINT) AS share_of_ytd_ppm
        |FROM w ORDER BY month""".stripMargin,
    "q257_typed_pipeline" ->
      """SELECT event_type, CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day,
        | CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(coalesce(CAST(floor(value * 100) AS BIGINT), 0)) AS BIGINT)
        |   AS total_cents,
        | CAST(max(coalesce(CAST(floor(value * 100) AS BIGINT), 0)) AS BIGINT)
        |   AS max_cents,
        | CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events GROUP BY 1, 2 ORDER BY event_type, day""".stripMargin,
    "q250_orc_roundtrip" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        | CAST(sum(CAST(floor(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT) AS sum_cents,
        | CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,
    "q249_sales_opportunity" ->
      """WITH c AS (SELECT c_custkey, c_nationkey,
        |        CAST(floor(c_acctbal * 100.0) AS BIGINT) AS bal_cents
        |       FROM customer),
        |a AS (SELECT count(*) AS n, sum(bal_cents) AS sb FROM c
        |      WHERE bal_cents > 0)
        |SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
        | CAST(count(*) AS BIGINT) AS n_custs,
        | CAST(sum(bal_cents) AS BIGINT) AS total_cents
        |FROM c, a
        |WHERE bal_cents * n > sb
        | AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        |   AND date_part('year', o.o_orderdate) >= 1999)
        |GROUP BY 1 ORDER BY c_nationkey""".stripMargin,
    "q246_small_quantity_revenue" ->
      """WITH t AS (SELECT l_partkey, count(*) AS n,
        |        sum(CAST(l_quantity AS BIGINT)) AS sq
        |       FROM lineitem GROUP BY 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_small,
        | CAST(coalesce(sum(CAST(floor(l_extendedprice * 100.0) AS BIGINT)), 0)
        |   AS BIGINT) AS revenue_cents
        |FROM lineitem l JOIN t ON l.l_partkey = t.l_partkey
        |WHERE CAST(l_quantity AS BIGINT) * 5 * n < sq""".stripMargin,
    "q247_large_volume_customers" ->
      """WITH big AS (SELECT l_orderkey,
        |        CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
        |       FROM lineitem GROUP BY 1 HAVING total_qty >= 150)
        |SELECT c_name, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date,
        | CAST(floor(o_totalprice * 100.0) AS BIGINT) AS total_cents, total_qty
        |FROM big JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY total_qty DESC, o_orderkey LIMIT 10""".stripMargin,
    "q248_set_ops" ->
      """WITH a AS (SELECT DISTINCT o_custkey FROM orders
        |       WHERE date_part('year', o_orderdate) = 1996),
        |b AS (SELECT DISTINCT o_custkey FROM orders
        |       WHERE date_part('year', o_orderdate) = 1997)
        |SELECT * FROM (
        | SELECT 'churned_after_96' AS cohort, CAST(count(*) AS BIGINT) AS n_customers
        | FROM (SELECT o_custkey FROM a EXCEPT SELECT o_custkey FROM b) x
        | UNION ALL
        | SELECT 'new_in_97', count(*)
        | FROM (SELECT o_custkey FROM b EXCEPT SELECT o_custkey FROM a) y
        | UNION ALL
        | SELECT 'retained_96_97', count(*)
        | FROM (SELECT o_custkey FROM a INTERSECT SELECT o_custkey FROM b) z
        |) u ORDER BY cohort""".stripMargin,
    "q243_shipping_priority" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date,
        | o_orderpriority,
        | CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0)
        |   AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        | AND CAST(o_orderdate AS DATE) < DATE '1997-07-01'
        |JOIN lineitem ON o_orderkey = l_orderkey
        | AND CAST(l_shipdate AS DATE) > DATE '1997-07-01'
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue_cents DESC, o_orderkey LIMIT 10""".stripMargin,
    "q244_local_supplier_volume" ->
      """SELECT n_name,
        | CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0)
        |   AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        | AND date_part('year', o_orderdate) = 1997
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
        |GROUP BY 1 ORDER BY revenue_cents DESC, n_name""".stripMargin,
    "q245_parts_supplier" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        |good AS (SELECT ps.* FROM ps
        |         WHERE l_suppkey NOT IN (
        |           SELECT s_suppkey FROM supplier WHERE s_acctbal < 1500.0))
        |SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
        | CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM good JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO' AND p_size <= 10
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size LIMIT 20""".stripMargin,
    "q235_stream_enrich" ->
      """SELECT c_mktsegment,
        | CAST(count(*) AS BIGINT) AS n_events,
        | CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        | CAST(coalesce(sum(CAST(floor(value * 100) AS BIGINT)), 0) AS BIGINT) AS cents
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY 1 ORDER BY c_mktsegment""".stripMargin,
    "q230_observed_ingest" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        | CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_users,
        | CAST(coalesce(sum(CAST(floor(value * 100) AS BIGINT)), 0) AS BIGINT) AS sum_cents,
        | CAST(min(epoch_ms(ts) // 86400000) AS BIGINT) AS min_day,
        | CAST(max(epoch_ms(ts) // 86400000) AS BIGINT) AS max_day
        |FROM events""".stripMargin,
    "q127_overlap_shipments" ->
      """WITH b AS (
        | SELECT l_partkey pk, epoch_ms(l_shipdate) // 86400000 AS sd,
        |  epoch_ms(l_shipdate) // 86400000 + CAST(l_quantity AS BIGINT) % 28 + 3 AS ed,
        |  l_orderkey * 10 + l_linenumber AS lid
        | FROM lineitem)
        |SELECT x.pk AS partkey, count(*) AS n_pairs,
        | CAST(sum(least(x.ed, y.ed) - greatest(x.sd, y.sd)) AS BIGINT) AS overlap_days
        |FROM b x JOIN b y ON x.pk = y.pk AND x.lid < y.lid
        | AND x.sd < y.ed AND y.sd < x.ed
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q128_hierarchy_flatten" ->
      """WITH RECURSIVE e AS (
        | SELECT p_partkey AS node, greatest(p_partkey // 3, 1) AS parent FROM part),
        |h AS (
        | SELECT node, node AS root, CAST(0 AS BIGINT) AS depth FROM e WHERE parent = node
        | UNION ALL
        | SELECT e.node, h.root, h.depth + 1 FROM e JOIN h ON e.parent = h.node
        |  WHERE e.parent <> e.node)
        |SELECT node, root, depth FROM h ORDER BY node""".stripMargin,
    "q129_melt_measures" ->
      """WITH w AS (
        | SELECT l_returnflag rf,
        |  CAST(floor(l_quantity * 100) AS BIGINT) AS quantity,
        |  CAST(floor(l_extendedprice * 100) AS BIGINT) AS extendedprice,
        |  CAST(floor(l_discount * 100) AS BIGINT) AS discount,
        |  CAST(floor(l_tax * 100) AS BIGINT) AS tax
        | FROM lineitem),
        |m AS (
        | SELECT rf, 'quantity' AS measure, quantity AS cents FROM w
        | UNION ALL SELECT rf, 'extendedprice', extendedprice FROM w
        | UNION ALL SELECT rf, 'discount', discount FROM w
        | UNION ALL SELECT rf, 'tax', tax FROM w)
        |SELECT rf, measure, CAST(sum(cents) AS BIGINT) AS total_cents,
        | count(*) AS n
        |FROM m GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q130_order_documents" ->
      """WITH i AS (
        | SELECT l_orderkey, CAST(l_linenumber AS BIGINT) ln, l_partkey pk,
        |  CAST(l_quantity AS BIGINT) qty,
        |  CAST(floor(l_extendedprice * 100) AS BIGINT) cents
        | FROM lineitem),
        |g AS (
        | SELECT l_orderkey, count(*) AS n_items,
        |  CAST(sum(cents) AS BIGINT) AS total_cents,
        |  string_agg(ln || ':' || pk || ':' || qty || ':' || cents, '|'
        |   ORDER BY ln, pk, qty, cents) AS sig
        | FROM i GROUP BY 1)
        |SELECT o_orderkey AS order_key, o_custkey AS cust_key,
        | coalesce(g.n_items, 0) AS n_items,
        | coalesce(g.total_cents, 0) AS total_cents,
        | coalesce(g.sig, '') AS items_sig
        |FROM orders o LEFT JOIN g ON o.o_orderkey = g.l_orderkey
        |ORDER BY order_key""".stripMargin,
    "q131_collocations" ->
      """WITH toks AS (
        | SELECT string_split_regex(trim(text), '\s+') tk FROM documents),
        |uni AS (SELECT unnest(tk) w FROM toks),
        |uc AS (SELECT w, count(*) c FROM uni GROUP BY 1),
        |nu AS (SELECT count(*) n FROM uni),
        |bi AS (
        | SELECT unnest([struct_pack(w1 := tk[i], w2 := tk[i + 1])
        |  FOR i IN range(1, len(tk))]) AS b FROM toks),
        |bc AS (SELECT b.w1 AS w1, b.w2 AS w2, count(*) c_ab FROM bi GROUP BY 1, 2),
        |nb AS (SELECT count(*) n FROM bi)
        |SELECT w1, w2, c_ab, a.c AS c_a, b.c AS c_b,
        | CAST(CAST(c_ab AS HUGEINT) * nu.n * nu.n * 1000000 //
        |  (CAST(nb.n AS HUGEINT) * a.c * b.c) AS BIGINT) AS lift_ppm
        |FROM bc JOIN uc a ON bc.w1 = a.w JOIN uc b ON bc.w2 = b.w, nu, nb
        |WHERE c_ab >= 5
        |ORDER BY lift_ppm DESC, w1, w2 LIMIT 50""".stripMargin,
    "q132_vocab_coverage" ->
      """WITH toks AS (
        | SELECT doc_id, string_split_regex(trim(text), '\s+') tk FROM documents),
        |u AS (SELECT doc_id, unnest(tk) w FROM toks),
        |c AS (SELECT w, count(*) c FROM u GROUP BY 1),
        |v AS (SELECT w, CAST(row_number() OVER (ORDER BY c DESC, w) AS BIGINT) id
        |      FROM c QUALIFY id <= 30),
        |j AS (SELECT u.doc_id, v.id FROM u LEFT JOIN v ON u.w = v.w)
        |SELECT doc_id, count(*) AS n_tokens,
        | CAST(sum(CASE WHEN id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        | CAST(sum(CASE WHEN id IS NULL THEN 1 ELSE 0 END) * 1000000
        |  // count(*) AS BIGINT) AS oov_ppm,
        | CAST(coalesce(sum(id), 0) AS BIGINT) AS id_sum
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    "q133_quantile_norm" ->
      """WITH e AS (
        | SELECT event_type typ, CAST(floor(value * 1000) AS BIGINT) vm, event_id
        | FROM events),
        |nn AS (SELECT count(*) n FROM e),
        |g AS (SELECT vm, CAST(row_number() OVER (ORDER BY vm, event_id) AS BIGINT) gr
        |      FROM e),
        |r AS (SELECT typ, vm, event_id,
        |  CAST(row_number() OVER (PARTITION BY typ ORDER BY vm, event_id) AS BIGINT) r,
        |  count(*) OVER (PARTITION BY typ) cnt FROM e),
        |x AS (SELECT typ,
        |  CASE WHEN cnt = 1 THEN ((SELECT n FROM nn) + 1) // 2
        |   ELSE (r - 1) * ((SELECT n FROM nn) - 1) // (cnt - 1) + 1 END AS idx
        | FROM r),
        |m AS (SELECT x.typ, g.vm AS norm FROM x JOIN g ON g.gr = x.idx)
        |SELECT typ, count(*) AS n, CAST(sum(norm) AS BIGINT) AS sum_norm,
        | min(norm) AS min_norm, max(norm) AS max_norm
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,
    "q134_ab_test" ->
      """WITH e AS (
        | SELECT event_type typ, CAST(floor(value * 1000) AS BIGINT) vm,
        |  user_id % 2 = 1 AS b FROM events),
        |a AS (SELECT typ,
        | CAST(sum(CASE WHEN NOT b THEN 1 ELSE 0 END) AS BIGINT) n_a,
        | CAST(sum(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT) n_b,
        | CAST(sum(CASE WHEN NOT b THEN vm ELSE 0 END) AS BIGINT) sum_a,
        | CAST(sum(CASE WHEN b THEN vm ELSE 0 END) AS BIGINT) sum_b,
        | CAST(sum(CASE WHEN NOT b THEN vm * vm ELSE 0 END) AS BIGINT) ss_a,
        | CAST(sum(CASE WHEN b THEN vm * vm ELSE 0 END) AS BIGINT) ss_b
        | FROM e GROUP BY 1),
        |m AS (SELECT typ, n_a, n_b,
        | sum_a // nullif(n_a, 0) AS mean_a, sum_b // nullif(n_b, 0) AS mean_b,
        | CAST((CAST(n_a AS HUGEINT) * ss_a - CAST(sum_a AS HUGEINT) * sum_a) //
        |  (CAST(n_a AS HUGEINT) * nullif(n_a, 0)) AS BIGINT) AS var_a,
        | CAST((CAST(n_b AS HUGEINT) * ss_b - CAST(sum_b AS HUGEINT) * sum_b) //
        |  (CAST(n_b AS HUGEINT) * nullif(n_b, 0)) AS BIGINT) AS var_b
        | FROM a)
        |SELECT typ, n_a, n_b, mean_a, mean_b, var_a, var_b,
        | mean_b - mean_a AS diff,
        | CAST(CASE WHEN (mean_b - mean_a) * (mean_b - mean_a) >
        |  4 * (var_a // nullif(n_a, 0) + var_b // nullif(n_b, 0))
        |  THEN 1 ELSE 0 END AS BIGINT) AS significant
        |FROM m ORDER BY typ""".stripMargin,
    "q135_kcore" -> kcoreOracle(k = 80, rounds = 10),
    "q136_sequence_gaps" ->
      """WITH p AS (
        | SELECT o_orderkey k FROM orders
        | WHERE CAST(floor(o_totalprice) AS BIGINT) % 5 != 0),
        |g AS (SELECT k, lead(k) OVER (ORDER BY k) nk FROM p)
        |SELECT k + 1 AS gap_start, nk - 1 AS gap_end, nk - k - 1 AS missing
        |FROM g WHERE nk > k + 1 ORDER BY gap_start""".stripMargin,
    "q137_integrity_audit" ->
      """WITH r1 AS (
        | SELECT 'lineitem.orderkey->orders' AS relationship,
        |  count(*) AS child_rows,
        |  CAST(sum(CASE WHEN c.l_orderkey IS NOT NULL AND p.__pk IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS orphan_rows,
        |  count(DISTINCT CASE WHEN c.l_orderkey IS NOT NULL AND p.__pk IS NULL THEN c.l_orderkey END) AS orphan_keys
        | FROM lineitem c LEFT JOIN (SELECT DISTINCT o_orderkey AS __pk FROM orders) p
        |  ON c.l_orderkey = p.__pk),
        |r2 AS (
        | SELECT 'lineitem.suppkey->supplier', count(*),
        |  CAST(sum(CASE WHEN c.l_suppkey IS NOT NULL AND p.__pk IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  count(DISTINCT CASE WHEN c.l_suppkey IS NOT NULL AND p.__pk IS NULL THEN c.l_suppkey END)
        | FROM lineitem c LEFT JOIN (SELECT DISTINCT s_suppkey AS __pk FROM supplier) p
        |  ON c.l_suppkey = p.__pk),
        |r3 AS (
        | SELECT 'orders.custkey->customer', count(*),
        |  CAST(sum(CASE WHEN c.o_custkey IS NOT NULL AND p.__pk IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  count(DISTINCT CASE WHEN c.o_custkey IS NOT NULL AND p.__pk IS NULL THEN c.o_custkey END)
        | FROM orders c LEFT JOIN (SELECT DISTINCT c_custkey AS __pk FROM customer) p
        |  ON c.o_custkey = p.__pk),
        |r4 AS (
        | SELECT 'orders.custkey->active_customer', count(*),
        |  CAST(sum(CASE WHEN c.o_custkey IS NOT NULL AND p.__pk IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  count(DISTINCT CASE WHEN c.o_custkey IS NOT NULL AND p.__pk IS NULL THEN c.o_custkey END)
        | FROM orders c LEFT JOIN
        |  (SELECT DISTINCT c_custkey AS __pk FROM customer WHERE c_acctbal >= 0) p
        |  ON c.o_custkey = p.__pk),
        |r5 AS (
        | SELECT 'events.user_id->customer', count(*),
        |  CAST(sum(CASE WHEN c.user_id IS NOT NULL AND p.__pk IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  count(DISTINCT CASE WHEN c.user_id IS NOT NULL AND p.__pk IS NULL THEN c.user_id END)
        | FROM events c LEFT JOIN (SELECT DISTINCT c_custkey AS __pk FROM customer) p
        |  ON c.user_id = p.__pk)
        |SELECT * FROM r1 UNION ALL SELECT * FROM r2 UNION ALL SELECT * FROM r3
        |UNION ALL SELECT * FROM r4 UNION ALL SELECT * FROM r5""".stripMargin,
    "q138_decayed_trends" ->
      """WITH b AS (
        | SELECT event_type,
        |  date_diff('day', CAST(ts AS DATE), (SELECT max(CAST(ts AS DATE)) FROM events)) AS age,
        |  CAST(floor(value * 100) AS BIGINT) AS vc
        | FROM events),
        |w AS (SELECT event_type, vc,
        |       (1::BIGINT << CAST(16 - least(age // 7, 16) AS INT)) AS wu FROM b)
        |SELECT event_type, count(*) AS n,
        | CAST(sum(wu) AS BIGINT) AS decayed_units,
        | CAST(sum(vc * wu) AS BIGINT) AS dec_value_units,
        | CAST(CAST(sum(wu) AS BIGINT) AS DOUBLE) / 65536.0 AS decayed
        |FROM w GROUP BY 1 ORDER BY 1""".stripMargin,
    "q139_lang_source_independence" ->
      """WITH cells AS (SELECT lang, source, count(*) AS obs FROM documents GROUP BY 1, 2),
        |t AS (SELECT lang, source, obs,
        |       CAST(sum(obs) OVER (PARTITION BY lang) AS BIGINT) AS row_total,
        |       CAST(sum(obs) OVER (PARTITION BY source) AS BIGINT) AS col_total,
        |       CAST(sum(obs) OVER () AS BIGINT) AS grand_total
        |      FROM cells),
        |e AS (SELECT *, CAST(row_total AS DOUBLE) * col_total / grand_total AS expected FROM t)
        |SELECT lang, source, obs, row_total, col_total, grand_total, expected,
        | CAST(obs AS DOUBLE) / expected AS lift
        |FROM e ORDER BY lang, source""".stripMargin,
    "q140_benford_audit" ->
      """WITH d AS (
        | SELECT CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
        | FROM orders WHERE o_totalprice >= 1),
        |c AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
        |t AS (SELECT c.*, (SELECT CAST(sum(n) AS BIGINT) FROM c) AS tot FROM c),
        |o AS (SELECT digit, n, (n * 1000000) // tot AS obs_ppm,
        |       CAST(CASE digit WHEN 1 THEN 301030 WHEN 2 THEN 176091
        |        WHEN 3 THEN 124939 WHEN 4 THEN 96910 WHEN 5 THEN 79181
        |        WHEN 6 THEN 66947 WHEN 7 THEN 57992 WHEN 8 THEN 51153
        |        ELSE 45757 END AS BIGINT) AS expected_ppm FROM t)
        |SELECT digit, n, CAST(obs_ppm AS BIGINT) AS obs_ppm, expected_ppm,
        | CAST(obs_ppm - expected_ppm AS BIGINT) AS dev_ppm
        |FROM o ORDER BY digit""".stripMargin,
    "q141_containment_pairs" ->
      s"""WITH $shingleSql,
         |p AS (SELECT a.doc_id ida, b.doc_id idb,
         |       len(list_intersect(a.sh, b.sh)) shared, len(a.sh) na, len(b.sh) nb
         |      FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
         |SELECT ida AS id_a, idb AS id_b, CAST(shared AS BIGINT) AS shared,
         | CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b
         |FROM p WHERE least(na, nb) > 0 AND 10 * shared >= 8 * least(na, nb)
         |ORDER BY id_a, id_b""".stripMargin,
    "q143_peak_concurrency" ->
      """WITH iv AS (SELECT epoch_ms(ts) AS sms, epoch_ms(ts) + 300000 AS ems FROM events),
        |sp AS (SELECT (sms // 60000) // 1440 AS day, sms // 60000 AS s,
        |        least((ems + 59999) // 60000, ((sms // 60000) // 1440 + 1) * 1440) AS e
        |       FROM iv),
        |dl AS (SELECT day, s AS minute, 1 AS d FROM sp
        |       UNION ALL SELECT day, e, -1 FROM sp),
        |ag AS (SELECT day, minute, CAST(sum(d) AS BIGINT) AS delta FROM dl GROUP BY 1, 2),
        |rn AS (SELECT day, minute,
        |        sum(delta) OVER (PARTITION BY day ORDER BY minute ROWS UNBOUNDED PRECEDING) AS conc
        |       FROM ag),
        |pk AS (SELECT day, max(conc) AS peak FROM rn GROUP BY 1)
        |SELECT CAST(rn.day AS BIGINT) AS day, CAST(pk.peak AS BIGINT) AS peak,
        | CAST(min(rn.minute) % 1440 AS BIGINT) AS peak_minute
        |FROM rn JOIN pk ON rn.day = pk.day AND rn.conc = pk.peak
        |GROUP BY rn.day, pk.peak ORDER BY day""".stripMargin,
    "q144_top_paths" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) // 86400000 AS day,
        |        epoch_ms(ts) AS ms, event_id, event_type FROM events),
        |g AS (SELECT user_id, day,
        |       array_to_string((list(event_type ORDER BY ms, event_id))[1:3], '>') AS path
        |      FROM e GROUP BY 1, 2),
        |c AS (SELECT path, count(*) AS n FROM g GROUP BY 1)
        |SELECT path, n FROM c ORDER BY n DESC, path LIMIT 20""".stripMargin,
    "q145_floored_balance" ->
      """WITH d AS (SELECT o_custkey AS k, o_orderdate AS dt, o_orderkey AS id,
        |        CAST(floor(o_totalprice * 100) AS BIGINT) *
        |         (CASE WHEN o_orderkey % 3 = 0 THEN -1 ELSE 1 END) AS delta
        |       FROM orders),
        |w1 AS (SELECT *, sum(delta) OVER
        |        (PARTITION BY k ORDER BY dt ASC NULLS FIRST, id ASC NULLS FIRST
        |         ROWS UNBOUNDED PRECEDING) AS cum
        |       FROM d),
        |w2 AS (SELECT *, cum - least(min(cum) OVER
        |        (PARTITION BY k ORDER BY dt ASC NULLS FIRST, id ASC NULLS FIRST
        |         ROWS UNBOUNDED PRECEDING), 0) AS bal,
        |       CASE WHEN cum < least(coalesce(min(cum) OVER
        |        (PARTITION BY k ORDER BY dt ASC NULLS FIRST, id ASC NULLS FIRST
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0), 0)
        |        THEN 1 ELSE 0 END AS hit
        |       FROM w1),
        |f AS (SELECT k, bal, row_number() OVER
        |       (PARTITION BY k ORDER BY dt DESC NULLS LAST, id DESC NULLS LAST) AS rn
        |      FROM w2),
        |a AS (SELECT k, max(bal) AS mx,
        |       CAST(sum(hit) AS BIGINT) AS fh
        |      FROM w2 GROUP BY k)
        |SELECT a.k AS custkey, CAST(f.bal AS BIGINT) AS final_balance,
        | CAST(a.mx AS BIGINT) AS max_balance,
        | a.fh AS floor_hits
        |FROM a JOIN f ON a.k = f.k AND f.rn = 1 ORDER BY custkey""".stripMargin,
    "q146_gini_concentration" ->
      """WITH r AS (SELECT lang, CAST(n_chars AS BIGINT) AS v,
        |        CAST(row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS BIGINT) AS r
        |       FROM documents),
        |a AS (SELECT lang, count(*) AS n, CAST(sum(v) AS BIGINT) AS sum_v,
        |       sum(CAST(r AS HUGEINT) * v) AS rw FROM r GROUP BY 1),
        |g AS (SELECT lang, n, sum_v,
        |       2 * rw - (CAST(n AS HUGEINT) + 1) * sum_v AS num,
        |       CAST(n AS HUGEINT) * sum_v AS den FROM a)
        |SELECT lang, n, sum_v,
        | CAST(num AS BIGINT) AS gini_num, CAST(den AS BIGINT) AS gini_den,
        | CASE WHEN den != 0 THEN CAST(num AS DOUBLE) / CAST(den AS DOUBLE) END AS gini
        |FROM g ORDER BY lang""".stripMargin,
    "q147_embedding_audit" ->
      """WITH b AS (
        | SELECT CAST(label AS BIGINT) AS label,
        |  len(embedding) != 64 AS bad,
        |  len(list_filter(embedding, x -> isnan(x) OR NOT isfinite(x))) > 0 AS nf,
        |  list_sum(list_transform(embedding, x ->
        |   CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT) *
        |   CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))) AS sq
        | FROM embeddings),
        |c AS (SELECT label, bad, nf,
        |       CASE WHEN NOT bad AND NOT nf THEN sq END AS csq FROM b)
        |SELECT label, count(*) AS n_vecs,
        | CAST(sum(CASE WHEN bad THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_dim,
        | CAST(sum(CASE WHEN nf THEN 1 ELSE 0 END) AS BIGINT) AS n_nonfinite,
        | CAST(sum(CASE WHEN csq < 100000 THEN 1 ELSE 0 END) AS BIGINT) AS n_near_zero,
        | CAST(min(csq) AS BIGINT) AS min_sq_norm,
        | CAST(max(csq) AS BIGINT) AS max_sq_norm
        |FROM c GROUP BY 1 ORDER BY label""".stripMargin,
    "q148_lang_confusion" -> q148Sql,
    "q149_autocorrelation" ->
      """WITH d AS (SELECT event_type AS et, epoch_ms(ts) // 86400000 AS day,
        |        CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS vm
        |       FROM events GROUP BY 1, 2),
        |l AS (SELECT k AS lag FROM (VALUES (1), (7)) t(k)),
        |p AS (SELECT a.et, l.lag, a.vm AS x, b.vm AS y
        |      FROM d a JOIN l ON true
        |      JOIN d b ON a.et = b.et AND b.day = a.day + l.lag),
        |s AS (SELECT et, lag, count(*) AS n,
        |       CAST(sum(x) AS BIGINT) sx, CAST(sum(y) AS BIGINT) sy,
        |       CAST(sum(x * x) AS BIGINT) sxx, CAST(sum(y * y) AS BIGINT) syy,
        |       CAST(sum(x * y) AS BIGINT) sxy
        |      FROM p GROUP BY 1, 2)
        |SELECT et AS event_type, CAST(lag AS BIGINT) AS lag, n,
        | CASE WHEN sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
        |       sqrt(CAST(n * syy - sy * sy AS DOUBLE)) = 0 THEN NULL
        |  ELSE round(CAST(n * sxy - sx * sy AS DOUBLE) /
        |   (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
        |    sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) END AS r
        |FROM s ORDER BY event_type, lag""".stripMargin,
    "q150_cohort_value" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) // 86400000 AS day,
        |        CAST(floor(value * 100) AS BIGINT) AS vc FROM events),
        |c AS (SELECT user_id, min(day) AS cd FROM e GROUP BY 1),
        |j AS (SELECT e.user_id, c.cd, e.day - c.cd AS age, e.vc
        |      FROM e JOIN c USING (user_id)),
        |g AS (SELECT cd, age, count(DISTINCT user_id) AS n_active,
        |       CAST(sum(vc) AS BIGINT) AS value_units FROM j GROUP BY 1, 2)
        |SELECT CAST(cd AS BIGINT) AS cohort_day, CAST(age AS BIGINT) AS age,
        | n_active, value_units,
        | CAST(sum(value_units) OVER (PARTITION BY cd ORDER BY age
        |   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_value
        |FROM g ORDER BY cohort_day, age""".stripMargin,
    "q151_revenue_concentration" ->
      """WITH rev AS (SELECT c.c_nationkey AS nationkey, o.o_custkey AS custkey,
        |        CAST(floor(o.o_totalprice * 100) AS BIGINT) AS cents
        |       FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |h AS (SELECT nationkey, custkey, CAST(sum(cents) AS BIGINT) AS v
        |      FROM rev GROUP BY 1, 2),
        |t AS (SELECT nationkey, CAST(sum(v) AS BIGINT) AS tot,
        |       count(*) AS n_holders FROM h GROUP BY 1),
        |s AS (SELECT h.nationkey, h.v, t.tot, t.n_holders,
        |       (h.v * 1000000) // t.tot AS ppm,
        |       row_number() OVER (PARTITION BY h.nationkey
        |         ORDER BY h.v DESC, h.custkey) AS rk
        |      FROM h JOIN t ON h.nationkey = t.nationkey WHERE t.tot > 0)
        |SELECT nationkey, n_holders, tot AS total,
        | CAST(sum(ppm * ppm) AS BIGINT) AS hhi_ppm2,
        | CAST(sum(CASE WHEN rk <= 4 THEN ppm ELSE 0 END) AS BIGINT) AS crk_ppm
        |FROM s GROUP BY 1, 2, 3 ORDER BY nationkey""".stripMargin,
    "q152_share_of_parent" ->
      """WITH rev AS (SELECT r.r_name, n.n_name,
        |        CAST(floor(o.o_totalprice * 100) AS BIGINT) AS cents
        |       FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |       JOIN nation n ON c.c_nationkey = n.n_nationkey
        |       JOIN region r ON n.n_regionkey = r.r_regionkey),
        |g AS (SELECT r_name, n_name, CAST(sum(cents) AS BIGINT) AS cents
        |      FROM rev GROUP BY 1, 2),
        |w AS (SELECT *,
        |       CAST(sum(cents) OVER (PARTITION BY r_name) AS BIGINT) AS region_cents,
        |       CAST(sum(cents) OVER () AS BIGINT) AS total_cents FROM g)
        |SELECT r_name, n_name, cents, region_cents, total_cents,
        | CAST((cents * 1000000) // region_cents AS BIGINT) AS nation_share_ppm,
        | CAST((region_cents * 1000000) // total_cents AS BIGINT) AS region_share_ppm
        |FROM w ORDER BY r_name, n_name""".stripMargin,
    "q153_new_vs_returning" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) // 86400000 AS day FROM events),
        |f AS (SELECT user_id, min(day) AS fd FROM e GROUP BY 1),
        |j AS (SELECT e.user_id, e.day, f.fd FROM e JOIN f USING (user_id))
        |SELECT CAST(day AS BIGINT) AS day,
        | count(DISTINCT user_id) AS n_users,
        | count(DISTINCT CASE WHEN day = fd THEN user_id END) AS n_new,
        | count(DISTINCT user_id) -
        |  count(DISTINCT CASE WHEN day = fd THEN user_id END) AS n_returning
        |FROM j GROUP BY day ORDER BY day""".stripMargin,
    "q154_recency_churn" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) // 86400000 AS day FROM events),
        |l AS (SELECT user_id, max(day) AS ld FROM e GROUP BY 1),
        |r AS (SELECT user_id, (SELECT max(day) FROM e) - ld AS rec FROM l),
        |b AS (SELECT rec,
        |       CASE WHEN rec < 7 THEN 0 WHEN rec < 14 THEN 1
        |            WHEN rec < 30 THEN 2 ELSE 3 END AS bucket_id,
        |       CASE WHEN rec < 7 THEN 'active' WHEN rec < 14 THEN 'cooling'
        |            WHEN rec < 30 THEN 'at_risk' ELSE 'churned' END AS bucket
        |      FROM r)
        |SELECT CAST(bucket_id AS BIGINT) AS bucket_id, bucket,
        | count(*) AS n_users, CAST(min(rec) AS BIGINT) AS min_recency,
        | CAST(max(rec) AS BIGINT) AS max_recency
        |FROM b GROUP BY 1, 2 ORDER BY bucket_id""".stripMargin,
    "q155_sla_attainment" ->
      """WITH j AS (SELECT o.o_orderpriority AS priority,
        |        date_diff('day', o.o_orderdate, l.l_shipdate) AS d
        |       FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
        |SELECT priority, count(*) AS n_lines,
        | CAST(sum(CASE WHEN d <= 7 THEN 1 ELSE 0 END) AS BIGINT) AS n_within_7d,
        | CAST(max(d) AS BIGINT) AS max_delay_days,
        | CAST((sum(CASE WHEN d <= 7 THEN 1 ELSE 0 END) * 1000000) // count(*) AS BIGINT) AS attain_ppm
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    "q156_pareto_k" ->
      """WITH rev AS (SELECT c.c_nationkey AS nationkey, o.o_custkey AS custkey,
        |        CAST(floor(o.o_totalprice * 100) AS BIGINT) AS cents
        |       FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |h AS (SELECT nationkey, custkey, CAST(sum(cents) AS BIGINT) AS v
        |      FROM rev GROUP BY 1, 2),
        |t AS (SELECT nationkey, CAST(sum(v) AS BIGINT) AS tot,
        |       count(*) AS n_holders FROM h GROUP BY 1),
        |s AS (SELECT h.nationkey, t.tot, t.n_holders,
        |       CAST(row_number() OVER (PARTITION BY h.nationkey
        |         ORDER BY h.v DESC, h.custkey) AS BIGINT) AS rk,
        |       CAST(sum(h.v) OVER (PARTITION BY h.nationkey
        |         ORDER BY h.v DESC, h.custkey ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run
        |      FROM h JOIN t USING (nationkey) WHERE t.tot > 0)
        |SELECT nationkey, n_holders, tot AS total,
        | CAST(min(rk) AS BIGINT) AS pareto_k
        |FROM s WHERE 10 * run >= 8 * tot GROUP BY 1, 2, 3
        |ORDER BY nationkey""".stripMargin,
    "q157_ngram_novelty" ->
      """WITH toks AS (SELECT doc_id // 50 AS batch,
        |        string_split_regex(trim(text), '\s+') tk FROM documents),
        |sh AS (SELECT batch,
        |  list_distinct([array_to_string(list_slice(tk, i, i + 2), ' ')
        |                 FOR i IN range(1, greatest(len(tk) - 1, 2))]) sh
        | FROM toks),
        |e AS (SELECT DISTINCT batch, unnest(sh) AS g FROM sh),
        |f AS (SELECT g, min(batch) AS fb FROM e GROUP BY 1)
        |SELECT CAST(e.batch AS BIGINT) AS batch, count(*) AS n_grams,
        | CAST(sum(CASE WHEN e.batch = f.fb THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
        | CAST((sum(CASE WHEN e.batch = f.fb THEN 1 ELSE 0 END) * 1000000)
        |   // count(*) AS BIGINT) AS novelty_ppm
        |FROM e JOIN f USING (g) GROUP BY 1 ORDER BY 1""".stripMargin,
    "q158_key_health" ->
      """WITH
        |a1 AS (SELECT 'customer' AS table_name, 'c_custkey' AS key_name,
        |        (SELECT count(*) FROM customer) AS n_rows,
        |        (SELECT count(*) FROM customer WHERE c_custkey IS NULL) AS n_null,
        |        count(*) AS n_distinct, coalesce(max(n), 0) AS max_mult,
        |        coalesce(sum(n - 1), 0) AS n_extra
        |       FROM (SELECT c_custkey k, count(*) n FROM customer
        |             WHERE c_custkey IS NOT NULL GROUP BY 1)),
        |a2 AS (SELECT 'orders', 'o_custkey', (SELECT count(*) FROM orders),
        |        (SELECT count(*) FROM orders WHERE o_custkey IS NULL),
        |        count(*), coalesce(max(n), 0), coalesce(sum(n - 1), 0)
        |       FROM (SELECT o_custkey k, count(*) n FROM orders
        |             WHERE o_custkey IS NOT NULL GROUP BY 1)),
        |a3 AS (SELECT 'lineitem', 'l_orderkey', (SELECT count(*) FROM lineitem),
        |        (SELECT count(*) FROM lineitem WHERE l_orderkey IS NULL),
        |        count(*), coalesce(max(n), 0), coalesce(sum(n - 1), 0)
        |       FROM (SELECT l_orderkey k, count(*) n FROM lineitem
        |             WHERE l_orderkey IS NOT NULL GROUP BY 1)),
        |a4 AS (SELECT 'lineitem', 'l_partkey', (SELECT count(*) FROM lineitem),
        |        (SELECT count(*) FROM lineitem WHERE l_partkey IS NULL),
        |        count(*), coalesce(max(n), 0), coalesce(sum(n - 1), 0)
        |       FROM (SELECT l_partkey k, count(*) n FROM lineitem
        |             WHERE l_partkey IS NOT NULL GROUP BY 1)),
        |a5 AS (SELECT 'events', 'user_id', (SELECT count(*) FROM events),
        |        (SELECT count(*) FROM events WHERE user_id IS NULL),
        |        count(*), coalesce(max(n), 0), coalesce(sum(n - 1), 0)
        |       FROM (SELECT user_id k, count(*) n FROM events
        |             WHERE user_id IS NOT NULL GROUP BY 1)),
        |u AS (SELECT * FROM a1 UNION ALL SELECT * FROM a2 UNION ALL
        |      SELECT * FROM a3 UNION ALL SELECT * FROM a4 UNION ALL
        |      SELECT * FROM a5)
        |SELECT table_name, key_name, n_rows, CAST(n_null AS BIGINT) AS n_null,
        | n_distinct, CAST(max_mult AS BIGINT) AS max_mult,
        | CAST(CASE WHEN n_rows - n_null > 0
        |   THEN (n_extra * 1000000) // (n_rows - n_null) ELSE 0 END AS BIGINT) AS dup_ppm
        |FROM u ORDER BY table_name, key_name""".stripMargin,
    "q159_join_fanout" ->
      """WITH c AS (SELECT user_id AS key, count(*) AS n FROM events
        |           WHERE user_id IS NOT NULL GROUP BY 1)
        |SELECT key, n AS n_left, n AS n_right, CAST(n * n AS BIGINT) AS fanout
        |FROM c ORDER BY fanout DESC, key LIMIT 20""".stripMargin,
    "q160_event_dedup_window" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ms, event_id
        |           FROM events),
        |l AS (SELECT event_type, ms - lag(ms) OVER (PARTITION BY user_id,
        |        event_type ORDER BY ms, event_id) AS gap FROM e)
        |SELECT event_type, count(*) AS n_events,
        | CAST(sum(CASE WHEN gap IS NOT NULL AND gap <= 3600000
        |   THEN 1 ELSE 0 END) AS BIGINT) AS n_dups,
        | CAST((sum(CASE WHEN gap IS NOT NULL AND gap <= 3600000
        |   THEN 1 ELSE 0 END) * 1000000) // count(*) AS BIGINT) AS dup_ppm
        |FROM l GROUP BY 1 ORDER BY 1""".stripMargin,
    "q161_search_after" ->
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_ms(ts) AS ms
        |           FROM events),
        |r AS (SELECT *, row_number() OVER (ORDER BY ms DESC, event_id DESC) rn
        |      FROM e),
        |cur AS (SELECT ms AS cms, event_id AS cid FROM r WHERE rn = 100)
        |SELECT e.event_id, e.user_id, e.event_type, e.ms
        |FROM e, cur WHERE e.ms < cur.cms OR (e.ms = cur.cms AND e.event_id < cur.cid)
        |ORDER BY e.ms DESC, e.event_id DESC LIMIT 50""".stripMargin,
    "q162_rolling_p95" ->
      """WITH e AS (SELECT epoch_ms(ts) // 86400000 AS day,
        |        CAST(floor(value * 100) AS BIGINT) AS cents, event_id FROM events),
        |d AS (SELECT DISTINCT day AS d FROM e),
        |j AS (SELECT d.d, e.cents, e.event_id FROM e
        |      JOIN d ON e.day BETWEEN d.d - 6 AND d.d),
        |r AS (SELECT d, cents,
        |       row_number() OVER (PARTITION BY d ORDER BY cents, event_id) AS rn,
        |       count(*) OVER (PARTITION BY d) AS n FROM j)
        |SELECT CAST(d AS BIGINT) AS day, n AS n_events, cents AS p95_cents
        |FROM r WHERE rn = (95 * (n - 1)) // 100 + 1 ORDER BY day""".stripMargin,
    "q163_time_to_convert" ->
      """WITH s AS (SELECT user_id, min(epoch_ms(ts)) AS ms FROM events
        |           WHERE event_type = 'signup' GROUP BY 1),
        |p AS (SELECT e.user_id, min(epoch_ms(e.ts)) AS pms FROM events e
        |      JOIN s ON e.user_id = s.user_id
        |      WHERE e.event_type = 'purchase' AND epoch_ms(e.ts) >= s.ms
        |      GROUP BY 1)
        |SELECT CAST((p.pms - s.ms) // 86400000 AS BIGINT) AS days_to_convert,
        | count(*) AS n_users
        |FROM s JOIN p USING (user_id) GROUP BY 1 ORDER BY 1""".stripMargin,
    "q164_source_overlap" ->
      """WITH toks AS (SELECT source, string_split_regex(trim(text), '\s+') tk
        |              FROM documents),
        |sh AS (SELECT source,
        |  list_distinct([array_to_string(list_slice(tk, i, i + 2), ' ')
        |                 FOR i IN range(1, greatest(len(tk) - 1, 2))]) sh
        | FROM toks),
        |e AS (SELECT DISTINCT source, unnest(sh) AS g FROM sh),
        |na AS (SELECT source, count(*) AS n FROM e GROUP BY 1),
        |p AS (SELECT a.source AS source_a, b.source AS source_b,
        |       count(*) AS n_shared
        |      FROM e a JOIN e b ON a.g = b.g AND a.source < b.source
        |      GROUP BY 1, 2)
        |SELECT p.source_a, p.source_b, p.n_shared, x.n AS n_a, y.n AS n_b,
        | CAST((p.n_shared * 1000000) // (x.n + y.n - p.n_shared) AS BIGINT)
        |   AS jaccard_ppm
        |FROM p JOIN na x ON p.source_a = x.source
        |JOIN na y ON p.source_b = y.source
        |ORDER BY source_a, source_b""".stripMargin,
    "q142_khop_reach" ->
      """WITH e0 AS MATERIALIZED (
        | SELECT DISTINCT x.l_partkey AS src, y.l_partkey AS dst
        | FROM lineitem x JOIN lineitem y
        |  ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
        |adj AS MATERIALIZED (
        | SELECT src AS u, dst AS v FROM e0 UNION SELECT dst, src FROM e0),
        |h0 AS (SELECT p_partkey AS node FROM part WHERE p_partkey <= 5),
        |h1 AS MATERIALIZED (
        | SELECT DISTINCT v AS node FROM adj JOIN h0 ON adj.u = h0.node
        | WHERE v NOT IN (SELECT node FROM h0)),
        |h2 AS (
        | SELECT DISTINCT v AS node FROM adj JOIN h1 ON adj.u = h1.node
        | WHERE v NOT IN (SELECT node FROM h0) AND v NOT IN (SELECT node FROM h1))
        |SELECT node, CAST(0 AS BIGINT) AS hop FROM h0
        |UNION ALL SELECT node, CAST(1 AS BIGINT) FROM h1
        |UNION ALL SELECT node, CAST(2 AS BIGINT) FROM h2
        |ORDER BY node""".stripMargin,
    "q125_change_point" ->
      """WITH d AS (
        | SELECT event_type typ, epoch_ms(ts) // 86400000 AS day,
        |  CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) s
        | FROM events GROUP BY 1, 2),
        |r AS (
        | SELECT typ, day, s,
        |  row_number() OVER (PARTITION BY typ ORDER BY s, day) rn,
        |  count(*) OVER (PARTITION BY typ) n
        | FROM d),
        |med AS (SELECT typ, s med FROM r WHERE rn = (n - 1) // 2 + 1),
        |c AS (
        | SELECT d.typ, d.day, med.med,
        |  sum(d.s - med.med) OVER (PARTITION BY d.typ ORDER BY d.day
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) cusum
        | FROM d JOIN med USING (typ)),
        |p AS (
        | SELECT typ, med, day, cusum,
        |  row_number() OVER (PARTITION BY typ ORDER BY abs(cusum) DESC, day) rn
        | FROM c),
        |cnt AS (SELECT typ, count(*) n_buckets FROM d GROUP BY 1)
        |SELECT p.typ, p.med, p.day AS cp_bucket,
        | CAST(p.cusum AS BIGINT) AS cp_cusum, cnt.n_buckets
        |FROM p JOIN cnt USING (typ) WHERE p.rn = 1 ORDER BY p.typ""".stripMargin,
    "q126_contribution" ->
      """WITH e AS (
        | SELECT event_type seg, CAST(floor(value * 1000) AS BIGINT) vm,
        |  epoch_ms(ts) ms FROM events),
        |m AS (SELECT (min(ms) + max(ms)) // 2 AS mid FROM e),
        |a AS (
        | SELECT seg,
        |  CAST(sum(CASE WHEN ms < (SELECT mid FROM m) THEN vm ELSE 0 END) AS BIGINT) sum_a,
        |  CAST(sum(CASE WHEN ms >= (SELECT mid FROM m) THEN vm ELSE 0 END) AS BIGINT) sum_b
        | FROM e GROUP BY seg),
        |t AS (SELECT CAST(sum(sum_b - sum_a) AS BIGINT) tot FROM a)
        |SELECT seg, sum_a, sum_b, sum_b - sum_a AS delta,
        | CAST(CASE WHEN tot = 0 THEN NULL
        |  ELSE (CASE WHEN ((sum_b - sum_a) >= 0) = (tot >= 0)
        |        THEN 1 ELSE -1 END) *
        |       (abs(sum_b - sum_a) * 1000000 // abs(tot)) END AS BIGINT) AS share_ppm
        |FROM a, t ORDER BY seg""".stripMargin,
    "q123_rolling_active_users" ->
      """WITH a AS (
        | SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day FROM events),
        |b AS (SELECT min(day) lo, max(day) hi FROM a),
        |cal AS (
        | SELECT unnest(generate_series((SELECT lo FROM b), (SELECT hi FROM b))) AS day)
        |SELECT c.day, count(DISTINCT a.user_id) AS n_distinct
        |FROM cal c JOIN a ON a.day <= c.day AND a.day > c.day - 7
        |GROUP BY c.day ORDER BY c.day""".stripMargin,
    "q124_weighted_median" ->
      """WITH l AS (
        | SELECT l_returnflag rf, CAST(floor(l_extendedprice) AS BIGINT) v,
        |  CAST(l_quantity AS BIGINT) w,
        |  l_orderkey * 10 + l_linenumber AS tie
        | FROM lineitem),
        |r AS (
        | SELECT rf, v, w, tie,
        |  sum(w) OVER (PARTITION BY rf ORDER BY v, tie
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) cumw,
        |  sum(w) OVER (PARTITION BY rf) totw
        | FROM l)
        |SELECT rf, min(v) AS w_median, CAST(max(totw) AS BIGINT) AS tot_w
        |FROM r WHERE 2 * cumw >= totw
        |GROUP BY rf ORDER BY rf""".stripMargin,
    "q122_clustering_coefficient" ->
      """WITH p AS (
        | SELECT x.l_partkey a, y.l_partkey b
        | FROM lineitem x JOIN lineitem y ON x.l_orderkey = y.l_orderkey
        | WHERE x.l_partkey < y.l_partkey),
        |e AS (SELECT DISTINCT a, b FROM p),
        |deg AS (
        | SELECT n AS node, count(*) AS deg
        | FROM (SELECT a n FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
        |t AS (
        | SELECT e1.a x, e1.b y, e2.b z
        | FROM e e1 JOIN e e2 ON e2.a = e1.b
        |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        |corners AS (
        | SELECT x AS node FROM t UNION ALL SELECT y FROM t UNION ALL SELECT z FROM t),
        |tc AS (SELECT node, count(*) n_tri FROM corners GROUP BY 1)
        |SELECT deg.node, deg.deg, CAST(coalesce(tc.n_tri, 0) AS BIGINT) AS n_tri,
        | CAST(2 * coalesce(tc.n_tri, 0) AS BIGINT) AS coef_num,
        | CAST(deg.deg * (deg.deg - 1) AS BIGINT) AS coef_den
        |FROM deg LEFT JOIN tc USING (node) ORDER BY node""".stripMargin,
    "q121_inter_arrival" ->
      """WITH e AS (
        | SELECT user_id, epoch_ms(ts) ms, event_type typ, event_id FROM events),
        |d AS (
        | SELECT typ, event_id,
        |  ms - lag(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS delta
        | FROM e),
        |dd AS (SELECT * FROM d WHERE delta IS NOT NULL),
        |r AS (
        | SELECT typ, delta,
        |  row_number() OVER (PARTITION BY typ ORDER BY delta, event_id) rn,
        |  count(*) OVER (PARTITION BY typ) n
        | FROM dd),
        |med AS (SELECT typ, delta med_ms FROM r WHERE rn = (n - 1) // 2 + 1)
        |SELECT typ, count(*) AS n_deltas, min(delta) AS min_ms,
        | max(delta) AS max_ms, min(med_ms) AS med_ms
        |FROM dd JOIN med USING (typ)
        |GROUP BY typ ORDER BY typ""".stripMargin,
    "q120_rolling_metrics" ->
      """WITH d AS (
        | SELECT event_type typ, epoch_ms(ts) // 86400000 AS day,
        |  CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) sum_vm
        | FROM events GROUP BY 1, 2)
        |SELECT typ, day, sum_vm,
        | CAST(sum(sum_vm) OVER w AS BIGINT) AS mov_sum,
        | CAST(count(*) OVER w AS BIGINT) AS mov_n,
        | CAST(sum(sum_vm) OVER w AS BIGINT) // CAST(count(*) OVER w AS BIGINT) AS mov_avg
        |FROM d
        |WINDOW w AS (PARTITION BY typ ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY typ, day""".stripMargin,
    "q119_activity_islands" ->
      """WITH d AS (
        | SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day FROM events),
        |r AS (
        | SELECT user_id, day,
        |  day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
        | FROM d)
        |SELECT user_id, min(day) AS island_start, max(day) AS island_end,
        | count(*) AS island_len
        |FROM r GROUP BY user_id, grp
        |ORDER BY user_id, island_start""".stripMargin,
    "q118_record_linkage" ->
      """WITH c AS (
        | SELECT c_custkey, CAST(c_nationkey AS BIGINT) nat, c_mktsegment seg,
        |  CAST(floor(c_acctbal / 500.0) AS BIGINT) bal_b,
        |  substr(c_name, length(c_name) - 1, 2) suffix
        | FROM customer),
        |p AS (
        | SELECT a.c_custkey id_a, b.c_custkey id_b,
        |  CASE WHEN a.seg = b.seg THEN 1 ELSE 0 END ag_seg,
        |  CASE WHEN a.bal_b = b.bal_b THEN 1 ELSE 0 END ag_bal,
        |  CASE WHEN a.suffix = b.suffix THEN 1 ELSE 0 END ag_suf
        | FROM c a JOIN c b ON a.nat = b.nat AND a.c_custkey < b.c_custkey)
        |SELECT id_a, id_b, CAST(ag_seg AS BIGINT) AS agree_seg,
        | CAST(ag_bal AS BIGINT) AS agree_bal_b, CAST(ag_suf AS BIGINT) AS agree_suffix,
        | CAST(30 * ag_seg + 40 * ag_bal + 30 * ag_suf AS BIGINT) AS score
        |FROM p WHERE 30 * ag_seg + 40 * ag_bal + 30 * ag_suf >= 70
        |ORDER BY id_a, id_b""".stripMargin,
    "q117_association_rules" ->
      """WITH i AS (SELECT DISTINCT l_orderkey tx, l_partkey item FROM lineitem),
        |isup AS (SELECT item, count(*) sup FROM i GROUP BY item HAVING count(*) >= 10),
        |f AS (SELECT i.tx, i.item FROM i JOIN isup ON i.item = isup.item),
        |p AS (
        | SELECT a.item item_a, b.item item_b, count(*) sup_ab
        | FROM f a JOIN f b ON a.tx = b.tx AND a.item < b.item
        | GROUP BY 1, 2 HAVING count(*) >= 3),
        |t AS (SELECT count(DISTINCT tx) n_tx FROM i)
        |SELECT item_a, item_b, sup_ab, sa.sup AS sup_a, sb.sup AS sup_b, n_tx,
        | 100 * sup_ab // sa.sup AS conf_pct,
        | CAST(CASE WHEN sup_ab * n_tx > sa.sup * sb.sup THEN 1 ELSE 0 END AS BIGINT) AS lift_pos
        |FROM p JOIN isup sa ON p.item_a = sa.item
        | JOIN isup sb ON p.item_b = sb.item, t
        |ORDER BY item_a, item_b""".stripMargin,
    "q116_frequency_drift" ->
      """WITH e AS (
        | SELECT CAST(floor(value * 1000) AS BIGINT) // 20000 AS bin,
        |  epoch_ms(ts) ms FROM events),
        |m AS (SELECT (min(ms) + max(ms)) // 2 AS mid FROM e),
        |ca AS (SELECT bin, count(*) n_a FROM e WHERE ms < (SELECT mid FROM m) GROUP BY bin),
        |cb AS (SELECT bin, count(*) n_b FROM e WHERE ms >= (SELECT mid FROM m) GROUP BY bin),
        |bins AS (
        | SELECT coalesce(ca.bin, cb.bin) bin, coalesce(n_a, 0) n_a, coalesce(n_b, 0) n_b
        | FROM ca FULL OUTER JOIN cb ON ca.bin = cb.bin),
        |t AS (SELECT sum(n_a) ta, sum(n_b) tb FROM bins)
        |SELECT bin, CAST(n_a AS BIGINT) n_a, CAST(n_b AS BIGINT) n_b,
        | CAST(n_a * 1000000 // ta AS BIGINT) ppm_a,
        | CAST(n_b * 1000000 // tb AS BIGINT) ppm_b,
        | CAST(n_a * 1000000 // ta - n_b * 1000000 // tb AS BIGINT) d_ppm,
        | CAST(CASE WHEN abs(n_a * 1000000 // ta - n_b * 1000000 // tb) > 5000
        |  THEN 1 ELSE 0 END AS BIGINT) drifted
        |FROM bins, t ORDER BY bin""".stripMargin,
    "q115_group_regression" ->
      """WITH l AS (
        | SELECT l_returnflag AS rf, l_linestatus AS ls,
        |  CAST(l_quantity AS BIGINT) x,
        |  CAST(floor(l_extendedprice) AS BIGINT) y FROM lineitem),
        |a AS (
        | SELECT rf, ls, count(*) AS n, CAST(sum(x) AS BIGINT) sx,
        |  CAST(sum(y) AS BIGINT) sy, CAST(sum(x * y) AS BIGINT) sxy,
        |  CAST(sum(x * x) AS BIGINT) sxx
        | FROM l GROUP BY rf, ls)
        |SELECT rf, ls, n, sx, sy, sxy, sxx,
        | n * sxy - sx * sy AS slope_num,
        | n * sxx - sx * sx AS slope_den,
        | CASE WHEN n * sxx - sx * sx = 0 THEN NULL
        |  ELSE (1000 * (n * sxy - sx * sy)) // (n * sxx - sx * sx) END AS slope_milli
        |FROM a ORDER BY rf, ls""".stripMargin,
    "q114_skyline" ->
      """WITH p AS (
        | SELECT p_partkey, CAST(floor(p_retailprice * 100) AS BIGINT) price_c,
        |  CAST(p_size AS BIGINT) sz FROM part)
        |SELECT p_partkey, price_c, sz FROM p a
        |WHERE NOT EXISTS (
        | SELECT 1 FROM p b
        | WHERE b.price_c <= a.price_c AND b.sz >= a.sz
        |  AND (b.price_c < a.price_c OR b.sz > a.sz))
        |ORDER BY price_c, sz, p_partkey""".stripMargin,
    "q113_gap_fill" ->
      """WITH e AS (
        | SELECT event_type typ, epoch_ms(ts) // 86400000 AS day,
        |  CAST(floor(value * 1000) AS BIGINT) vm FROM events),
        |d AS (SELECT typ, day, CAST(sum(vm) AS BIGINT) s FROM e GROUP BY typ, day),
        |b AS (SELECT min(day) lo, max(day) hi FROM d),
        |cal AS (
        | SELECT t.typ, g.day
        | FROM (SELECT DISTINCT typ FROM d) t
        | CROSS JOIN (SELECT unnest(generate_series((SELECT lo FROM b), (SELECT hi FROM b))) AS day) g),
        |j AS (SELECT c.typ, c.day, d.s FROM cal c LEFT JOIN d ON c.typ = d.typ AND c.day = d.day)
        |SELECT typ, day,
        | coalesce(last_value(s IGNORE NULLS) OVER (
        |   PARTITION BY typ ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1) AS sum_vm,
        | CAST(CASE WHEN s IS NULL THEN 0 ELSE 1 END AS BIGINT) AS observed
        |FROM j ORDER BY typ, day""".stripMargin,
    "q112_sorted_neighborhood" ->
      """WITH r AS (
        | SELECT doc_id, text,
        |  row_number() OVER (ORDER BY substr(text, 1, 32), doc_id) rn
        | FROM documents)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        | CAST(levenshtein(substr(a.text, 1, 80), substr(b.text, 1, 80)) AS BIGINT) AS dist
        |FROM r a JOIN r b ON b.rn - a.rn BETWEEN 1 AND 5
        |WHERE levenshtein(substr(a.text, 1, 80), substr(b.text, 1, 80)) <= 16
        |ORDER BY doc_a, doc_b""".stripMargin,
    "q111_incremental_view" ->
      """WITH e AS (
        | SELECT user_id, event_type typ, CAST(floor(value * 1000) AS BIGINT) vm,
        |  epoch_ms(ts) ms FROM events),
        |m AS (SELECT (min(ms) + max(ms)) // 2 AS mid FROM e),
        |s AS (
        | SELECT user_id, typ, vm,
        |  CASE WHEN ms >= (SELECT mid FROM m) AND typ = 'error' THEN -1 ELSE 1 END AS sign
        | FROM e)
        |SELECT user_id, typ, CAST(sum(sign) AS BIGINT) AS n,
        | CAST(sum(sign * vm) AS BIGINT) AS sum_vm
        |FROM s GROUP BY user_id, typ HAVING sum(sign) > 0
        |ORDER BY user_id, typ""".stripMargin,
    "q106_robust_scale" ->
      """WITH e AS (
        | SELECT event_type, event_id, CAST(floor(value * 1000) AS BIGINT) vm FROM events),
        |r AS (
        | SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY vm, event_id) rn,
        |  count(*) OVER (PARTITION BY event_type) n FROM e),
        |med AS (SELECT event_type, vm AS med FROM r WHERE rn = (n - 1) // 2 + 1),
        |d AS (
        | SELECT e.event_type, e.vm, e.event_id, med, abs(e.vm - med) AS dev
        | FROM e JOIN med USING (event_type)),
        |r2 AS (
        | SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY dev, vm, event_id) rn,
        |  count(*) OVER (PARTITION BY event_type) n FROM d),
        |mad AS (SELECT event_type, dev AS mad FROM r2 WHERE rn = (n - 1) // 2 + 1)
        |SELECT event_type, count(*) AS n, min(med) AS med, min(mad) AS mad,
        | CAST(sum(CASE WHEN dev > 5 * mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM d JOIN mad USING (event_type)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q107_triangles" ->
      """WITH p AS (
        | SELECT x.l_partkey a, y.l_partkey b
        | FROM lineitem x JOIN lineitem y ON x.l_orderkey = y.l_orderkey
        | WHERE x.l_partkey < y.l_partkey),
        |e AS (SELECT DISTINCT a, b FROM p),
        |v AS (SELECT a AS n FROM e UNION SELECT b FROM e)
        |SELECT (SELECT count(*) FROM v) AS n_nodes,
        | (SELECT count(*) FROM e) AS n_edges,
        | (SELECT count(*) FROM e e1
        |   JOIN e e2 ON e2.a = e1.b
        |   JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b) AS n_triangles""".stripMargin,
    "q108_k_anonymity" ->
      """WITH q AS (
        | SELECT CAST(c_nationkey AS BIGINT) nat, c_mktsegment seg,
        |  CAST(floor(c_acctbal / 1000.0) AS BIGINT) bal_k
        | FROM customer),
        |c AS (SELECT nat, seg, bal_k, count(*) cs FROM q GROUP BY 1, 2, 3)
        |SELECT CAST(sum(cs) AS BIGINT) AS n_rows, count(*) AS n_classes,
        | CAST(sum(CASE WHEN cs < 5 THEN 1 ELSE 0 END) AS BIGINT) AS classes_at_risk,
        | CAST(sum(CASE WHEN cs < 5 THEN cs ELSE 0 END) AS BIGINT) AS rows_at_risk,
        | min(cs) AS min_class, max(cs) AS max_class
        |FROM c""".stripMargin,
    "q109_grouping_sets" ->
      """WITH e AS (
        | SELECT event_type, epoch_ms(ts) // 86400000 AS day,
        |  CAST(floor(value * 1000) AS BIGINT) vm
        | FROM events)
        |SELECT coalesce(event_type, 'ALL') AS event_type,
        | coalesce(day, -1) AS day, count(*) AS n, CAST(sum(vm) AS BIGINT) AS sum_vm,
        | CAST(GROUPING(event_type, day) AS BIGINT) AS gid
        |FROM e GROUP BY GROUPING SETS ((event_type, day), (event_type), ())
        |ORDER BY gid, event_type, day""".stripMargin,
    "q110_entity_resolution" ->
      """WITH RECURSIVE s AS (
        | SELECT s_suppkey, s_name, CAST(floor(s_acctbal * 100) AS BIGINT) bal_c
        | FROM supplier),
        |p AS (
        | SELECT a.s_suppkey u, b.s_suppkey v
        | FROM s a JOIN s b ON a.s_suppkey < b.s_suppkey
        | WHERE levenshtein(a.s_name, b.s_name) <= 1),
        |ed AS (SELECT u a, v b FROM p UNION SELECT v, u FROM p),
        |reach AS (
        | SELECT a AS node, a AS lbl FROM ed
        | UNION
        | SELECT e.b, r.lbl FROM ed e JOIN reach r ON e.a = r.node),
        |cl AS (SELECT node, min(lbl) cl FROM reach GROUP BY 1),
        |m AS (
        | SELECT coalesce(cl.cl, s.s_suppkey) AS cluster, s.s_suppkey, s.s_name, s.bal_c
        | FROM s LEFT JOIN cl ON s.s_suppkey = cl.node),
        |best AS (
        | SELECT cluster, s_name FROM (
        |  SELECT m.*, row_number() OVER (PARTITION BY cluster ORDER BY bal_c DESC, s_suppkey) rn
        |  FROM m) WHERE rn = 1)
        |SELECT m.cluster AS "cluster", count(*) AS n_members,
        | min(best.s_name) AS best_name, max(m.bal_c) AS max_bal_c
        |FROM m JOIN best ON m.cluster = best.cluster
        |GROUP BY m.cluster ORDER BY m.cluster""".stripMargin,
    "q98_merge_cdc" ->
      """WITH e AS (
        | SELECT user_id, event_type AS typ, CAST(floor(value * 1000) AS BIGINT) vm,
        |  epoch_ms(ts) * 1000000 + event_id % 1000000 AS seq, epoch_ms(ts) ms
        | FROM events),
        |m AS (SELECT (min(ms) + max(ms)) // 2 AS mid FROM e),
        |snap AS (
        | SELECT user_id, typ, vm FROM (
        |  SELECT e.*, row_number() OVER (PARTITION BY user_id ORDER BY seq DESC) rn
        |  FROM e, m WHERE ms < mid) WHERE rn = 1),
        |ch AS (
        | SELECT e.*, CASE WHEN typ = 'error' THEN 'D'
        |   WHEN typ = 'signup' THEN 'I' ELSE 'U' END AS op
        | FROM e, m WHERE ms >= mid),
        |win AS (
        | SELECT user_id, op, typ, vm FROM (
        |  SELECT ch.*, row_number() OVER (PARTITION BY user_id ORDER BY seq DESC, op DESC) rn
        |  FROM ch) WHERE rn = 1)
        |SELECT coalesce(s.user_id, c.user_id) AS user_id,
        | CASE WHEN c.user_id IS NOT NULL THEN c.typ ELSE s.typ END AS typ,
        | CASE WHEN c.user_id IS NOT NULL THEN c.vm ELSE s.vm END AS vm
        |FROM snap s FULL OUTER JOIN win c ON s.user_id = c.user_id
        |WHERE c.user_id IS NULL OR c.op <> 'D'
        |ORDER BY 1""".stripMargin,
    "q99_file_skip" ->
      """WITH e AS (
        | SELECT event_type, CAST(floor(value * 1000) AS BIGINT) vm FROM events)
        |SELECT event_type, count(*) AS n_rows, CAST(sum(vm) AS BIGINT) AS sum_vm
        |FROM e WHERE vm BETWEEN 50000 AND 150000
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q100_temperature_mix" ->
      """WITH c AS (SELECT lang, count(*) n FROM documents GROUP BY 1),
        |mn AS (SELECT min(n) nmin FROM c),
        |r AS (SELECT lang, pow(CAST(nmin AS DOUBLE) / n, 0.5) rate FROM c, mn),
        |k AS (
        | SELECT d.doc_id, d.lang FROM documents d JOIN r USING (lang)
        | WHERE CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR) || 'tm'), 1, 8)) AS BIGINT)
        |   / 4294967296.0 < rate)
        |SELECT lang, count(*) AS n_kept, CAST(sum(doc_id) AS BIGINT) AS sum_ids
        |FROM k GROUP BY 1 ORDER BY 1""".stripMargin,
    "q101_segment_dedup" ->
      """WITH toks AS (
        | SELECT doc_id, string_split_regex(trim(text), '\s+') tk FROM documents),
        |segs AS (
        | SELECT doc_id, i - 1 AS idx,
        |  array_to_string(list_slice(tk, (i - 1) * 12 + 1, (i - 1) * 12 + 12), ' ') seg
        | FROM toks, unnest(range(1, CAST(ceil(len(tk) / 12.0) AS BIGINT) + 1)) t(i)),
        |rk AS (
        | SELECT *, row_number() OVER (PARTITION BY seg ORDER BY doc_id, idx) rn FROM segs)
        |SELECT doc_id, count(*) AS n_segs,
        | CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        | md5(coalesce(string_agg(CASE WHEN rn = 1 THEN seg END, ' ' ORDER BY idx), '')) AS fp
        |FROM rk GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q102_fuzzy_join" ->
      """SELECT a.s_suppkey AS id_a, b.s_suppkey AS id_b,
        | a.s_name AS str_a, b.s_name AS str_b,
        | levenshtein(a.s_name, b.s_name) AS dist
        |FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey
        |WHERE levenshtein(a.s_name, b.s_name) <= 1
        |ORDER BY 1, 2""".stripMargin,
    "q103_star_join" ->
      """SELECT r_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        | CAST(floor(sum(l_extendedprice * (1 - l_discount) * 100)) AS BIGINT) AS revenue_cents,
        | CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q104_winsorize" ->
      """WITH e AS (
        | SELECT event_type, event_id, CAST(floor(value * 1000) AS BIGINT) vm FROM events),
        |r AS (
        | SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY vm, event_id) rn,
        |  count(*) OVER (PARTITION BY event_type) n FROM e),
        |b AS (
        | SELECT event_type, min(vm) lo, max(vm) hi FROM r
        | WHERE rn = CAST(floor(0.05 * (n - 1)) AS BIGINT) + 1
        |    OR rn = CAST(floor(0.95 * (n - 1)) AS BIGINT) + 1
        | GROUP BY 1),
        |c AS (
        | SELECT e.event_type, greatest(least(vm, hi), lo) cl
        | FROM e JOIN b USING (event_type))
        |SELECT event_type, count(*) AS n_rows, min(cl) AS lo_v, max(cl) AS hi_v,
        | CAST(sum(cl) AS BIGINT) AS sum_clamped
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    "q105_expectations" ->
      """WITH e AS (
        | SELECT
        |  CASE WHEN value IS NOT NULL AND value >= 0 AND value <= 250.0 THEN 0 ELSE 1 END f1,
        |  CASE WHEN event_type IN ('view','click','purchase','signup','error') THEN 0 ELSE 1 END f2,
        |  CASE WHEN user_id IS NOT NULL AND user_id >= 0 THEN 0 ELSE 1 END f3,
        |  CASE WHEN coalesce(regexp_extract(props, '"k": (\d+)', 1), '') <> ''
        |    AND CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) BETWEEN 0 AND 49
        |   THEN 0 ELSE 1 END f4
        | FROM events),
        |t AS (
        | SELECT sum(f1) s1, sum(f2) s2, sum(f3) s3, sum(f4) s4, count(*) total,
        |  sum(CASE WHEN f1 + f2 + f3 + f4 = 0 THEN 1 ELSE 0 END) ok
        | FROM e)
        |SELECT rule, CAST(n_rows AS BIGINT) AS n_rows FROM (
        | SELECT 'value_in_range' AS rule, s1 AS n_rows FROM t UNION ALL
        | SELECT 'known_type', s2 FROM t UNION ALL
        | SELECT 'valid_user', s3 FROM t UNION ALL
        | SELECT 'props_k_low', s4 FROM t UNION ALL
        | SELECT '__total', total FROM t UNION ALL
        | SELECT '__ok', ok FROM t UNION ALL
        | SELECT '__quarantined', total - ok FROM t)
        |ORDER BY rule""".stripMargin,
    "q33_rolling_fingerprint" ->
      """WITH ch AS (SELECT doc_id, string_split(text, '') cs FROM documents)
        |SELECT doc_id,
        | list_min([list_reduce(list_prepend(0::BIGINT, list_transform(cs[i:i+15], x -> ascii(x))),
        |                       (a, c) -> (a * 31 + c) % 1000000007)
        |           FOR i IN range(1, greatest(len(cs) - 14, 2))]) AS rfp
        |FROM ch ORDER BY doc_id""".stripMargin,
    "q31_calendar_histogram" ->
      """SELECT strftime(date_trunc('quarter', o_orderdate), '%Y-%m') AS bucket,
        | count(*) AS n_orders
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q32_rollup" ->
      """SELECT coalesce(r_name, 'ALL') AS r_name, coalesce(n_name, 'ALL') AS n_name,
        | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue,
        | count(*) AS n_items
        |FROM lineitem
        | JOIN supplier ON l_suppkey = s_suppkey
        | JOIN nation ON s_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name) ORDER BY 1, 2""".stripMargin,
    "q29_knn_join" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v FROM embeddings),
        |q AS (SELECT vec_id qid, v qv FROM e WHERE vec_id < 5),
        |c AS (SELECT qid, vec_id,
        |  round(list_dot_product(v, qv) / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) cos
        | FROM e, q),
        |r AS (SELECT qid, vec_id, cos,
        |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) rk FROM c)
        |SELECT qid, vec_id, cos, rk FROM r WHERE rk <= 3 ORDER BY qid, rk""".stripMargin,
    "q30_frame_sample" ->
      """WITH m AS (SELECT doc_id AS media_id, text,
        |  greatest(octet_length(encode(text)) // 3, 1) AS step
        | FROM documents WHERE lang = 'en')
        |SELECT media_id, CAST(i AS BIGINT) AS frame_idx,
        | lower(hex(encode(substring(text, CAST(i * step + 1 AS BIGINT), 16)))) AS frame_hex
        |FROM m, range(0, 3) r(i) ORDER BY media_id, frame_idx""".stripMargin,
    "q28_json_serialize" ->
      """SELECT event_id,
        | to_json(struct_pack(event_id := event_id, user_id := user_id,
        |                     event_type := event_type))::VARCHAR AS payload
        |FROM events ORDER BY event_id LIMIT 1000""".stripMargin,
    "q25_stream_ingest" ->
      """SELECT event_type, count(*) AS n_events,
        | count(DISTINCT user_id) AS n_users, max(value) AS max_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q15_nested_topk" ->
      """WITH base AS (
        | SELECT r_name, n_name, s_name, s_acctbal FROM supplier
        | JOIN nation ON s_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey),
        |leaf AS (SELECT r_name, n_name, s_name, max(s_acctbal) m FROM base GROUP BY 1,2,3),
        |l1 AS (SELECT r_name, max(m) m1 FROM leaf GROUP BY 1),
        |r1 AS (SELECT r_name, m1, row_number() OVER (ORDER BY m1 DESC, r_name) rk1 FROM l1),
        |s1 AS (SELECT * FROM r1 WHERE rk1 <= 2),
        |l2 AS (SELECT r_name, n_name, max(m) m2 FROM leaf GROUP BY 1,2),
        |r2 AS (SELECT r_name, n_name, m2, row_number() OVER (PARTITION BY r_name ORDER BY m2 DESC, n_name) rk2 FROM l2),
        |s2 AS (SELECT r2.r_name, r2.n_name, r2.m2, r2.rk2, s1.m1, s1.rk1 FROM r2 JOIN s1 USING (r_name) WHERE rk2 <= 3),
        |l3 AS (SELECT r_name, n_name, s_name, max(m) m3 FROM leaf GROUP BY 1,2,3),
        |r3 AS (SELECT r_name, n_name, s_name, m3, row_number() OVER (PARTITION BY r_name, n_name ORDER BY m3 DESC, s_name) rk3 FROM l3)
        |SELECT s2.r_name, s2.n_name, r3.s_name, s2.m1, s2.m2, r3.m3, s2.rk1, s2.rk2, r3.rk3
        |FROM r3 JOIN s2 ON r3.r_name = s2.r_name AND r3.n_name = s2.n_name
        |WHERE rk3 <= 2 ORDER BY rk1, rk2, rk3""".stripMargin,
    "q16_auto_histogram" ->
      """WITH mm AS (SELECT (epoch_ms(max(ts)) - epoch_ms(min(ts))) // 1000 AS span FROM events),
        |need AS (SELECT greatest(1, span // 100) AS n FROM mm),
        |rung AS (SELECT coalesce(min(v), 604800) AS r
        |         FROM (VALUES (1),(5),(30),(60),(300),(1800),(3600),(10800),(43200),(86400),(604800)) t(v), need
        |         WHERE v >= n)
        |SELECT strftime(epoch_ms((epoch_ms(ts) // (r * 1000)) * (r * 1000)), '%Y-%m-%d %H:%M:%S') AS bucket_start,
        | count(*) AS n_events, count(DISTINCT user_id) AS n_users
        |FROM events, rung GROUP BY 1 ORDER BY 1""".stripMargin,
    "q17_exact_dedup" ->
      """SELECT lang, source, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q18_neardup_pairs" ->
      s"""WITH $shingleSql,
         |pairs AS (
         | SELECT a.doc_id id_a, b.doc_id id_b,
         |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |    / (len(a.sh) + len(b.sh) - CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)) jac
         | FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
         |SELECT id_a, id_b, round(jac, 6) AS jac
         |FROM pairs WHERE jac >= 0.8 ORDER BY 1, 2""".stripMargin,
    "q41_char_ngram_pairs" ->
      """WITH csh AS (SELECT doc_id,
        |  list_distinct([substring(text, i, 5)
        |                 FOR i IN range(1, greatest(length(text) - 3, 2))]) s
        | FROM documents),
        |pairs AS (
        | SELECT a.doc_id id_a, b.doc_id id_b,
        |  CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |    / (len(a.s) + len(b.s) - CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)) jac
        | FROM csh a JOIN csh b ON a.doc_id < b.doc_id)
        |SELECT id_a, id_b, round(jac, 6) AS jac
        |FROM pairs WHERE jac >= 0.8 ORDER BY 1, 2""".stripMargin,
    "q75_setsim_join" ->
      s"""WITH $shingleSql,
         |p AS (SELECT a.doc_id ida, b.doc_id idb,
         |       len(list_intersect(a.sh, b.sh)) shared, len(a.sh) na, len(b.sh) nb
         |      FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
         |SELECT ida AS id_a, idb AS id_b, CAST(shared AS BIGINT) shared,
         | CAST(na + nb - shared AS BIGINT) un
         |FROM p WHERE 10 * shared >= 8 * (na + nb - shared)
         |ORDER BY id_a, id_b""".stripMargin,
    "q19_simhash_pairs" ->
      s"""WITH $shingleSql,
         |tokh AS (SELECT doc_id, CAST(concat('0x', substring(md5(unnest(sh)), 1, 15)) AS BIGINT) hv FROM sh),
         |bits AS (SELECT doc_id, b, sum(CASE WHEN (hv >> b) & 1 = 1 THEN 1 ELSE -1 END) vote
         |         FROM tokh, range(0, 60) r(b) GROUP BY 1, 2),
         |sig AS (SELECT doc_id, sum(CASE WHEN vote > 0 THEN (1::BIGINT << b) ELSE 0::BIGINT END) s FROM bits GROUP BY 1)
         |SELECT a.doc_id id_a, b.doc_id id_b, CAST(bit_count(xor(a.s, b.s)) AS BIGINT) hamming
         |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.s, b.s)) <= 10 ORDER BY 1, 2""".stripMargin,
    "q20_text_stats" ->
      """SELECT doc_id,
        | CASE WHEN length(trim(text)) = 0 THEN 0
        |      ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
        | len(regexp_extract_all(text, '[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\s]')) AS n_subwords,
        | length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS n_alpha,
        | length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
        | length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')) AS n_punct,
        | md5(array_to_string(list_sort(list_distinct(string_split_regex(trim(text), '\s+'))), ' ')) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q21_lang_quality" -> q21Sql,
    "q38_deep_log_ingest" ->
      """WITH lv AS (
        | SELECT
        |  CASE event_type WHEN 'click' THEN 'INFO' WHEN 'view' THEN 'DEBUG'
        |       WHEN 'signup' THEN 'TRACE' WHEN 'purchase' THEN 'WARN'
        |       ELSE 'ERROR' END AS level_name,
        |  CASE WHEN event_type = 'error'
        |       THEN (CASE WHEN event_id % 3 = 0 THEN 2 ELSE 1 END)
        |       ELSE 0 END AS cause_depth,
        |  CASE WHEN event_type = 'error' THEN event_id % 500 ELSE NULL END AS err_line,
        |  CAST(user_id % 5 AS VARCHAR) || '.0' AS stage_id
        | FROM events)
        |SELECT level_name, CAST(cause_depth AS BIGINT) AS cause_depth,
        | count(*) AS n_logs, count(DISTINCT stage_id) AS n_stages,
        | max(err_line) AS max_line
        |FROM lv GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q44_pipeline_aggs" ->
      """WITH h AS (
        | SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |  count(*) AS n_events
        | FROM events GROUP BY 1)
        |SELECT day, n_events,
        | CAST(sum(n_events) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_events,
        | CAST(n_events - lag(n_events) OVER (ORDER BY day) AS BIGINT) AS delta,
        | round(avg(n_events) OVER (ORDER BY day ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS ma3
        |FROM h ORDER BY day""".stripMargin,
    "q39_stateful_stage_agg" -> stageAggOracleSql(windowed = false),
    "q45_tws_stage_agg" -> stageAggOracleSql(windowed = false),
    "q55_dedup_delivery" ->
      """SELECT event_type, count(*) AS n_events,
        | count(DISTINCT user_id) AS n_users, max(value) AS max_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q53_percentile_ranks" ->
      """SELECT l_returnflag,
        | round(sum(CASE WHEN l_quantity <= 10 THEN 1 ELSE 0 END) * 100.0 / count(*), 6) AS pr_10,
        | round(sum(CASE WHEN l_quantity <= 25 THEN 1 ELSE 0 END) * 100.0 / count(*), 6) AS pr_25,
        | round(sum(CASE WHEN l_quantity <= 40 THEN 1 ELSE 0 END) * 100.0 / count(*), 6) AS pr_40,
        | count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q54_stream_sessions" ->
      """WITH e AS (
        | SELECT user_id, epoch_ms(ts) AS ms FROM events),
        |x AS (
        | SELECT user_id, ms,
        |  CASE WHEN lag(ms) OVER (PARTITION BY user_id ORDER BY ms) IS NULL
        |    OR ms - lag(ms) OVER (PARTITION BY user_id ORDER BY ms) >= 21600000
        |   THEN 1 ELSE 0 END AS new_s
        | FROM e),
        |y AS (
        | SELECT user_id, ms,
        |  sum(new_s) OVER (PARTITION BY user_id ORDER BY ms ROWS UNBOUNDED PRECEDING) AS sid
        | FROM x)
        |SELECT user_id, count(*) AS n_events, min(ms) AS start_ms, max(ms) AS end_ms
        |FROM y GROUP BY user_id, sid ORDER BY user_id, start_ms""".stripMargin,
    "q52_quantize_int8" ->
      """WITH e AS (
        | SELECT vec_id, embedding AS v,
        |  CASE WHEN list_max([abs(CAST(x AS DOUBLE)) FOR x IN embedding]) = 0 THEN 1.0
        |   ELSE 127.0 / list_max([abs(CAST(x AS DOUBLE)) FOR x IN embedding]) END AS s
        | FROM embeddings),
        |q AS (
        | SELECT vec_id, v, s,
        |  [CAST(round(CAST(x AS DOUBLE) * s) AS BIGINT) FOR x IN v] AS c
        | FROM e)
        |SELECT vec_id, CAST(len(v) AS BIGINT) AS n_dims, round(s, 6) AS scale,
        | CAST(list_sum(c) AS BIGINT) AS sum_q,
        | CAST(list_sum([abs(x) FOR x IN c]) AS BIGINT) AS l1_q,
        | round(list_max([abs(CAST(v[i] AS DOUBLE) - c[i] / s)
        |   FOR i IN range(1, len(v) + 1)]) * s, 6) AS max_err_scaled
        |FROM q ORDER BY vec_id""".stripMargin,
    "q51_cube" ->
      """WITH t AS (
        | SELECT 'app-' || CAST(user_id % 3 AS VARCHAR) AS app_id,
        |  CAST(user_id % 4 AS VARCHAR) AS job_id,
        |  CAST(floor(value * 1000) AS BIGINT) AS in_b
        | FROM events)
        |SELECT coalesce(app_id, 'ALL') AS app_id, coalesce(job_id, 'ALL') AS job_id,
        | CAST(sum(in_b) AS BIGINT) AS sum_in, max(in_b) AS max_in, count(*) AS n_tasks,
        | CAST(GROUPING(app_id, job_id) AS BIGINT) AS gid
        |FROM t GROUP BY CUBE (app_id, job_id)
        |ORDER BY gid, app_id, job_id""".stripMargin,
    "q50_asof_enrich" ->
      """WITH p AS (
        | SELECT user_id, ts, round(max(value), 6) AS last_purchase
        | FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, epoch_ms(e.ts) AS ms, e.event_type, p.last_purchase
        |FROM events e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts >= p.ts
        |ORDER BY e.event_id""".stripMargin,
    "q56_range_join" ->
      """WITH iv AS (
        | SELECT event_id AS iv_id, epoch_ms(ts) AS s_ms, epoch_ms(ts) + 7200000 AS e_ms
        | FROM events WHERE event_type = 'purchase' AND user_id % 10 = 0),
        |j AS (
        | SELECT iv.iv_id, e.user_id, CAST(floor(e.value * 1000) AS BIGINT) AS val_m
        | FROM events e JOIN iv
        |   ON epoch_ms(e.ts) >= iv.s_ms AND epoch_ms(e.ts) < iv.e_ms)
        |SELECT iv_id, count(*) AS n_events,
        | CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        | CAST(sum(val_m) AS BIGINT) AS sum_val_m
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    "q60_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events),
        |t1 AS (SELECT user_id, min(ms) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1),
        |t2 AS (
        | SELECT t1.user_id, min(e.ms) AS t2
        | FROM t1 LEFT JOIN e ON e.user_id = t1.user_id AND e.event_type = 'click'
        |   AND e.ms > t1.t1 AND e.ms <= t1.t1 + 86400000
        | GROUP BY 1),
        |t3 AS (
        | SELECT t2.user_id, min(e.ms) AS t3
        | FROM t2 LEFT JOIN e ON e.user_id = t2.user_id AND e.event_type = 'purchase'
        |   AND e.ms > t2.t2 AND e.ms <= t2.t2 + 86400000
        | GROUP BY 1)
        |SELECT CAST(count(t1.t1) AS BIGINT) AS n_view,
        | CAST(count(t2.t2) AS BIGINT) AS n_click,
        | CAST(count(t3.t3) AS BIGINT) AS n_purchase
        |FROM t1 JOIN t2 USING (user_id) JOIN t3 USING (user_id)""".stripMargin,
    "q71_bloom_semijoin" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) n_items,
        | CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) sum_qty
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 150000)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q69_embedding_cohesion" ->
      """WITH ex AS (
        | SELECT label, i, CAST(floor(e::DOUBLE * 10000000) AS BIGINT) vm
        | FROM (SELECT label, unnest(embedding) e,
        |        generate_subscripts(embedding, 1) i FROM embeddings)),
        |cent AS (SELECT label, i, CAST(sum(vm) AS BIGINT) s FROM ex GROUP BY 1, 2),
        |clist AS (SELECT label, list_transform(list(s ORDER BY i), x -> x::DOUBLE) cs FROM cent GROUP BY 1),
        |n AS (SELECT label, count(*) n_vecs FROM embeddings GROUP BY 1),
        |rc AS (
        | SELECT e.label,
        |  list_dot_product(list_transform(e.embedding, x -> CAST(x AS DOUBLE)), c.cs) dot,
        |  sqrt(list_dot_product(list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
        |                        list_transform(e.embedding, x -> CAST(x AS DOUBLE)))) nv,
        |  sqrt(list_dot_product(c.cs, c.cs)) nc
        | FROM embeddings e JOIN clist c USING (label)),
        |cm AS (SELECT label,
        |  CAST(floor(CASE WHEN nv = 0 OR nc = 0 THEN 0.0 ELSE dot / (nv * nc) END * 1000000) AS BIGINT) cos_m
        | FROM rc)
        |SELECT cm.label, CAST(n.n_vecs AS BIGINT) n_vecs,
        | round(sum(cos_m)::DOUBLE / n.n_vecs / 1000000.0, 6) cohesion
        |FROM cm JOIN n USING (label) GROUP BY cm.label, n.n_vecs ORDER BY label""".stripMargin,
    "q68_stream_attribution" ->
      """WITH v AS (SELECT user_id, event_id view_id, epoch_ms(ts) v_ms
        |  FROM events WHERE event_type = 'view'),
        |b AS (SELECT user_id, event_id buy_id, epoch_ms(ts) b_ms
        |  FROM events WHERE event_type = 'purchase')
        |SELECT v.user_id, view_id, buy_id, v_ms, b_ms
        |FROM v JOIN b ON v.user_id = b.user_id
        |  AND b_ms > v_ms AND b_ms <= v_ms + 3600000
        |ORDER BY view_id, buy_id""".stripMargin,
    "q90_chunk_roundtrip" ->
      """SELECT doc_id,
        | greatest((length(text) + 63) // 64, 1) n_chunks,
        | length(text) len, md5(text) fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q89_interval_merge" ->
      """WITH sp AS (SELECT user_id, event_id, epoch_ms(ts) s_ms,
        |        epoch_ms(ts) + 1800000 e_ms FROM events),
        |o AS (SELECT *, max(e_ms) OVER (PARTITION BY user_id ORDER BY s_ms, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) pme FROM sp),
        |f AS (SELECT *, CASE WHEN pme IS NULL OR s_ms > pme THEN 1 ELSE 0 END op FROM o),
        |g AS (SELECT *, sum(op) OVER (PARTITION BY user_id ORDER BY s_ms, event_id
        |        ROWS UNBOUNDED PRECEDING) island FROM f),
        |i AS (SELECT user_id, island, min(s_ms) st, max(e_ms) en, count(*) nm
        |      FROM g GROUP BY 1, 2)
        |SELECT user_id, count(*) n_islands, CAST(sum(en - st) AS BIGINT) covered_ms,
        | CAST(max(en - st) AS BIGINT) longest_ms, CAST(sum(nm) AS BIGINT) n_spans
        |FROM i GROUP BY 1 ORDER BY user_id""".stripMargin,
    "q88_range_quantiles" ->
      """WITH e AS (SELECT epoch_ms(ts) // 86400000 AS day,
        |        CAST(floor(value * 1000) AS BIGINT) vm FROM events),
        |h AS (SELECT vm // 1000 bin, count(*) n FROM e
        |      WHERE day BETWEEN 19727 AND 19742 GROUP BY 1),
        |c AS (SELECT bin, sum(n) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) cum,
        |       (SELECT sum(n) FROM h) total FROM h)
        |SELECT p.p, CAST(min(bin) * 1000 + 500 AS BIGINT) est
        |FROM c, (SELECT unnest([50, 90, 99]) p) p
        |WHERE cum >= (p.p * total + 99) // 100
        |GROUP BY 1 ORDER BY p""".stripMargin,
    "q85_sliding_window" ->
      """WITH e AS (SELECT epoch_ms(ts) ms, event_type,
        |        CAST(floor(value * 1000) AS BIGINT) vm FROM events),
        |w AS (SELECT (ms // 900000) * 900000 - k.k * 900000 ws, event_type, vm
        |      FROM e, (SELECT unnest(range(0, 4)) k) k)
        |SELECT ws, event_type, count(*) n, CAST(sum(vm) AS BIGINT) sum_vm
        |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q86_trigrams" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) ms, event_type FROM events),
        |t AS (SELECT event_type s1,
        |        lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ms, event_id) s2,
        |        lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ms, event_id) s3
        |       FROM e)
        |SELECT s1, s2, s3, count(*) n FROM t WHERE s3 IS NOT NULL
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q87_class_cap" ->
      """WITH r AS (SELECT doc_id, lang,
        |        row_number() OVER (PARTITION BY lang
        |          ORDER BY md5(doc_id::VARCHAR), doc_id) rn
        |       FROM documents)
        |SELECT doc_id, lang FROM r WHERE rn <= 40 ORDER BY doc_id""".stripMargin,
    "q84_salted_join" ->
      """WITH d AS (SELECT user_id, min(epoch_ms(ts)) // 86400000 cohort_day
        |       FROM events GROUP BY 1),
        |e AS (SELECT user_id, event_type, CAST(floor(value * 1000) AS BIGINT) vm FROM events)
        |SELECT event_type, cohort_day, count(*) n, CAST(sum(vm) AS BIGINT) sum_vm
        |FROM e JOIN d USING (user_id) GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q83_golden_record" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) ms, event_type,
        |        CASE WHEN event_type <> 'error'
        |             THEN CAST(floor(value * 1000) AS BIGINT) END vm
        |       FROM events)
        |SELECT user_id,
        | (list(event_type ORDER BY ms DESC, event_id DESC))[1] last_event_type,
        | (list_filter(list(vm ORDER BY ms DESC, event_id DESC), x -> x IS NOT NULL))[1] last_vm,
        | min(ms) first_seen, max(ms) last_seen, count(*) n_rows
        |FROM e GROUP BY 1 ORDER BY user_id""".stripMargin,
    "q82_snapshot_diff" ->
      """WITH base AS (SELECT event_id, event_type,
        |        CAST(floor(value * 1000) AS BIGINT) vm FROM events),
        |o AS (SELECT * FROM base WHERE event_id % 7 <> 0),
        |nn AS (SELECT event_id, event_type,
        |        CASE WHEN event_id % 3 = 0 THEN vm + 1 ELSE vm END vm
        |       FROM base WHERE event_id % 5 <> 0),
        |d AS (SELECT COALESCE(o.event_id, nn.event_id) id,
        |       CASE WHEN o.event_id IS NULL THEN 'added'
        |            WHEN nn.event_id IS NULL THEN 'removed'
        |            WHEN o.event_type IS DISTINCT FROM nn.event_type
        |              OR o.vm IS DISTINCT FROM nn.vm THEN 'changed'
        |            ELSE 'unchanged' END status
        |      FROM o FULL JOIN nn ON o.event_id = nn.event_id)
        |SELECT status, count(*) n, CAST(sum(id) AS BIGINT) id_sum
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    "q81_correlate" ->
      """WITH d AS (SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type et,
        |        CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) s
        |       FROM events GROUP BY 1, 2),
        |p AS (SELECT a.et ta, b.et tb, count(*) n,
        |       CAST(sum(a.s) AS BIGINT) sx, CAST(sum(b.s) AS BIGINT) sy,
        |       CAST(sum(a.s * a.s) AS BIGINT) sxx, CAST(sum(b.s * b.s) AS BIGINT) syy,
        |       CAST(sum(a.s * b.s) AS BIGINT) sxy
        |      FROM d a JOIN d b ON a.day = b.day AND a.et < b.et GROUP BY 1, 2)
        |SELECT ta AS series_a, tb AS series_b, n,
        | CASE WHEN sqrt((n * sxx - sx * sx)::DOUBLE) * sqrt((n * syy - sy * sy)::DOUBLE) = 0
        |      THEN NULL
        |      ELSE round((n * sxy - sx * sy)::DOUBLE
        |        / (sqrt((n * sxx - sx * sx)::DOUBLE) * sqrt((n * syy - sy * sy)::DOUBLE)), 6)
        | END r
        |FROM p ORDER BY 1, 2""".stripMargin,
    "q80_pivot" ->
      """WITH b AS (SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
        |        CAST(floor(value * 1000) AS BIGINT) vm FROM events)
        |SELECT day,
        | CAST(sum(CASE WHEN event_type = 'click' THEN vm END) AS BIGINT) click,
        | CAST(sum(CASE WHEN event_type = 'error' THEN vm END) AS BIGINT) error,
        | CAST(sum(CASE WHEN event_type = 'purchase' THEN vm END) AS BIGINT) purchase,
        | CAST(sum(CASE WHEN event_type = 'signup' THEN vm END) AS BIGINT) signup,
        | CAST(sum(CASE WHEN event_type = 'view' THEN vm END) AS BIGINT) AS "view"
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,
    "q79_zorder" ->
      """WITH b AS (SELECT event_id, user_id & 65535 u,
        |        (CAST(floor(value * 1000) AS BIGINT) & 65535) v FROM events),
        |s1 AS (SELECT event_id, (u | (u << 8)) & 16711935 u, (v | (v << 8)) & 16711935 v FROM b),
        |s2 AS (SELECT event_id, (u | (u << 4)) & 252645135 u, (v | (v << 4)) & 252645135 v FROM s1),
        |s3 AS (SELECT event_id, (u | (u << 2)) & 858993459 u, (v | (v << 2)) & 858993459 v FROM s2),
        |s4 AS (SELECT event_id, (u | (u << 1)) & 1431655765 u, (v | (v << 1)) & 1431655765 v FROM s3)
        |SELECT event_id, CAST(u | (v << 1) AS BIGINT) zkey,
        | CAST((u | (v << 1)) >> 20 AS BIGINT) cell
        |FROM s4 ORDER BY event_id""".stripMargin,
    "q78_compact" ->
      """SELECT event_type, count(*) n, count(DISTINCT user_id) n_users,
        | CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) sum_val_m
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q77_equidepth" ->
      """WITH b AS (SELECT event_id, CAST(floor(value * 1000) AS BIGINT) vm FROM events),
        |r AS (SELECT event_id, vm, row_number() OVER (ORDER BY vm, event_id) rk,
        |       (SELECT count(*) FROM b) n FROM b)
        |SELECT CAST(((rk - 1) * 10) // n AS INTEGER) AS bin, count(*) n_rows,
        | min(vm) min_v, max(vm) max_v, CAST(sum(vm) AS BIGINT) sum_v
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "q76_profile" -> {
      def num(c: String) =
        s"""SELECT '$c' col_name, count(*) n,
           | CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) n_null,
           | count(DISTINCT $c) n_distinct,
           | CAST(min($c) AS DOUBLE) min_v, CAST(max($c) AS DOUBLE) max_v
           |FROM lineitem""".stripMargin
      def str(c: String) =
        s"""SELECT '$c' col_name, count(*) n,
           | CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) n_null,
           | count(DISTINCT $c) n_distinct,
           | CAST(min(length($c)) AS DOUBLE) min_v, CAST(max(length($c)) AS DOUBLE) max_v
           |FROM lineitem""".stripMargin
      Seq(num("l_orderkey"), num("l_quantity"), num("l_extendedprice"),
        str("l_returnflag"), str("l_linestatus"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    },
    "q74_transitions" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) ms, event_type FROM events),
        |st AS (SELECT event_type ft,
        |        lead(event_type) OVER (PARTITION BY user_id ORDER BY ms, event_id) tt
        |       FROM e),
        |c AS (SELECT ft, tt, count(*) n FROM st WHERE tt IS NOT NULL GROUP BY 1, 2)
        |SELECT ft AS from_type, tt AS to_type, CAST(n AS BIGINT) n,
        | round(n::DOUBLE / (sum(n) OVER (PARTITION BY ft))::DOUBLE, 6) p
        |FROM c ORDER BY from_type, to_type""".stripMargin,
    "q73_pagerank" ->
      """WITH e AS (SELECT DISTINCT CAST(o_custkey AS BIGINT) * 2 AS src,
        |         CAST(l_suppkey AS BIGINT) * 2 + 1 AS dst
        |       FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |nd AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |pp AS (SELECT count(*) n, 1000000000000 // count(*) r0,
        |        (100 - 85) * (1000000000000 // count(*)) // 100 base FROM nd),
        |og AS (SELECT src, count(*) deg FROM e GROUP BY 1),
        |i0 AS (SELECT node, (SELECT r0 FROM pp) r FROM nd),
        |c1 AS (SELECT e.dst node, sum(r.r // og.deg) c FROM e
        |       JOIN i0 r ON r.node = e.src JOIN og ON og.src = e.src GROUP BY 1),
        |d1 AS (SELECT COALESCE(sum(r.r), 0) // (SELECT n FROM pp) ds FROM i0 r
        |       LEFT JOIN og ON og.src = r.node WHERE og.src IS NULL),
        |i1 AS (SELECT nd.node, (SELECT base FROM pp)
        |        + (85 * (COALESCE(c1.c, 0) + (SELECT ds FROM d1))) // 100 r
        |       FROM nd LEFT JOIN c1 ON c1.node = nd.node),
        |c2 AS (SELECT e.dst node, sum(r.r // og.deg) c FROM e
        |       JOIN i1 r ON r.node = e.src JOIN og ON og.src = e.src GROUP BY 1),
        |d2 AS (SELECT COALESCE(sum(r.r), 0) // (SELECT n FROM pp) ds FROM i1 r
        |       LEFT JOIN og ON og.src = r.node WHERE og.src IS NULL),
        |i2 AS (SELECT nd.node, (SELECT base FROM pp)
        |        + (85 * (COALESCE(c2.c, 0) + (SELECT ds FROM d2))) // 100 r
        |       FROM nd LEFT JOIN c2 ON c2.node = nd.node),
        |c3 AS (SELECT e.dst node, sum(r.r // og.deg) c FROM e
        |       JOIN i2 r ON r.node = e.src JOIN og ON og.src = e.src GROUP BY 1),
        |d3 AS (SELECT COALESCE(sum(r.r), 0) // (SELECT n FROM pp) ds FROM i2 r
        |       LEFT JOIN og ON og.src = r.node WHERE og.src IS NULL),
        |i3 AS (SELECT nd.node, (SELECT base FROM pp)
        |        + (85 * (COALESCE(c3.c, 0) + (SELECT ds FROM d3))) // 100 r
        |       FROM nd LEFT JOIN c3 ON c3.node = nd.node)
        |SELECT node, CAST(r AS BIGINT) AS pr FROM i3 ORDER BY node""".stripMargin,
    // BM25 shapes mirror the Column chain exactly; note (1.2 + 1.0),
    // NOT 2.2 — the folded sum differs from the literal by one ulp
    "q96_bm25" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') tk FROM documents),
        |stats AS (SELECT count(*) n, CAST(sum(len(tk)) AS BIGINT) sum_dl,
        |  sum(CASE WHEN list_contains(tk, 'spark') THEN 1 ELSE 0 END) df0,
        |  sum(CASE WHEN list_contains(tk, 'shuffle') THEN 1 ELSE 0 END) df1,
        |  sum(CASE WHEN list_contains(tk, 'dup') THEN 1 ELSE 0 END) df2
        | FROM toks),
        |scored AS (SELECT doc_id,
        |  round(
        |   ln(1.0 + (n::DOUBLE - df0::DOUBLE + 0.5) / (df0::DOUBLE + 0.5))
        |    * (len(list_filter(tk, x -> x = 'spark'))::DOUBLE * (1.2 + 1.0))
        |    / (len(list_filter(tk, x -> x = 'spark'))::DOUBLE
        |       + 1.2 * (1.0 - 0.75 + 0.75 * len(tk)::DOUBLE / (sum_dl::DOUBLE / n::DOUBLE)))
        |   + ln(1.0 + (n::DOUBLE - df1::DOUBLE + 0.5) / (df1::DOUBLE + 0.5))
        |    * (len(list_filter(tk, x -> x = 'shuffle'))::DOUBLE * (1.2 + 1.0))
        |    / (len(list_filter(tk, x -> x = 'shuffle'))::DOUBLE
        |       + 1.2 * (1.0 - 0.75 + 0.75 * len(tk)::DOUBLE / (sum_dl::DOUBLE / n::DOUBLE)))
        |   + ln(1.0 + (n::DOUBLE - df2::DOUBLE + 0.5) / (df2::DOUBLE + 0.5))
        |    * (len(list_filter(tk, x -> x = 'dup'))::DOUBLE * (1.2 + 1.0))
        |    / (len(list_filter(tk, x -> x = 'dup'))::DOUBLE
        |       + 1.2 * (1.0 - 0.75 + 0.75 * len(tk)::DOUBLE / (sum_dl::DOUBLE / n::DOUBLE))), 6) score
        | FROM toks, stats)
        |SELECT doc_id, score FROM scored WHERE score > 0
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
    "q95_hybrid_search" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') tk FROM documents),
        |stats AS (SELECT count(*) n,
        |  sum(CASE WHEN list_contains(tk, 'spark') THEN 1 ELSE 0 END) df0,
        |  sum(CASE WHEN list_contains(tk, 'shuffle') THEN 1 ELSE 0 END) df1,
        |  sum(CASE WHEN list_contains(tk, 'dup') THEN 1 ELSE 0 END) df2
        | FROM toks),
        |scored AS (SELECT doc_id,
        |  round(
        |   len(list_filter(tk, x -> x = 'spark'))::DOUBLE * (ln((n + 1.0) / (df0 + 1.0)) + 1.0)
        |   + len(list_filter(tk, x -> x = 'shuffle'))::DOUBLE * (ln((n + 1.0) / (df1 + 1.0)) + 1.0)
        |   + len(list_filter(tk, x -> x = 'dup'))::DOUBLE * (ln((n + 1.0) / (df2 + 1.0)) + 1.0), 6) score
        | FROM toks, stats),
        |tr AS (SELECT doc_id id, row_number() OVER (ORDER BY score DESC, doc_id) rnk
        |       FROM (SELECT * FROM scored WHERE score > 0 ORDER BY score DESC, doc_id LIMIT 20)),
        |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v FROM embeddings),
        |q AS (SELECT v qv FROM e WHERE vec_id = 4),
        |cs AS (SELECT vec_id,
        |        round(list_dot_product(v, qv)
        |          / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) cos
        |       FROM e, q),
        |vr AS (SELECT vec_id id, row_number() OVER (ORDER BY cos DESC, vec_id) rnk
        |       FROM (SELECT * FROM cs ORDER BY cos DESC, vec_id LIMIT 20))
        |SELECT id, round(COALESCE(1.0 / (60 + tr.rnk), 0.0)
        |         + COALESCE(1.0 / (60 + vr.rnk), 0.0), 6) rrf,
        | CAST((CASE WHEN tr.rnk IS NOT NULL THEN 1 ELSE 0 END)
        |  + (CASE WHEN vr.rnk IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) n_sources
        |FROM tr FULL JOIN vr USING (id)
        |ORDER BY rrf DESC, id LIMIT 20""".stripMargin,
    "q94_kmeans" ->
      """WITH iv AS (SELECT vec_id, unnest(embedding) e,
        |        generate_subscripts(embedding, 1) i FROM embeddings),
        |vm AS (SELECT vec_id, i, CAST(floor(e::DOUBLE * 10000000) AS BIGINT) x FROM iv),
        |c0 AS (SELECT vec_id AS cluster, i, x cx FROM vm WHERE vec_id < 4),
        |d1 AS (SELECT vm.vec_id, c0.cluster,
        |        CAST(sum((vm.x - c0.cx) * (vm.x - c0.cx)) AS BIGINT) dist
        |       FROM vm JOIN c0 USING (i) GROUP BY 1, 2),
        |a1 AS (SELECT vec_id, cluster FROM (
        |        SELECT vec_id, cluster,
        |         row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) rn
        |        FROM d1) WHERE rn = 1),
        |s1 AS (SELECT a1.cluster, vm.i, CAST(sum(vm.x) AS BIGINT) s, count(*) n
        |       FROM a1 JOIN vm USING (vec_id) GROUP BY 1, 2),
        |cv1 AS (SELECT cluster, i, s // n cx FROM s1),
        |c1 AS (SELECT c0.cluster, c0.i, COALESCE(cv1.cx, c0.cx) cx
        |       FROM c0 LEFT JOIN cv1 ON cv1.cluster = c0.cluster AND cv1.i = c0.i),
        |d2 AS (SELECT vm.vec_id, c1.cluster,
        |        CAST(sum((vm.x - c1.cx) * (vm.x - c1.cx)) AS BIGINT) dist
        |       FROM vm JOIN c1 USING (i) GROUP BY 1, 2),
        |a2 AS (SELECT vec_id, cluster FROM (
        |        SELECT vec_id, cluster,
        |         row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) rn
        |        FROM d2) WHERE rn = 1)
        |SELECT vec_id, cluster FROM a2 ORDER BY vec_id""".stripMargin,
    "q93_schema_merge" ->
      """WITH b AS (SELECT event_id, event_type,
        |        CAST(floor(value * 1000) AS BIGINT) vm,
        |        CAST(json_extract_string(props, '$.k') AS BIGINT) k
        |       FROM events),
        |u AS (
        | SELECT 'v1' AS __source, event_type, CAST(NULL AS BIGINT) vm,
        |        CAST(NULL AS BIGINT) k FROM b WHERE event_id % 3 = 0
        | UNION ALL
        | SELECT 'v2', event_type, vm, CAST(NULL AS BIGINT) FROM b WHERE event_id % 3 = 1
        | UNION ALL
        | SELECT 'v3', event_type, vm, k FROM b WHERE event_id % 3 = 2)
        |SELECT __source, event_type, count(*) n,
        | CAST(sum(vm) AS BIGINT) sum_vm,
        | CAST(count(vm) AS BIGINT) n_vm, CAST(count(k) AS BIGINT) n_k
        |FROM u GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q92_wap" ->
      """SELECT epoch_ms(ts) // 86400000 AS day, event_type,
        | count(*) n, CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) sum_vm
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // q91's sink is the incrementally-maintained dimension; its oracle
    // is exactly the batch rebuild q72 proves
    "q91_stream_scd2" -> scd2OracleSql,
    "q72_scd2" -> scd2OracleSql,
    "q66_retention_cohorts" ->
      """WITH e AS (SELECT user_id u, epoch_ms(ts) ms FROM events),
        |f AS (SELECT u, min(ms) fm FROM e GROUP BY 1)
        |SELECT fm // 86400000 AS cohort_week,
        | (ms - fm) // 86400000 AS week_offset,
        | CAST(count(DISTINCT e.u) AS BIGINT) n_users
        |FROM e JOIN f USING (u) GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q67_anomaly_zscore" ->
      """WITH b AS (
        | SELECT event_id, event_type, CAST(floor(value * 1000) AS BIGINT) val_m FROM events),
        |st AS (
        | SELECT event_type, count(*) n, CAST(sum(val_m) AS BIGINT) s,
        |  CAST(sum(val_m * val_m) AS BIGINT) sq
        | FROM b GROUP BY 1),
        |z AS (
        | SELECT b.event_type, b.event_id, b.val_m,
        |  (b.val_m::DOUBLE - st.s::DOUBLE / st.n::DOUBLE)
        |    / sqrt((st.sq::DOUBLE - st.s::DOUBLE * st.s::DOUBLE / st.n::DOUBLE) / (st.n::DOUBLE - 1.0)) zz
        | FROM b JOIN st USING (event_type))
        |SELECT event_type, event_id, val_m, round(zz, 6) AS z
        |FROM z WHERE abs(zz) > 3.0 ORDER BY event_type, event_id""".stripMargin,
    "q65_inverted_search" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') tk FROM documents),
        |f AS (SELECT doc_id,
        |  len(list_filter(tk, x -> x = 'spark')) tf1,
        |  len(list_filter(tk, x -> x = 'dup')) tf2 FROM toks)
        |SELECT doc_id, CAST(tf1 + tf2 AS BIGINT) tf_sum
        |FROM f WHERE tf1 > 0 AND tf2 > 0 ORDER BY doc_id""".stripMargin,
    "q64_tfidf_search" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') tk FROM documents),
        |stats AS (SELECT count(*) n,
        |  sum(CASE WHEN list_contains(tk, 'spark') THEN 1 ELSE 0 END) df0,
        |  sum(CASE WHEN list_contains(tk, 'shuffle') THEN 1 ELSE 0 END) df1,
        |  sum(CASE WHEN list_contains(tk, 'dup') THEN 1 ELSE 0 END) df2
        | FROM toks),
        |scored AS (SELECT doc_id,
        |  round(
        |   len(list_filter(tk, x -> x = 'spark'))::DOUBLE * (ln((n + 1.0) / (df0 + 1.0)) + 1.0)
        |   + len(list_filter(tk, x -> x = 'shuffle'))::DOUBLE * (ln((n + 1.0) / (df1 + 1.0)) + 1.0)
        |   + len(list_filter(tk, x -> x = 'dup'))::DOUBLE * (ln((n + 1.0) / (df2 + 1.0)) + 1.0), 6) score
        | FROM toks, stats)
        |SELECT doc_id, score FROM scored WHERE score > 0
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
    "q63_pii_redact" ->
      """WITH planted AS (
        | SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN
        |   text || ' contact u' || doc_id || '@ex-' || (doc_id % 7) || '.org'
        |   || ' call ' || printf('%03d-%03d-%04d', doc_id % 1000, (doc_id * 3) % 1000, doc_id % 10000)
        |   || ' from ' || (doc_id % 223 + 1) || '.' || (doc_id % 256) || '.'
        |   || ((doc_id * 7) % 256) || '.' || (doc_id % 100 + 1)
        |  ELSE text END text2
        | FROM documents)
        |SELECT doc_id,
        | CAST(len(regexp_extract_all(text2, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) n_email,
        | CAST(len(regexp_extract_all(text2, '\b\d{3}-\d{3}-\d{4}\b')) AS BIGINT) n_phone,
        | CAST(len(regexp_extract_all(text2, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) n_ip,
        | regexp_replace(
        |  regexp_replace(
        |   regexp_replace(text2, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |   '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g'),
        |  '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') redacted
        |FROM planted ORDER BY doc_id""".stripMargin,
    "q62_repetition_filter" ->
      """WITH toks AS (
        | SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
        |   ELSE string_split_regex(trim(text), '\s+') END tk FROM documents),
        |ex AS (SELECT doc_id, unnest(tk) tok FROM toks),
        |cnt AS (SELECT doc_id, tok, count(*) c FROM ex GROUP BY 1, 2),
        |mx AS (SELECT doc_id, max(c) mc FROM cnt GROUP BY 1),
        |m AS (
        | SELECT t.doc_id, len(tk) n, len(list_distinct(tk)) nd,
        |  [array_to_string(list_slice(tk, i, i + 1), ' ')
        |   FOR i IN range(1, greatest(len(tk), 2))] g2,
        |  [array_to_string(list_slice(tk, i, i + 2), ' ')
        |   FOR i IN range(1, greatest(len(tk) - 1, 2))] g3,
        |  coalesce(mx.mc, 0) mc
        | FROM toks t LEFT JOIN mx USING (doc_id)),
        |f AS (
        | SELECT doc_id, CAST(n AS BIGINT) n_tokens,
        |  CASE WHEN n = 0 THEN 0.0 ELSE round(nd::DOUBLE / n, 6) END uniq_ratio,
        |  CASE WHEN n = 0 THEN 0.0 ELSE round(mc::DOUBLE / n, 6) END top_share,
        |  CASE WHEN n = 0 THEN 0.0 ELSE round(1 - len(list_distinct(g2))::DOUBLE / len(g2), 6) END dup2,
        |  CASE WHEN n = 0 THEN 0.0 ELSE round(1 - len(list_distinct(g3))::DOUBLE / len(g3), 6) END dup3
        | FROM m)
        |SELECT *, (top_share > 0.12 OR dup2 > 0.06 OR uniq_ratio < 0.33) repetitive
        |FROM f ORDER BY doc_id""".stripMargin,
    "q61_dedup_clusters" ->
      s"""WITH RECURSIVE $shingleSql,
         |$clusterCtes
         |SELECT node AS doc_id, min(lbl) AS cluster
         |FROM reach GROUP BY 1 ORDER BY 1""".stripMargin,
    "q97_cluster_split" ->
      s"""WITH RECURSIVE $shingleSql,
         |$clusterCtes,
         |cl AS (SELECT node AS doc_id, min(lbl) AS clid FROM reach GROUP BY 1),
         |ac AS (SELECT d.doc_id, COALESCE(cl.clid, d.doc_id) clid
         |       FROM documents d LEFT JOIN cl USING (doc_id)),
         |u AS (SELECT doc_id, clid,
         |       CAST(concat('0x', substring(md5(clid::VARCHAR), 1, 8)) AS BIGINT)
         |         / 4294967296.0 AS u
         |      FROM ac)
         |SELECT doc_id, clid AS "cluster",
         | CASE WHEN u < 0.8 THEN 'train' WHEN u < 0.9 THEN 'val' ELSE 'test' END AS split
         |FROM u ORDER BY doc_id""".stripMargin,
    "q58_decontaminate" ->
      """WITH toks AS (
        | SELECT doc_id, string_split_regex(trim(text), '\s+') tk FROM documents),
        |g AS (
        | SELECT doc_id, list_distinct([array_to_string(list_slice(tk, i, i + 7), ' ')
        |   FOR i IN range(1, greatest(len(tk) - 6, 2))]) gs
        | FROM toks),
        |x AS (SELECT doc_id, unnest(gs) AS gram FROM g),
        |c AS (SELECT * FROM x WHERE doc_id % 20 <> 7),
        |e AS (SELECT * FROM x WHERE doc_id % 20 = 7),
        |rare AS (SELECT gram FROM c GROUP BY gram HAVING count(*) <= 50),
        |j AS (
        | SELECT c.doc_id AS cid, e.doc_id AS eid, count(*) AS shared
        | FROM c JOIN rare USING (gram) JOIN e USING (gram)
        | GROUP BY 1, 2 HAVING count(*) >= 1)
        |SELECT cid AS doc_id, count(*) AS n_eval_docs,
        | CAST(max(shared) AS BIGINT) AS max_shared,
        | CAST(sum(shared) AS BIGINT) AS total_shared
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    "q57_weighted_sample" ->
      """WITH t AS (
        | SELECT doc_id, lang,
        |  CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR) || 'ws'), 1, 8)) AS BIGINT)
        |    / 4294967296.0 AS u,
        |  CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |    ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_tokens
        | FROM documents)
        |SELECT doc_id, lang, n_tokens FROM (
        | SELECT * FROM t WHERE n_tokens > 0
        | ORDER BY pow(u, 1.0 / n_tokens) DESC, doc_id LIMIT 25)
        |ORDER BY doc_id""".stripMargin,
    "q49_sessionize" ->
      """WITH e AS (
        | SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events),
        |x AS (
        | SELECT user_id, event_type, ms,
        |  CASE WHEN lag(ms) OVER (PARTITION BY user_id ORDER BY ms) IS NULL
        |    OR ms - lag(ms) OVER (PARTITION BY user_id ORDER BY ms) >= 21600000
        |   THEN 1 ELSE 0 END AS new_s
        | FROM e),
        |y AS (
        | SELECT user_id, event_type, ms,
        |  sum(new_s) OVER (PARTITION BY user_id ORDER BY ms ROWS UNBOUNDED PRECEDING) AS sid
        | FROM x)
        |SELECT user_id, count(*) AS n_events, min(ms) AS start_ms, max(ms) AS end_ms,
        | CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
        |FROM y GROUP BY user_id, sid ORDER BY user_id, start_ms""".stripMargin,
    "q46_hash_split" ->
      """WITH d AS (
        | SELECT *, CAST(concat('0x', substring(md5(source), 1, 8)) AS BIGINT)
        |   / 4294967296.0 AS u
        | FROM documents),
        |s AS (
        | SELECT CASE WHEN u < 0.8 THEN 'train' WHEN u < 0.9 THEN 'val'
        |   ELSE 'test' END AS split, lang, source, text FROM d)
        |SELECT split, lang, count(*) AS n_docs,
        | CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
        | CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 0
        |   ELSE len(string_split_regex(trim(text), '\s+')) END) AS BIGINT) AS sum_tokens
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q47_token_shards" ->
      """WITH t AS (
        | SELECT doc_id,
        |  CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |    ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_tokens
        | FROM documents)
        |SELECT doc_id, n_tokens,
        | CAST(sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
        | CAST((sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tokens)
        |   // 2000 AS BIGINT) AS shard
        |FROM t ORDER BY doc_id""".stripMargin,
    "q48_stratified_sample" ->
      """SELECT doc_id, lang, source FROM (
        | SELECT *, CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |   / 4294967296.0 AS u FROM documents)
        |WHERE u < (CASE WHEN lang = 'en' THEN 0.5 WHEN lang = 'de' THEN 0.25 ELSE 0.1 END)
        |ORDER BY doc_id""".stripMargin,
    "q42_upsert_stage_agg" -> stageAggOracleSql(windowed = false),
    "q43_windowed_stage_agg" -> stageAggOracleSql(windowed = true, winMs = 604800000L),
    "q34_ann_lsh_index" -> q34Sql,
    "q35_ann_ivf_index" -> q35Sql,
    "q59_stream_lsh_index" -> q59Sql,
    "q36_minhash_dedup" ->
      s"""WITH $shingleSql,
         |drops AS (
         | SELECT DISTINCT b.doc_id AS id_b
         | FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         | WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |   / (len(a.sh) + len(b.sh) - CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)) >= 0.8)
         |SELECT d.doc_id, d.lang, d.source FROM documents d
         |WHERE d.doc_id NOT IN (SELECT id_b FROM drops)
         |ORDER BY d.doc_id""".stripMargin,
    "q37_cosine_neardup" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v FROM embeddings),
        |planted AS (
        | SELECT vec_id + 1000000 AS vec_id,
        |  [v[i] * 0.95::DOUBLE + v[len(v) + 1 - i] * 0.05::DOUBLE
        |   FOR i IN range(1, len(v) + 1)] AS v
        | FROM e WHERE vec_id < 10),
        |allv AS (SELECT * FROM e UNION ALL SELECT * FROM planted),
        |pairs AS (
        | SELECT a.vec_id id_a, b.vec_id id_b,
        |  list_dot_product(a.v, b.v)
        |    / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) cos
        | FROM allv a JOIN allv b ON a.vec_id < b.vec_id)
        |SELECT id_a, id_b, round(cos, 6) AS cos
        |FROM pairs WHERE cos >= 0.8 ORDER BY 1, 2""".stripMargin,
    "q22_cosine_topk" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v FROM embeddings),
        |q AS (SELECT v qv FROM e WHERE vec_id = 0)
        |SELECT vec_id,
        | round(list_dot_product(v, qv) / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) AS cos
        |FROM e, q ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin,
    "q23_ann_topk" -> q23Sql,
    "q24_multimodal_meta" ->
      """SELECT doc_id AS media_id, 'image' AS modality,
        | octet_length(encode(text)) AS n_bytes,
        | CAST(160 + (octet_length(encode(text)) * 40503) % 1920 AS BIGINT) AS width,
        | CAST(120 + (octet_length(encode(text)) * 2654435761) % 1080 AS BIGINT) AS height,
        | CAST(3 AS BIGINT) AS channels,
        | md5(text) AS digest
        |FROM documents ORDER BY 1""".stripMargin
  )
}
