package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near-dup of 0
    (2L, "completely different content about spark shuffle partitions and joins"),
    (3L, "the quick brown fox jumps over the lazy dog near the river bank today") // exact dup of 0
  ).toDF("doc_id", "text")

  test("exact dedup keeps lowest id and counts copies") {
    val got = Dedup.exact(docs, Seq("text"), "doc_id")
      .orderBy($"keep_id")
      .select($"keep_id", $"n_copies")
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((0L, 2L), (1L, 1L), (2L, 1L)))
  }

  test("shingles produce k-grams, distinct, clamped at the tail") {
    val got = Seq("a b c d", "x", "").toDF("t")
      .select(Dedup.shingles($"t", 3).as("sh"))
      .as[Seq[String]].collect()
    assert(got(0) == Seq("a b c", "b c d"))
    assert(got(1) == Seq("x"))
  }

  test("neardupPairs finds planted near-dups only, with exact jaccard") {
    val pairs = Dedup.neardupPairs(docs, "doc_id", "text", shingleK = 3,
        p = 64, bands = 16, threshold = 0.5)
      .orderBy($"id_a", $"id_b")
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSeq
    // 0~1 (one token differs), 0~3 (identical), 1~3; never 2.
    assert(pairs == Seq((0L, 1L), (0L, 3L), (1L, 3L)))
  }

  test("minhashDedup drops every doc matching a lower id (keep-first policy)") {
    val kept = Dedup.minhashDedup(docs, "doc_id", "text", threshold = 0.5)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(0L, 2L))
  }

  test("simhash: identical texts hash equal; near-dups within small hamming") {
    val sigs = docs.select($"doc_id", Dedup.simhash($"text").as("sig"))
      .as[(Long, Long)].collect().toMap
    assert(sigs(0L) == sigs(3L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(0L), sigs(1L)) <= 10)
    assert(ham(sigs(0L), sigs(2L)) > 10)
  }

  test("simhashNearDupPairs banded search equals brute-force at maxHamming") {
    val sigged = docs.select($"doc_id",
      Dedup.simhashOf(Dedup.shingles($"text", 3), Dedup.md5Hash60, 60).as("sig"))
    val banded = Dedup.simhashNearDupPairs(sigged, "doc_id", "sig", maxHamming = 10, bits = 60)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val sigs = sigged.as[(Long, Long)].collect()
    val brute = (for {
      (a, sa) <- sigs; (b, sb) <- sigs
      if a < b && java.lang.Long.bitCount(sa ^ sb) <= 10
    } yield (a, b)).toSet
    assert(banded == brute && brute.nonEmpty)
  }

  test("randomized differential: banded search == brute force across the (bits, maxHamming, intactBands) space") {
    // gates the band-width arithmetic generally (remainder bands get
    // the extra bit, the 64-bit band mask must not wrap) — round 9
    // retuned production parameters, so the single-point test above is
    // no longer the only coverage; round 10 added the generalized-
    // pigeonhole combo keys (intactBands > 1), whose full-recall claim
    // this differential now covers too
    val rnd = new scala.util.Random(2026091L)
    (1 to 20).foreach { trial =>
      val bits = 4 + rnd.nextInt(61) // 4..64
      val maxHamming = rnd.nextInt(math.min(bits, 13)) // 0..min(bits,13)-1
      val intactBands = 1 + rnd.nextInt(
        math.max(1, math.min(3, bits - maxHamming))) // bands <= bits
      val mask = if (bits >= 64) -1L else (1L << bits) - 1L
      // cluster around a few centers so the hamming ball is non-trivially
      // populated at every radius
      val centers = Seq.fill(3)(rnd.nextLong() & mask)
      val sigs = (0L until 40L).map { id =>
        val c = centers((id % 3).toInt)
        val flips = rnd.nextInt(bits / 2 + 1)
        val flipped = (1 to flips).foldLeft(c)((s, _) =>
          s ^ (1L << rnd.nextInt(bits)))
        (id, flipped & mask)
      }
      val banded = Dedup.simhashNearDupPairs(
          sigs.toDF("doc_id", "sig"), "doc_id", "sig", maxHamming, bits,
          intactBands)
        .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
      val brute = (for {
        (a, sa) <- sigs; (b, sb) <- sigs
        if a < b && java.lang.Long.bitCount(sa ^ sb) <= maxHamming
      } yield (a, b)).toSet
      assert(banded == brute,
        s"trial $trial bits=$bits maxHamming=$maxHamming r=$intactBands: " +
          s"banded ${banded.size} vs brute ${brute.size}")
    }
  }

  test("edge inputs: empty and single-token texts survive the whole near-dup path") {
    val edge = Seq((0L, ""), (1L, "word"), (2L, "   "), (3L, "word")).toDF("doc_id", "text")
    // identical single-token docs are exact dups (jaccard 1); blanks
    // produce [""] shingles that only match other blanks
    val pairs = Dedup.neardupPairs(edge, "doc_id", "text", threshold = 0.9)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 3L)))
    assert(!pairs.exists(p => Set(p._1, p._2) == Set(0L, 1L)))
  }

  test("simhashBandKeys rejects zero-width bands and masks full-width bands") {
    intercept[IllegalArgumentException] {
      Dedup.simhashBandKeys($"x", bands = 65, bits = 64)
    }
    // bands=1, bits=64: single full-width band key == the signature itself
    val got = Seq(-1L, 42L).toDF("sig")
      .select(Dedup.simhashBandKeys($"sig", 1, 64).getItem(0).as("k"))
      .as[Long].collect().toSeq
    assert(got == Seq(-1L, 42L))
  }

  test("md5Hash60 is positive and below 2^60 (oracle-replicable range)") {
    val vals = Seq("a", "b", "xyz").toDF("t")
      .select(Dedup.md5Hash60($"t").as("h")).as[Long].collect()
    assert(vals.forall(v => v >= 0L && v < (1L << 60)))
    assert(vals.distinct.length == 3)
  }

  test("LSH skew guard drops oversized buckets AND the observed metric fires") {
    import graft.operators.GuardMetrics
    @volatile var dropped = -1L
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
          d: Long): Unit =
        // same AQE-unwrapping lookup the production listener uses —
        // qe.observedMetrics alone misses metrics inside query stages
        qe.observedMetrics.get(GuardMetrics.LshDroppedMetric)
          .orElse(GuardMetrics.findLshMetric(qe.executedPlan))
          .foreach { row =>
            val v = row.getAs[java.lang.Long]("dropped_memberships")
            if (v != null && v.longValue > 0) dropped = v.longValue
          }
      override def onFailure(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    })
    // 30 degenerate docs (bucket of 30 → dropped) alongside 5 docs in a
    // small legitimate bucket (kept): the realistic mixed-content shape.
    // NOTE an ALL-dropped corner would leave the final output provably
    // empty and AQE's empty-relation propagation then erases the metric
    // node itself (see GuardMetrics docs) — mixed content is what the
    // guard is for.
    val sigs = ((1L to 30L).map(i => (i, Seq(7L, 8L, 9L, 10L))) ++
      (31L to 35L).map(i => (i, Seq(100L, 200L, 300L, 400L)))).toDF("id", "sig")
    val cands = Dedup.lshCandidatePairs(sigs, "id", "sig", bands = 2, rows = 2,
      maxBucketSize = 10)
    assert(cands.count() == 10) // C(5,2) from the kept bucket; degenerates suppressed
    // the observed-metric listener is async — await its delivery
    val deadline = System.nanoTime() + 10e9.toLong
    while (dropped < 0 && System.nanoTime() < deadline) Thread.sleep(50)
    assert(dropped == 60L, s"expected 60 dropped memberships (30 ids x 2 bands), got $dropped")
  }

  test("GuardMetrics process counters surface a planted hot-bucket drop (the bench path)") {
    import graft.operators.GuardMetrics
    // the exact harness sequence Bench.runGroup uses: snapshot → run →
    // drain the async listener bus → snapshot delta
    val before = GuardMetrics.snapshot()
    val sigs = ((1L to 25L).map(i => (i, Seq(7L, 8L, 9L, 10L))) ++
      (31L to 35L).map(i => (i, Seq(100L, 200L, 300L, 400L)))).toDF("id", "sig")
    val n = Dedup.lshCandidatePairs(sigs, "id", "sig", bands = 2, rows = 2,
      maxBucketSize = 10).count()
    assert(n == 10)
    GuardMetrics.drainListenerBus(spark)
    val delta = GuardMetrics.snapshot().minus(before)
    // >= not ==: the counters are process-global and other suites in
    // this JVM may legitimately fire guards concurrently
    assert(delta.droppedMemberships >= 50L,
      s"expected >= 50 dropped memberships (25 ids x 2 bands), got $delta")
    assert(delta.fires >= 1L)
    assert(delta.maxBucketSeen >= 25L)
  }

  test("simhashCandidateVolume matches hand-computed combinatorics (even and ragged bands)") {
    // bits=12, maxHamming=2, r=2: 4 bands of 3 bits, C(4,2)=6 combos of
    // width 6 → selectivity 6/64
    val even = Dedup.simhashCandidateVolume(100, 12, 2, 2)
    assert(math.abs(even - 6.0 / 64 * 4950) < 1e-9, s"even: $even")
    // bits=13: sizes (4,3,3,3); combos touching band 0 have width 7 (3
    // of them), the rest width 6 (3)
    val ragged = Dedup.simhashCandidateVolume(100, 13, 2, 2)
    val expected = (3 * math.pow(2, -7) + 3 * math.pow(2, -6)) * 4950
    assert(math.abs(ragged - expected) < 1e-9, s"ragged: $ragged vs $expected")
    // selectivity is capped at 1: the volume can never exceed C(n,2)
    assert(Dedup.simhashCandidateVolume(100, 4, 2, 2) <= 4950.0)
  }

  test("autoIntactBands grows with corpus size and respects the combo cap") {
    // the q19 banding (60 bits, hamming <= 10) across the measured scale
    // points: sf0.01 ~500 docs, sf3 150k, sf10 500k
    assert(Dedup.autoIntactBands(500, 60, 10) == 1)
    assert(Dedup.autoIntactBands(150000, 60, 10) == 3)
    assert(Dedup.autoIntactBands(500000, 60, 10) == 3)
    assert(Dedup.autoIntactBands(5000000, 60, 10) == 4)
    // monotone non-decreasing in n
    val rs = Seq(100L, 10000L, 1000000L, 100000000L)
      .map(Dedup.autoIntactBands(_, 60, 10))
    assert(rs == rs.sorted, s"not monotone: $rs")
    // a tight combo cap forces a smaller r: C(13,3)=286 > 70 >= C(12,2)=66
    assert(Dedup.autoIntactBands(500000, 60, 10, maxCombos = 70) == 2)
    // degenerate corpus sizes pick the cheapest feasible banding
    assert(Dedup.autoIntactBands(0, 60, 10) == 1)
    assert(Dedup.autoIntactBands(1, 60, 10) == 1)
    // no room under bits at all → reject
    intercept[IllegalArgumentException] { Dedup.autoIntactBands(100, 10, 10) }
  }

  test("banding too loose for a known corpus size fails fast with the volume formula") {
    val sigged = docs.select($"doc_id",
      Dedup.simhashOf(Dedup.shingles($"text", 3), Dedup.md5Hash60, 60).as("sig"))
    // planted too-loose-for-N call site: r=1 banding at a claimed 10M
    // docs predicts ~1.3e13 candidates — 2.7e6 per row, over any budget
    val e = intercept[IllegalArgumentException] {
      Dedup.simhashNearDupPairs(sigged, "doc_id", "sig", maxHamming = 10,
        bits = 60, intactBands = 1, estimatedRows = Some(10000000L))
    }
    assert(e.getMessage.contains("candidate volume"))
    assert(e.getMessage.contains("autoIntactBands"))
    // the same banding is fine when the corpus is actually small
    Dedup.simhashNearDupPairs(sigged, "doc_id", "sig", maxHamming = 10,
      bits = 60, intactBands = 1, estimatedRows = Some(5L))
  }

  test("simhashNearDupPairsAuto output is identical to explicit banding (r only moves cost)") {
    val sigged = docs.select($"doc_id",
      Dedup.simhashOf(Dedup.shingles($"text", 3), Dedup.md5Hash60, 60).as("sig"))
    val auto = Dedup.simhashNearDupPairsAuto(sigged, "doc_id", "sig",
        maxHamming = 10, bits = 60)
      .select($"id_a", $"id_b", $"hamming").as[(Long, Long, Long)].collect().toSet
    val explicit = Dedup.simhashNearDupPairs(sigged, "doc_id", "sig",
        maxHamming = 10, bits = 60, intactBands = 2)
      .select($"id_a", $"id_b", $"hamming").as[(Long, Long, Long)].collect().toSet
    assert(auto == explicit && auto.nonEmpty)
  }
}
