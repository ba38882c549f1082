package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.{Packing, PrefixSum}

class TrainingQueriesSpec extends SparkTestBase {
  import spark.implicits._

  test("oracle map covers every training query") {
    assert(TrainingQueries.all.keySet == TrainingQueries.oracle.keySet)
  }

  for ((name, fn) <- TrainingQueries.all.toSeq.sortBy(_._1)) {
    test(s"$name runs and returns rows on sf0.001") {
      assert(fn(spark, sfSmoke).count() > 0, s"$name returned no rows")
    }
  }

  test("Packing.nextFit matches the serial next-fit twin, shard by shard") {
    val rng = new scala.util.Random(13)
    val docs = (1 to 500).map(i =>
      (i.toLong % 7, i.toLong, rng.nextInt(120).toLong + 1))
    val got = Packing.nextFit(docs.toDF("shard", "id", "sz"),
        "shard", "id", "sz", capacity = 100L)
      .select($"shard", $"id", $"bin", $"fill")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // serial twin per shard
    val want = docs.groupBy(_._1).flatMap { case (shard, ds) =>
      var bin = 0L; var fill = 0L
      ds.sortBy(_._2).map { case (_, id, sz) =>
        if (fill > 0 && fill + sz > 100L) { bin += 1; fill = 0L }
        fill += sz
        (shard, id) -> (bin, fill)
      }
    }.toMap
    assert(got == want)
  }

  test("Packing.nextFit gives an oversized document a bin of its own") {
    val docs = Seq((0L, 1L, 40L), (0L, 2L, 999L), (0L, 3L, 40L))
    val got = Packing.nextFit(docs.toDF("shard", "id", "sz"),
        "shard", "id", "sz", capacity = 100L)
      .select($"id", $"bin").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("PrefixSum.runningSum equals the single-partition window twin") {
    val rng = new scala.util.Random(17)
    val rows = (1 to 1000).map(i => (rng.nextInt(50).toLong, i.toLong,
      rng.nextInt(9).toLong))
    val got = PrefixSum.runningSum(rows.toDF("k", "id", "v"),
        Seq("k", "id"), "v", "cum", numPartitions = Some(8))
      .select($"id", $"cum").as[(Long, Long)].collect().toMap
    var acc = 0L
    val want = rows.sortBy(r => (r._1, r._2)).map { case (_, id, v) =>
      acc += v; id -> acc
    }.toMap
    assert(got == want)
  }

  test("alertIncidents: merge/duration edge cases on a planted hourly series") {
    // type a: breaches at hours 1,2 then 5,6 — the hr gap 5-2=3 > 2
    //   splits them into two incidents; hour 10 alone (1 breach hour)
    //   never reaches the 2-breach-hour floor.
    // type b: breaches at 1,3,5 — hr gaps of exactly 2 (one quiet hour)
    //   merge into ONE incident: 3 breach hours spanning dur 5.
    // type c: sub-threshold counts only — present in output with zeros.
    val h = Seq(
      ("a", 1L, 5L), ("a", 2L, 7L), ("a", 5L, 4L), ("a", 6L, 4L), ("a", 10L, 9L),
      ("b", 1L, 4L), ("b", 3L, 4L), ("b", 5L, 6L),
      ("c", 1L, 3L), ("c", 2L, 1L)
    ).toDF("event_type", "hr", "n")
    val got = TrainingQueries.alertIncidents(h).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    // a: incidents {1,2} and {5,6}; hour 10 is a 1-hour episode → dropped
    assert(got("a") == ((2L, 2L, 4L, 7L)), s"a was ${got("a")}")
    // b: one merged incident over hours 1..5, 3 breach hours, peak 6
    assert(got("b") == ((1L, 5L, 3L, 6L)), s"b was ${got("b")}")
    // c: never breaches but still reported
    assert(got("c") == ((0L, 0L, 0L, 0L)), s"c was ${got("c")}")
  }

  test("PanelSpec: parse defaults, agg dispatch, unsupported agg rejected") {
    import graft.search.PanelSpec
    val s1 = PanelSpec.parse("""{"panel": "p", "agg": "terms", "field": "f"}""")
    assert(s1 == PanelSpec.Spec("p", None, "terms", "f", 86400000L, 5, "value", None))
    val df = Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 0.5))
      .toDF("id", "f", "value")
    val terms = PanelSpec.run(df,
        """{"panel": "p", "agg": "terms", "field": "f", "size": 1}""")
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    assert(terms.toSeq == Seq(("a", 2L, 300L)))
    intercept[IllegalArgumentException] {
      PanelSpec.run(df, """{"panel": "p", "agg": "pie", "field": "f"}""")
    }
  }

  test("WAV round-trip: decodeWavHeader reads back syntheticWav exactly") {
    import graft.multimodal.Multimodal
    for ((sr, ch, frames) <- Seq((8000, 1, 1037), (16000, 2, 2000), (24000, 1, 1), (44100, 2, 12345))) {
      val got = Multimodal.decodeWavHeader(Multimodal.syntheticWav(sr, ch, frames))
      assert(got.contains((sr, ch, 16, frames.toLong)), s"($sr,$ch,$frames) -> $got")
    }
    // non-RIFF payloads must not parse
    assert(Multimodal.decodeWavHeader("not a wav at all, just text bytes".getBytes).isEmpty)
    assert(Multimodal.decodeWavHeader(Array.emptyByteArray).isEmpty)
  }

  test("q184 selection is a prefix of the quality ranking (no holes)") {
    val docs = graft.sources.Tables.documents(spark, sfSmoke)
    val scored = docs.select($"doc_id",
      graft.text.TextAnalysis.tokenCount($"text").as("toks"),
      graft.text.TextAnalysis.qualityScore($"text").as("q"))
    val ranked = PrefixSum.runningSum(
      scored.withColumn("negq", -$"q"), Seq("negq", "doc_id"), "toks", "cum")
    val total = scored.agg(sum($"toks")).head().getLong(0)
    val flags = ranked.orderBy($"negq", $"doc_id")
      .select(($"cum" * 2 <= total).as("sel")).as[Boolean].collect()
    val firstDrop = flags.indexOf(false)
    assert(firstDrop > 0, "budget must select a non-empty strict prefix")
    assert(flags.drop(firstDrop).forall(!_), "selection must be a prefix")
  }
}
