package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.TopK

class PipelineQueriesSpec extends SparkTestBase {
  import spark.implicits._

  test("TopK.nested ranks children only within surviving parents") {
    val df = Seq(
      // (region, nation, val): region B's max beats A's; nation ranks nest.
      ("A", "a1", 10), ("A", "a2", 50), ("A", "a3", 30),
      ("B", "b1", 90), ("B", "b2", 20),
      ("C", "c1", 5)
    ).toDF("r", "n", "v")
    val got = TopK.nested(df, Seq(("r", 2), ("n", 2)), "v")
      .select($"r", $"n", $"rk1", $"rk2")
      .orderBy($"rk1", $"rk2")
      .as[(String, String, Long, Long)].collect().toSeq
    // top-2 regions by max(v): B (90), A (50); top-2 nations within each.
    assert(got == Seq(
      ("B", "b1", 1L, 1L), ("B", "b2", 1L, 2L),
      ("A", "a2", 2L, 1L), ("A", "a3", 2L, 2L)))
  }

  // Queries whose correct answer is the empty set at sf0.001 (the
  // CORRECTNESS gate runs at sf0.01, where they are non-empty). They
  // must still execute; their semantics are pinned by dedicated specs
  // (e.g. KCoreSpec) and the sf0.01 oracle.
  private val emptyAtSmoke = Set("q135_kcore")

  // the round-10 split packs share this harness: same queries, same
  // smoke + oracle-coverage contracts, five files
  private val packs = Seq(
    "pipeline" -> ((PipelineQueries.all, PipelineQueries.oracle)),
    "warehouse" -> ((WarehouseQueries.all, WarehouseQueries.oracle)),
    "insight" -> ((InsightQueries.all, InsightQueries.oracle)),
    "tpch" -> ((TpchQueries.all, TpchQueries.oracle)),
    "live" -> ((LiveQueries.all, LiveQueries.oracle)))

  // q282's two-delivery checkpointed streaming harness is covered at
  // sf0.001 by LiveConsistencySpec + the driver verify — too slow for
  // this per-query smoke loop, but its keys DO join the oracle-coverage
  // and cross-pack-disjointness contracts below
  private val skipSmoke = Set("live")

  for ((pack, (all, _)) <- packs if !skipSmoke(pack);
       (name, fn) <- all.toSeq.sortBy(_._1)) {
    test(s"$name runs and returns rows on sf0.001 [$pack]") {
      val n = fn(spark, sfSmoke).count()
      if (emptyAtSmoke(name)) assert(n >= 0) else assert(n > 0)
    }
  }

  test("every pipeline-family query has a DuckDB oracle; packs are disjoint") {
    for ((_, (all, oracle)) <- packs)
      assert(oracle.keySet == all.keySet)
    val keys = packs.map(_._2._1.keySet)
    assert(keys.map(_.size).sum == keys.reduce(_ ++ _).size, "no key overlap")
  }
}
