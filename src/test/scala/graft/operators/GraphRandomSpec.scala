package graft.operators

import scala.util.Random

import graft.SparkTestBase

/** Randomized differentials for the graph operators that previously
  * had only fixed-fixture specs: small random graphs, each compared
  * against a direct in-memory reference implementation of the
  * documented semantics (KTruss's bounded peel with converged-tail
  * padding, Bfs's min-hop frontier, PageRank's exact-integer
  * truncating recurrence with uniform dangling return).
  */
class GraphRandomSpec extends SparkTestBase {
  import spark.implicits._

  private val rnd = new Random(8281L)

  private def randomEdges(nodes: Int, p: Double): Seq[(Long, Long)] =
    (for {
      a <- 0 until nodes; b <- 0 until nodes
      if a != b && rnd.nextDouble() < p
    } yield (a.toLong, b.toLong)).toSeq

  // ------------------------------------------------------------ k-truss

  private def trussRef(edges: Seq[(Long, Long)], k: Int,
      rounds: Int): Seq[(Long, Long)] = {
    var e = edges.map { case (a, b) => (a min b, a max b) }
      .filter(p => p._1 != p._2).distinct.toSet
    val counts = scala.collection.mutable.ListBuffer[(Long, Long)]((0L, e.size.toLong))
    var r = 1
    var converged = false
    while (r <= rounds && !converged) {
      val adj = (e.toSeq ++ e.toSeq.map(_.swap)).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      val kept = e.filter { case (a, b) =>
        (adj(a) - b).count(z => e.contains((b min z, b max z))) >= k - 2
      }
      counts += ((r.toLong, kept.size.toLong))
      converged = kept.size == e.size
      e = kept
      r += 1
    }
    while (r <= rounds) { counts += ((r.toLong, counts.last._2)); r += 1 }
    counts.toSeq
  }

  test("KTruss.peelCounts == in-memory peel on 10 random graphs, k in {3,4}") {
    (1 to 10).foreach { trial =>
      val edges = randomEdges(10, 0.35)
      val k = 3 + rnd.nextInt(2)
      if (edges.nonEmpty) {
        val got = KTruss.peelCounts(edges.toDF("s", "d"), "s", "d", k, rounds = 6)
          .as[(Long, Long)].collect().sortBy(_._1).toSeq
        assert(got == trussRef(edges, k, 6), s"trial $trial k=$k edges=$edges")
      }
    }
  }

  // ---------------------------------------------------------------- bfs

  private def bfsRef(edges: Seq[(Long, Long)], seeds: Seq[Long],
      maxHops: Int): Set[(Long, Long)] = {
    val adj = (edges ++ edges.map(_.swap)).filter(p => p._1 != p._2)
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    var visited = seeds.distinct.map(_ -> 0L).toMap
    var frontier = seeds.distinct.toSet
    var hop = 0L
    while (hop < maxHops && frontier.nonEmpty) {
      hop += 1
      val next = frontier.flatMap(n => adj.getOrElse(n, Set.empty)) -- visited.keySet
      visited = visited ++ next.map(_ -> hop)
      frontier = next
    }
    visited.toSet.map((kv: (Long, Long)) => (kv._1, kv._2))
  }

  test("Bfs.hops == in-memory BFS on 12 random graphs with random seeds") {
    (1 to 12).foreach { trial =>
      val edges = randomEdges(12, 0.18)
      val seeds = Seq.fill(1 + rnd.nextInt(3))(rnd.nextLong(14)).distinct
      val maxHops = rnd.nextInt(4)
      val got =
        if (edges.isEmpty) Set.empty[(Long, Long)]
        else Bfs.hops(edges.toDF("s", "d"), "s", "d",
            seeds.toDF("n"), "n", maxHops)
          .as[(Long, Long)].collect().toSet
      if (edges.nonEmpty)
        assert(got == bfsRef(edges, seeds, maxHops),
          s"trial $trial seeds=$seeds maxHops=$maxHops edges=$edges")
    }
  }

  // ----------------------------------------------------------- pagerank

  private def prRef(edges: Seq[(Long, Long)], iterations: Int,
      dampNum: Long = 85L, dampDen: Long = 100L,
      scale: Long = 1000000000000L): Map[Long, Long] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val outdeg = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val inEdges = e.groupBy(_._2)
    val n = nodes.size.toLong
    val r0 = scale / n
    val base = (dampDen - dampNum) * r0 / dampDen
    var r = nodes.map(_ -> r0).toMap
    (1 to iterations).foreach { _ =>
      val share = r.collect { case (u, ru) if outdeg.contains(u) =>
        u -> ru / outdeg(u)
      }
      val dang = r.collect { case (u, ru) if !outdeg.contains(u) => ru }.sum
      r = nodes.map { v =>
        val contrib = inEdges.getOrElse(v, Seq.empty).map(p => share(p._1)).sum
        v -> (base + dampNum * (contrib + dang / n) / dampDen)
      }.toMap
    }
    r
  }

  // ---------------------------------------------------- label propagation

  private def lpaRef(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val adj = (edges ++ edges.map(_.swap)).filter(p => p._1 != p._2)
      .distinct.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var labels = adj.keySet.map(v => v -> v).toMap
    (1 to rounds).foreach { _ =>
      labels = adj.keySet.map { v =>
        // majority of neighbor labels, smallest label on ties
        val votes = adj(v).groupBy(labels).view.mapValues(_.size)
        v -> votes.toSeq.maxBy { case (l, n) => (n, -l) }._1
      }.toMap
    }
    labels
  }

  test("LabelProp.propagate == serial majority vote; both edge-input modes agree") {
    (1 to 10).foreach { trial =>
      // messy input: duplicates, self-loops, both directions
      val base = randomEdges(10, 0.25)
      val messy = base ++ base.take(3) ++ base.take(2).map(_.swap) ++
        Seq((4L, 4L))
      val rounds = 1 + rnd.nextInt(3)
      if (base.nonEmpty) {
        val got = LabelProp.propagate(messy.toDF("s", "d"), "s", "d", rounds)
          .as[(Long, Long)].collect().toMap
        assert(got == lpaRef(messy, rounds), s"trial $trial rounds=$rounds")
        // the canonical fast path (caller-promised DISTINCT a<b edges)
        // must produce the same labels as the messy-input slow path
        val canonical = messy.map { case (a, b) => (a min b, a max b) }
          .filter(p => p._1 != p._2).distinct
        val fast = LabelProp.propagate(canonical.toDF("s", "d"), "s", "d",
            rounds, distinctCanonicalEdges = true)
          .as[(Long, Long)].collect().toMap
        assert(fast == got, s"trial $trial canonical-path divergence")
      }
    }
  }

  test("PageRank.ranks == in-memory integer recurrence on 8 random digraphs") {
    (1 to 8).foreach { trial =>
      val edges = randomEdges(9, 0.22)
      if (edges.nonEmpty) {
        val iters = 1 + rnd.nextInt(4)
        val got = PageRank.ranks(edges.toDF("s", "d"), "s", "d", iters)
          .as[(Long, Long)].collect().toMap
        assert(got == prRef(edges, iters),
          s"trial $trial iters=$iters edges=$edges")
      }
    }
  }
}
