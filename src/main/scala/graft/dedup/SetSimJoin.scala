package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** EXACT set-similarity self-join: every pair of rows whose element
  * sets have Jaccard ≥ tNum/tDen — the exact counterpart of the
  * MinHash-LSH pipeline in [[Dedup.neardupPairs]] (same semantics, no
  * recall loss), at the cost of touching true candidates instead of
  * banded ones.
  *
  * Algorithm: prefix filtering (the SSJoin/PPJoin family — Chaudhuri
  * et al. ICDE'06, Xiao et al. WWW'08; public literature, no
  * reference-engine analog). Elements are globally ordered by
  * ascending document frequency; a set of size n keeps only its first
  *   L = n − ceil(t·n) + 1
  * elements as its PREFIX. Any pair with Jaccard ≥ t must share a
  * prefix element of both sides (pigeonhole on the ceil(t·n)−1-sized
  * suffixes), so candidates come from an equi-join on prefix elements
  * only. Boilerplate elements (huge df) sort to the suffix and never
  * generate a candidate — that, plus the size filter
  * t·max(na,nb) ≤ min(na,nb), is what keeps the join subquadratic on
  * real corpora. Threshold math is all integer (tDen·shared ≥ tNum·un),
  * so an oracle can replay it exactly.
  *
  * Scale shape: two element-keyed aggregations (df + per-set ordering),
  * one equi hash join on prefix elements, then a verify join keyed on
  * ids. No window over raw rows, no cartesian anywhere — a degenerate
  * corpus (every doc identical) would make the TRUE OUTPUT itself
  * quadratic, which no algorithm avoids; for that regime use
  * [[Dedup.neardupPairs]]'s banded form with its bucket cap.
  */
object SetSimJoin {

  /** (id_a, id_b, shared, un) for every pair with
    * tDen·|A∩B| ≥ tNum·|A∪B|, id_a < id_b. `setCol` is an array
    * column; duplicate elements collapse (set semantics are enforced
    * here, not assumed), empty sets never match.
    */
  def jaccardJoin(
      sets: DataFrame,
      idCol: String,
      setCol: String,
      tNum: Int,
      tDen: Int): DataFrame = {
    require(tNum > 0 && tNum <= tDen, "threshold must be in (0, 1]")
    // materialized: consumed by the prefix pipeline AND both verify
    // sides — without the barrier the upstream set construction (HOFs,
    // no CSE across branches) re-runs three times
    val base = sets
      .select(col(idCol).cast("long").as("__id"),
        array_distinct(col(setCol)).as("__set"))
      .filter(size(col("__set")) > 0)
      .persist(StorageLevel.MEMORY_AND_DISK)

    // every exchange below keys on the 64-bit element hash, not the
    // element string — df counting, ordering, and the candidate join
    // shuffle fixed-width longs. Exactness survives hashing: the
    // canonical order (df, hash, element) is total and CONSISTENT
    // across sets (the string only breaks astronomically-rare hash
    // ties), the prefix theorem needs nothing but a consistent total
    // order, and the candidate join matching on hash can only ADD
    // collision candidates, which the exact verify then discards.
    val ex = base.select(col("__id"), explode(col("__set")).as("__el"))
      .withColumn("__eh", xxhash64(col("__el")))
    val dfreq = ex.groupBy("__eh").agg(count(lit(1)).as("__df"))
    val ordered = ex.join(dfreq, "__eh")
      .groupBy("__id")
      .agg(transform(
        array_sort(collect_list(struct(col("__df"), col("__eh"), col("__el")))),
        x => x("__eh")).as("__ord"))
      .withColumn("__n", size(col("__ord")))
      // integer ceil: L = n − ⌈t·n⌉ + 1
      .withColumn("__L",
        col("__n") - expr(s"(($tNum * __n + $tDen - 1) div $tDen)") + 1)
    // prefix join is where subquadratic lives: materialize the (small,
    // all-long) prefix table once instead of re-deriving it per side
    val prefix = ordered
      .select(col("__id"), col("__n"), explode(slice(col("__ord"), lit(1), col("__L"))).as("__eh"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val pa = prefix.select(col("__id").as("id_a"), col("__n").as("__na"), col("__eh"))
    val pb = prefix.select(col("__id").as("id_b"), col("__n").as("__nb"), col("__eh"))
    val cands = pa.join(pb,
        pa("__eh") === pb("__eh") && col("id_a") < col("id_b") &&
          lit(tDen) * least(col("__na"), col("__nb")) >=
            lit(tNum) * greatest(col("__na"), col("__nb")))
      .select("id_a", "id_b").distinct()

    val sa = base.select(col("__id").as("id_a"), col("__set").as("__sa"))
    val sb = base.select(col("__id").as("id_b"), col("__set").as("__sb"))
    cands.join(sa, "id_a").join(sb, "id_b")
      .withColumn("shared", size(array_intersect(col("__sa"), col("__sb"))).cast("long"))
      .withColumn("un",
        (size(col("__sa")) + size(col("__sb"))).cast("long") - col("shared"))
      .filter(lit(tDen.toLong) * col("shared") >= lit(tNum.toLong) * col("un"))
      .select(col("id_a"), col("id_b"), col("shared"), col("un"))
  }

  /** EXACT containment self-join: pairs with
    * |A∩B| ≥ (tNum/tDen)·min(|A|,|B|) — the ASYMMETRIC near-dup
    * relation Jaccard misses: a quote, excerpt, or boilerplate-wrapped
    * copy is almost fully contained in its host but has tiny Jaccard
    * against it, so [[jaccardJoin]]/MinHash banding never surface the
    * pair. Containment is the standard screen for sub-document
    * duplication in pre-training corpora.
    *
    * Candidate generation is one-sided prefix filtering (the
    * containment/superset-join variant of the SSJoin family): order
    * elements by ascending document frequency; the SMALLER set of a
    * qualifying pair needs overlap ≥ ⌈t·n_small⌉, so if its first
    *   L = n − ⌈t·n⌉ + 1
    * elements all miss B, the remaining n − L = ⌈t·n⌉ − 1 can't reach
    * the bar (pigeonhole). Hence: probe every set's PREFIX against a
    * FULL inverted index, keeping candidates where the prefix side is
    * the smaller (ties broken by id so each pair arises once per
    * direction it qualifies in). The full-postings side is what makes
    * containment intrinsically heavier than the symmetric join — but
    * prefixes hold only the df-rarest elements, so each probe touches
    * short postings lists; boilerplate elements never leave the
    * suffix. Verify is exact on the materialized sets. Same
    * hash-don't-shuffle-strings discipline as [[jaccardJoin]].
    */
  def containmentJoin(
      sets: DataFrame,
      idCol: String,
      setCol: String,
      tNum: Int,
      tDen: Int): DataFrame = {
    require(tNum > 0 && tNum <= tDen, "threshold must be in (0, 1]")
    val base = sets
      .select(col(idCol).cast("long").as("__id"),
        array_distinct(col(setCol)).as("__set"))
      .filter(size(col("__set")) > 0)
      .persist(StorageLevel.MEMORY_AND_DISK)

    val ex = base.select(col("__id"), explode(col("__set")).as("__el"))
      .withColumn("__eh", xxhash64(col("__el")))
    val dfreq = ex.groupBy("__eh").agg(count(lit(1)).as("__df"))
    val ordered = ex.join(dfreq, "__eh")
      .groupBy("__id")
      .agg(transform(
        array_sort(collect_list(struct(col("__df"), col("__eh"), col("__el")))),
        x => x("__eh")).as("__ord"))
      .withColumn("__n", size(col("__ord")))
      .withColumn("__L",
        col("__n") - expr(s"(($tNum * __n + $tDen - 1) div $tDen)") + 1)
      .persist(StorageLevel.MEMORY_AND_DISK)

    // probe side: prefixes only; index side: full postings
    val probe = ordered
      .select(col("__id").as("__pid"), col("__n").as("__pn"),
        explode(slice(col("__ord"), lit(1), col("__L"))).as("__eh"))
    val index = ordered
      .select(col("__id").as("__iid"), col("__n").as("__in"),
        explode(col("__ord")).as("__eh"))
    val cands = probe.join(index,
        probe("__eh") === index("__eh") && col("__pid") =!= col("__iid") &&
          // probe must be the (weakly) smaller side; strict id tiebreak
          // on equal sizes so a pair isn't generated from both ends
          (col("__pn") < col("__in") ||
            (col("__pn") === col("__in") && col("__pid") < col("__iid"))))
      .select(least(col("__pid"), col("__iid")).as("id_a"),
        greatest(col("__pid"), col("__iid")).as("id_b"))
      .distinct()

    val sa = base.select(col("__id").as("id_a"), col("__set").as("__sa"))
    val sb = base.select(col("__id").as("id_b"), col("__set").as("__sb"))
    cands.join(sa, "id_a").join(sb, "id_b")
      .withColumn("shared", size(array_intersect(col("__sa"), col("__sb"))).cast("long"))
      .withColumn("n_a", size(col("__sa")).cast("long"))
      .withColumn("n_b", size(col("__sb")).cast("long"))
      .filter(lit(tDen.toLong) * col("shared") >=
        lit(tNum.toLong) * least(col("n_a"), col("n_b")))
      .select(col("id_a"), col("id_b"), col("shared"), col("n_a"), col("n_b"))
  }
}
