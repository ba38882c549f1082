package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Co-occurrence edge construction — the shared first stage of every
  * graph query over the "parts bought together" relation. The naive
  * form self-joins the fact table on the group key (two shuffles of
  * the fact + a join); this operator instead aggregates each group's
  * distinct members into a sorted array (ONE fact shuffle) and
  * explodes the C(k,2) pairs row-locally inside codegen. The pair
  * count produced is identical (k² blowup for a k-member group is the
  * operator's semantics either way); what changes is that no join and
  * no second fact exchange ever happens. Groups here are orders
  * (k ≲ 10); at 100 TB a pathological group caps the same way it
  * would cap the self-join — `maxGroupSize` makes that caller promise
  * CHECKABLE: set it and a group past the cap fails the job with the
  * offending key in the message (a C(k,2) explosion inside one task is
  * the failure you want loudly, not as a straggler), the same
  * make-the-precondition-explicit move as LabelProp's
  * `distinctCanonicalEdges` flag. Default None preserves the unchecked
  * contract for callers whose k is structurally bounded.
  */
object Edges {

  /** The production cap the graph queries pass: orders are k ≲ 10 at
    * any scale factor (TPC-H caps lineitems per order at 7), so a
    * group past 10k members is upstream data corruption — C(10k, 2) =
    * 5·10⁷ pairs exploding inside ONE task is the failure to surface
    * loudly with the offending key, not to grind through. Generous
    * enough that no legitimate reshape of the testdata can trip it.
    */
  val orderGroupCap: Option[Int] = Some(10000)

  /** Inline group-cardinality guard: the member array passes through
    * when within the cap, else the row raises with the group key. The
    * guard lives IN the data path (a CASE over the exploded array), so
    * column pruning can never optimize it away.
    */
  private def guarded(keyCol: String, maxGroupSize: Option[Int]): Column =
    maxGroupSize.fold(col("__vs"))(m =>
      when(size(col("__vs")) > m, raise_error(concat(
        lit("Edges: group "), col(keyCol).cast("string"),
        lit(" has "), size(col("__vs")).cast("string"),
        lit(s" members, exceeding maxGroupSize=$m — pair explosion is " +
          "C(k,2) in one task; filter or split the hot group upstream"))))
        .otherwise(col("__vs")))

  private def pairsPerGroup(df: DataFrame, keyCol: String,
      valCol: String, maxGroupSize: Option[Int]): DataFrame =
    df.groupBy(col(keyCol))
      .agg(array_sort(collect_set(col(valCol).cast("long"))).as("__vs"))
      .filter(size(col("__vs")) >= 2) // sequence() steps DOWN below 2
      .withColumn("__vs", guarded(keyCol, maxGroupSize))
      .select(explode(expr(
        """flatten(transform(sequence(0, size(__vs) - 2), i ->
          |  transform(sequence(i + 1, size(__vs) - 1), j ->
          |    struct(__vs[i] AS a, __vs[j] AS b))))""".stripMargin))
        .as("__p"))
      .select(col("__p.a").as("a"), col("__p.b").as("b"))

  /** Distinct undirected edges (a < b): members co-occurring in at
    * least one group.
    */
  def coOccurrence(df: DataFrame, keyCol: String, valCol: String,
      maxGroupSize: Option[Int] = None): DataFrame =
    pairsPerGroup(df, keyCol, valCol, maxGroupSize).distinct()

  /** Undirected edges with their co-occurrence count (number of
    * groups containing both endpoints).
    */
  def coOccurrenceCounts(df: DataFrame, keyCol: String,
      valCol: String, maxGroupSize: Option[Int] = None): DataFrame =
    pairsPerGroup(df, keyCol, valCol, maxGroupSize)
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("w"))

  /** Every LINE pair (a < b) within a group, duplicates preserved —
    * the row-local form of the `x ⋈ y ON key WHERE x.v < y.v`
    * self-join (q179's line-pair counting needs pair multiplicity, so
    * [[coOccurrence]]'s collect_set dedup is wrong for it). Same
    * one-fact-shuffle shape as [[pairsPerGroup]]; a value appearing on
    * k lines of one group contributes k copies of each of its pairs,
    * exactly like the self-join it replaces.
    */
  def linePairs(df: DataFrame, keyCol: String, valCol: String,
      maxGroupSize: Option[Int] = None): DataFrame =
    df.groupBy(col(keyCol))
      .agg(collect_list(col(valCol).cast("long")).as("__vs"))
      .filter(size(col("__vs")) >= 2)
      .withColumn("__vs", guarded(keyCol, maxGroupSize))
      .select(explode(expr(
        """flatten(transform(__vs, x ->
          |  filter(transform(__vs, y ->
          |    CASE WHEN x < y THEN struct(x AS a, y AS b) END),
          |   p -> p IS NOT NULL)))""".stripMargin)).as("__p"))
      .select(col("__p.a").as("a"), col("__p.b").as("b"))

  /** Line pairs with an ADDITIVE per-line weight: each (a < b) pair
    * carries w_a + w_b — the row-local form of the weighted co-purchase
    * self-join feeding q167's Bellman-Ford adjacency (pair weight =
    * sum of the two lines' quantities). Multiset-identical to
    * `x ⋈ y ON key WHERE x.v < y.v SELECT x.v, y.v, x.w + y.w`;
    * aggregate downstream (the adjacency takes min per edge).
    */
  def weightedPairs(df: DataFrame, keyCol: String, valCol: String,
      wCol: String, maxGroupSize: Option[Int] = None): DataFrame =
    df.groupBy(col(keyCol))
      .agg(collect_list(struct(col(valCol).cast("long").as("v"),
        col(wCol).cast("long").as("q"))).as("__vs"))
      .filter(size(col("__vs")) >= 2)
      .withColumn("__vs", guarded(keyCol, maxGroupSize))
      .select(explode(expr(
        """flatten(transform(__vs, x ->
          |  filter(transform(__vs, y ->
          |    CASE WHEN x.v < y.v
          |      THEN struct(x.v AS src, y.v AS dst, x.q + y.q AS w) END),
          |   p -> p IS NOT NULL)))""".stripMargin)).as("__p"))
      .select(col("__p.src").as("src"), col("__p.dst").as("dst"),
        col("__p.w").as("w"))
}
