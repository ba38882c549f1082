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

/** TPC-H-shaped benchmark pack (split from PipelineQueries round 10 —
  * pure move-refactor, oracle hashes unchanged): Q3/Q5/Q16/Q17/Q18/Q22
  * analogs plus typed set operations over the same tables.
  */
object TpchQueries {

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

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q249_sales_opportunity" -> q249SalesOpportunity _,
    "q246_small_quantity_revenue" -> q246SmallQuantityRevenue _,
    "q247_large_volume_customers" -> q247LargeVolumeCustomers _,
    "q248_set_ops" -> q248SetOps _,
    "q243_shipping_priority" -> q243ShippingPriority _,
    "q244_local_supplier_volume" -> q244LocalSupplierVolume _,
    "q245_parts_supplier" -> q245PartsSupplier _,
  )

  val oracle: Map[String, String] = Map(
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
  )
}
