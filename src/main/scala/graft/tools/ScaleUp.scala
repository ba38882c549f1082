package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-sweep data generator: replicate the driver testdata K× with
  * shifted keys so every fact/dim relationship survives, producing an
  * sf-N dataset for empirical scale points (the 100 TB claims rest on
  * plan shape; this buys measured ones). Design:
  *
  *  - `region`/`nation` stay fixed (TPC-H scaling convention — dims of
  *    bounded cardinality don't grow with SF).
  *  - Every scaled table shifts its OWN keys and its FOREIGN keys by
  *    `replica * KeyBase`, so each replica is an isomorphic, disjoint
  *    copy: joins keep exactly the sf0.1 fan-out, the co-occurrence
  *    graph becomes K disjoint components, group counts scale linearly.
  *    That is the honest scale test — per-key densification would
  *    instead quadratically inflate pair-explosion operators by
  *    CONSTRUCTION and measure the synthetic skew, not the plan.
  *  - Timestamps are left unchanged: the same span carries K× the
  *    events/day, which is how an observability workload actually
  *    scales (more executors, same wall-clock window).
  *  - `documents.text` gets a per-replica token suffix (every
  *    alphanumeric token `w` → `w z<i>`-joined, replica 0 verbatim) so
  *    cross-replica near-dup similarity collapses while WITHIN-replica
  *    shingle/minhash/simhash structure stays isomorphic — dedup work
  *    scales linearly instead of exploding each LSH bucket K×
  *    (pairs K²×). `n_chars` is recomputed to stay consistent.
  *  - `embeddings.embedding` is rotated by `replica` positions —
  *    rotation preserves norms and all WITHIN-replica dot products
  *    (ANN/near-dup structure isomorphic) while cross-replica cosines
  *    decorrelate.
  *
  * Usage: runMain graft.tools.ScaleUp <srcSfDir> <outDir> <factor>
  */
object ScaleUp {

  /** Shift added per replica to every scaled key — far above any key in
    * the source data (max observed ~6e5 at sf0.1) and small enough that
    * factor·base products stay far from int64 limits in downstream
    * query arithmetic (keys reach ~1e9 at factor 10; queries multiply
    * keys by small constants only).
    */
  val KeyBase = 100000000L

  private def replicate(df: DataFrame, factor: Int)(
      one: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until factor).map(i => one(df, i)).reduce(_ unionByName _)

  private def shift(c: String, i: Int) =
    (col(c) + lit(i * KeyBase)).as(c)

  def scale(spark: SparkSession, src: String, out: String, factor: Int): Unit = {
    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite")
        .parquet(s"$out/$t.parquet")

    // fixed dims: straight copies
    Seq("region", "nation").foreach(t => write(read(t), t, 1))

    write(replicate(read("customer"), factor)((d, i) =>
      d.select(shift("c_custkey", i), col("c_name"), col("c_nationkey"),
        col("c_acctbal"), col("c_mktsegment"))), "customer", 4)

    write(replicate(read("supplier"), factor)((d, i) =>
      d.select(shift("s_suppkey", i), col("s_name"), col("s_nationkey"),
        col("s_acctbal"))), "supplier", 1)

    write(replicate(read("part"), factor)((d, i) =>
      d.select(shift("p_partkey", i), col("p_name"), col("p_brand"),
        col("p_type"), col("p_size"), col("p_retailprice"))), "part", 4)

    write(replicate(read("orders"), factor)((d, i) =>
      d.select(shift("o_orderkey", i), shift("o_custkey", i),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority"))), "orders", 8)

    write(replicate(read("lineitem"), factor)((d, i) =>
      d.select(shift("l_orderkey", i), shift("l_partkey", i),
        shift("l_suppkey", i), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_tax"),
        col("l_returnflag"), col("l_linestatus"), col("l_shipdate"))),
      "lineitem", 32)

    // events.user_id lives in the c_custkey domain (q235's join) —
    // shift it with the customers
    write(replicate(read("events"), factor)((d, i) =>
      d.select(shift("event_id", i), col("ts"), shift("user_id", i),
        col("event_type"), col("value"), col("props"))), "events", 16)

    write(replicate(read("documents"), factor) { (d, i) =>
      val text =
        if (i == 0) col("text")
        else regexp_replace(col("text"), "([A-Za-z0-9]+)", s"$$1z$i")
      d.select(shift("doc_id", i), text.as("text"), col("lang"),
        col("source"), length(text).cast("long").as("n_chars"))
    }, "documents", 8)

    write(replicate(read("embeddings"), factor) { (d, i) =>
      val emb =
        if (i == 0) col("embedding")
        else expr(s"concat(slice(embedding, ${i + 1}, size(embedding) - $i), " +
          s"slice(embedding, 1, $i))")
      d.select(shift("vec_id", i), emb.as("embedding"), col("label"))
    }, "embeddings", 2)
  }

  def main(args: Array[String]): Unit = {
    val Array(src, out, factorStr) = args.take(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    scale(spark, src, out, factorStr.toInt)
    // sanity: every scaled table is exactly factor× the source
    Seq("customer", "supplier", "part", "orders", "lineitem", "events",
      "documents", "embeddings").foreach { t =>
      val n0 = spark.read.parquet(s"$src/$t.parquet").count()
      val n1 = spark.read.parquet(s"$out/$t.parquet").count()
      println(s"[scaleup] $t: $n0 -> $n1 (${factorStr}x expected)")
      require(n1 == n0 * factorStr.toInt, s"$t scaled wrong: $n0 -> $n1")
    }
    spark.stop()
  }
}
