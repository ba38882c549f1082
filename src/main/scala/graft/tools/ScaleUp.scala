package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-sweep data generator: replicate the driver testdata K× so
  * every fact/dim relationship survives, producing an sf-N dataset for
  * empirical scale points (the 100 TB claims rest on plan shape; this
  * buys measured ones). Design — each choice here was validated by a
  * first sweep whose artifacts it now avoids:
  *
  *  - `region`/`nation` stay fixed (TPC-H scaling convention — dims of
  *    bounded cardinality don't grow with SF).
  *  - Keys DENSIFY rather than shift: `k·factor + replica` maps the
  *    0-based contiguous key domains onto a 0-based contiguous K×
  *    domain. Equality joins keep exactly the sf0.1 fan-out (the same
  *    transform applies to both sides of every FK), per-replica
  *    subgraphs stay disjoint and isomorphic — and ARITHMETIC-derived
  *    relations keep their closure: q128's `parent = partkey div 3`
  *    hierarchy needs every quotient to be an existing key, which a
  *    +10^8 shift breaks (the operator's dangling-pointer fail-fast
  *    correctly rejected that first attempt) but a dense domain keeps.
  *  - Timestamps are left unchanged: the same span carries K× the
  *    events/day, which is how an observability workload actually
  *    scales (more executors, same wall-clock window).
  *  - Text decorrelates by a PER-REPLICA SUBSTITUTION CIPHER
  *    (alphabet/digit rotation via `translate`), not a token suffix: a
  *    suffix leaves cross-replica tokens at edit distance 1 and sharing
  *    most char n-grams, which quadratically exploded the fuzzy-join /
  *    char-ngram / simhash families in the first sweep (×15–×120 on a
  *    10× scale-up — all construction, no plan defect). A cipher keeps
  *    every within-replica relation EXACTLY isomorphic (lengths, token
  *    boundaries, equalities, hashes-modulo-renaming) while
  *    cross-replica tokens differ in every character. Applied to
  *    `documents.text` and to `c_name`/`s_name` (name-blocked linkage);
  *    `props` stays verbatim (it is parsed as JSON, row-locally).
  *  - `embeddings.embedding` decorrelates by a per-replica ±1 DIAGONAL
  *    (hash-driven sign flips): within-replica dot products are
  *    preserved EXACTLY (float·−1 is exact, D²=I), cross-replica
  *    cosines cancel to ~0 even for smooth/structured vectors — which
  *    defeated the first attempt's rotation (a smooth vector rotated by
  *    a few positions stays nearly parallel to itself; ×70–×88).
  *  - Each table lands as a SINGLE `<table>.parquet` FILE (written via
  *    one task, then renamed), mirroring the driver layout — the
  *    streaming-harness queries symlink `events.parquet` into a spool
  *    as a file. Parquet files split by row group, so read parallelism
  *    is unaffected.
  *
  * Usage: runMain graft.tools.ScaleUp <srcSfDir> <outDir> <factor>
  */
object ScaleUp {

  private def dense(c: String, factor: Int, i: Int) =
    (col(c) * factor + lit(i)).as(c)

  /** Per-replica substitution cipher: rotate a-z, A-Z and 0-9 each by
    * `i` positions. Replica 0 is the identity (verbatim source text).
    */
  private def cipher(c: Column, i: Int): Column =
    if (i == 0) c
    else {
      def rot(s: String, n: Int) = s.drop(n % s.length) + s.take(n % s.length)
      val lower = "abcdefghijklmnopqrstuvwxyz"
      val upper = lower.toUpperCase
      val digit = "0123456789"
      translate(c, lower + upper + digit,
        rot(lower, i) + rot(upper, i) + rot(digit, i))
    }

  /** Per-replica ±1 diagonal over a float array: sign of element j in
    * replica i is hash-driven — deterministic, norm-preserving, exact.
    */
  private def signFlip(c: String, i: Int): Column =
    if (i == 0) col(c)
    else expr(s"transform($c, (x, j) -> IF(pmod(hash(j, $i), 2) = 0, x, -x))")

  private def replicate(df: DataFrame, factor: Int)(
      one: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until factor).map(i => one(df, i)).reduce(_ unionByName _)

  def scale(spark: SparkSession, src: String, out: String, factor: Int): Unit = {
    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    // single-file layout: write through one task, rename the part file
    // to <out>/<t>.parquet (the testdata layout the harnesses expect)
    def write(df: DataFrame, t: String): Unit = {
      import java.nio.file.{Files, Paths, StandardCopyOption}
      import scala.jdk.CollectionConverters._
      val tmp = s"$out/_tmp_$t"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val listing = Files.list(Paths.get(tmp))
      val part =
        try listing.iterator().asScala.find(_.toString.endsWith(".parquet"))
        finally listing.close()
      require(part.isDefined,
        s"scale-up write for '$t' produced no .parquet part under $tmp")
      Files.createDirectories(Paths.get(out))
      Files.move(part.get, Paths.get(s"$out/$t.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      val walk = Files.walk(Paths.get(tmp))
      val leftovers = try walk.iterator().asScala.toSeq finally walk.close()
      leftovers.reverse.foreach(p => Files.deleteIfExists(p))
    }
    def d(c: String, i: Int) = dense(c, factor, i)

    Seq("region", "nation").foreach(t => write(read(t), t))

    write(replicate(read("customer"), factor)((df, i) =>
      df.select(d("c_custkey", i), cipher(col("c_name"), i).as("c_name"),
        col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))),
      "customer")

    write(replicate(read("supplier"), factor)((df, i) =>
      df.select(d("s_suppkey", i), cipher(col("s_name"), i).as("s_name"),
        col("s_nationkey"), col("s_acctbal"))), "supplier")

    write(replicate(read("part"), factor)((df, i) =>
      df.select(d("p_partkey", i), col("p_name"), col("p_brand"),
        col("p_type"), col("p_size"), col("p_retailprice"))), "part")

    write(replicate(read("orders"), factor)((df, i) =>
      df.select(d("o_orderkey", i), d("o_custkey", i),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority"))), "orders")

    write(replicate(read("lineitem"), factor)((df, i) =>
      df.select(d("l_orderkey", i), d("l_partkey", i),
        d("l_suppkey", i), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_tax"),
        col("l_returnflag"), col("l_linestatus"), col("l_shipdate"))),
      "lineitem")

    // events.user_id lives in the c_custkey domain (q235's join) —
    // densify it with the customers; props stays verbatim (parsed as
    // JSON row-locally, never pair-joined)
    write(replicate(read("events"), factor)((df, i) =>
      df.select(d("event_id", i), col("ts"), d("user_id", i),
        col("event_type"), col("value"), col("props"))), "events")

    // the cipher preserves length, so n_chars stays consistent
    write(replicate(read("documents"), factor)((df, i) =>
      df.select(d("doc_id", i), cipher(col("text"), i).as("text"),
        col("lang"), col("source"), col("n_chars"))), "documents")

    write(replicate(read("embeddings"), factor)((df, i) =>
      df.select(d("vec_id", i), signFlip("embedding", i).as("embedding"),
        col("label"))), "embeddings")
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
