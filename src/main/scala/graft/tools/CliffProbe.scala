package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level probe for the scale-cliff suspects (q19/q118): where
  * does the time go — signature compute, band-key explosion, candidate
  * volume, or verify/dedup? Prints predicted candidate volume next to
  * the measured count so the uniform model can be checked per scale
  * point, the autoIntactBands choice for the corpus, and the
  * GuardMetrics totals (silent recall loss would invalidate a probe).
  * runMain graft.tools.CliffProbe <sfDir> [comma rList, default 1,2]
  */
object CliffProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val rList = args.lift(1).map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(1, 2))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.dedup.Dedup

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    // ---- q19 shape ----
    val sigged = graft.sources.Tables.documents(spark, sfDir)
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"),
        Dedup.simhashOf(Dedup.shingles(col("text"), 3), Dedup.md5Hash60, 60).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = t("q19 signatures (materialize)")(sigged.count())
    println(s"[probe] docs: $n")
    println(s"[probe] q19 autoIntactBands(n=$n, 60, 10) = " +
      s"${Dedup.autoIntactBands(n, 60, 10)}")
    rList.foreach { r =>
      val bands = 10 + r
      val keyed = sigged.select(col("doc_id"),
        Dedup.simhashBandKeys(col("sig"), bands, 60).as("bk"))
      // candidate volume = sum over (combo, bucket) of C(cnt, 2)
      val combos = (0 until bands).combinations(r).toSeq
      val comboKeys = array(combos.zipWithIndex.map { case (c, ci) =>
        struct((lit(ci).as("c") +: c.zipWithIndex.map { case (b, k) =>
          element_at(col("bk"), b + 1).as(s"b$k") }): _*)
      }: _*)
      val cand = t(s"q19 candidate count r=$r")(
        keyed.select(explode(comboKeys).as("bucket"))
          .groupBy("bucket").agg(count(lit(1)).as("n"))
          .agg(sum(expr("n * (n - 1) div 2")).as("cand"))
          .head().getLong(0))
      println(f"[probe] q19 r=$r: candidates=$cand (predicted " +
        f"${Dedup.simhashCandidateVolume(n, 60, 10, r)}%.3g)")
      val top = keyed.select(explode(comboKeys).as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc).limit(5)
        .select(col("n")).collect().map(_.getLong(0)).mkString(",")
      println(s"[probe] q19 r=$r: top buckets=$top")
      val full = t(s"q19 full pairs r=$r")(
        Dedup.simhashNearDupPairs(sigged, "doc_id", "sig", 10, 60, r).count())
      println(s"[probe] q19 r=$r: pairs=$full")
    }

    // ---- q118 shape ----
    val c = graft.sources.Tables.customer(spark, sfDir).select(
      col("c_custkey"), col("c_nationkey").cast("long").as("nat"),
      col("c_mktsegment").as("seg"),
      floor(col("c_acctbal") / 500.0).cast("long").as("bal_b"),
      substring(col("c_name"), -2, 2).as("suffix")).persist()
    println(s"[probe] customers: ${c.count()}")
    Seq(Seq("nat", "bal_b"), Seq("nat", "bal_b", "seg"),
        Seq("nat", "bal_b", "suffix")).foreach { b =>
      val cand = t(s"q118 candidates block=${b.mkString(",")}")(
        c.groupBy(b.map(col): _*).agg(count(lit(1)).as("n"))
          .agg(sum(expr("n * (n - 1) div 2")).as("cand")).head().getLong(0))
      println(s"[probe] q118 block=${b.mkString(",")}: candidates=$cand")
    }
    val fields = Seq(("seg", 30L), ("bal_b", 40L), ("suffix", 30L))
    val single = t("q118 single-block full")(
      graft.operators.RecordLinkage.scorePairs(
        c, "c_custkey", Seq("nat", "bal_b"), fields, 70L).count())
    println(s"[probe] q118 single-block rows=$single")
    val union = t("q118 union-block full")(
      graft.operators.RecordLinkage.scorePairsUnionBlocked(c, "c_custkey",
        Seq(Seq("nat", "bal_b", "seg"), Seq("nat", "bal_b", "suffix")),
        fields, 70L).count())
    println(s"[probe] q118 union-block rows=$union")
    graft.operators.GuardMetrics.drainListenerBus(spark)
    val g = graft.operators.GuardMetrics.snapshot()
    println(s"[probe] guards: dropped=${g.droppedMemberships} fires=${g.fires} " +
      s"max_bucket=${g.maxBucketSeen}")
    spark.stop()
  }
}
