package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Composite-aggregation paging: walk a keyset-ordered bucket space one
  * page at a time, resuming each page from the previous page's last
  * key — the ES/OpenSearch `composite` agg with `after`, the only agg
  * that pages through MORE buckets than fit in one response (cf. the
  * reference's OpenSearch query surface; dashboards export
  * deployment/.../dashboards/data-skew.ndjson).
  *
  * The scale story is the after-key filter: page N is "buckets with key
  * strictly greater (lexicographically) than after, first `size` in key
  * order" — a predicate + TakeOrdered over the bucket frame, never a
  * global rank. The bucket frame itself is one hash aggregation; it is
  * persisted across the page walk so each page re-reads the aggregated
  * buckets, not the raw table.
  *
  * `pages` is a driver round-trip protocol by design (an ES client
  * cannot get page N without page N−1's after-key); each round trip
  * collects ONE page — bounded by `size`, never data-scale — and the
  * final result is a local relation of ≤ size·nPages rows.
  */
object Composite {

  /** Lexicographic "strictly after" predicate over `keys`. */
  private def afterPredicate(keys: Seq[String], after: Seq[Any]): Column =
    keys.zip(after).zipWithIndex.map { case ((k, a), i) =>
      val prefixEq = keys.take(i).zip(after.take(i))
        .map { case (pk, pa) => col(pk) === lit(pa) }
        .foldLeft(lit(true))(_ && _)
      prefixEq && col(k) > lit(a)
    }.reduce(_ || _)

  /** One page of `buckets` (an already-aggregated frame): the first
    * `size` rows in ascending key order strictly after `after` (all
    * rows from the start when `after` is None). Key columns must be
    * non-null (ES composite sources skip missing by default).
    */
  def page(buckets: DataFrame, keys: Seq[String], size: Int,
      after: Option[Seq[Any]]): DataFrame = {
    val filtered = after.fold(buckets)(a =>
      buckets.filter(afterPredicate(keys, a)))
    filtered.orderBy(keys.map(col(_).asc): _*).limit(size)
  }

  /** Walk `nPages` pages, tagging each row with its 0-based `page`.
    * Returns a LOCAL relation (total rows ≤ size·nPages); the bucket
    * frame is persisted for the walk and lazily unpersisted after.
    */
  def pages(buckets: DataFrame, keys: Seq[String], size: Int,
      nPages: Int): DataFrame = {
    val spark = buckets.sparkSession
    val b = buckets.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out = scala.collection.mutable.ArrayBuffer.empty[Row]
    var after: Option[Seq[Any]] = None
    var p = 0
    var exhausted = false
    while (p < nPages && !exhausted) {
      val rows = page(b, keys, size, after).collect()
      if (rows.isEmpty) exhausted = true
      else {
        out ++= rows.map(r => Row.fromSeq(p.toLong +: r.toSeq))
        after = Some(keys.map(k => rows.last.getAs[Any](k)))
        p += 1
      }
    }
    b.unpersist(blocking = false)
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("page",
        org.apache.spark.sql.types.LongType, nullable = false) +:
        buckets.schema.fields.toSeq)
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.toSeq, 1), schema)
  }
}
