package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CDC changelog application (MERGE INTO semantics): fold a stream of
  * keyed insert/update/delete change records into a base snapshot.
  *
  * Reference analog: the observability pipeline's OpenSearch indexes are
  * upsert-by-`_id` document stores (index op type, bootstrap template
  * `deployment/infra/resources/lambda/opensearch-bootstrap/bootstrap.py:223-229`)
  * — every delivered record replaces the prior version of its key and
  * deletes drop it. This operator is the batch/lakehouse equivalent over
  * parquet snapshots.
  *
  * Scale shape: the changelog is first reduced to ONE winning change per
  * key with an algebraic `max_by` aggregation (map-side partial combine —
  * at 100 TB the changelog may hold thousands of versions per hot key and
  * they collapse before the exchange). The reduced delta then meets the
  * snapshot in a single full-outer hash join on the key: one shuffle of
  * each side, no windows over raw rows, no driver state. With a bucketed
  * snapshot (`sources/Bucketing`) the snapshot side's exchange disappears
  * entirely — the natural nightly-merge layout.
  */
object MergeApply {

  /** Apply `changes` to `snapshot`.
    *
    * @param snapshot base rows: `keyCol` ++ `payloadCols`
    * @param changes  change rows: `keyCol`, `seqCol` (version order),
    *                 `opCol` ('I' | 'U' | 'D') ++ `payloadCols`
    * Latest change per key wins (ties broken by the op string — stable
    * and deterministic for exact replay); 'D' removes the key, 'I'/'U'
    * upsert the payload; untouched snapshot keys pass through.
    */
  def apply(snapshot: DataFrame, changes: DataFrame, keyCol: String,
      seqCol: String, opCol: String, payloadCols: Seq[String]): DataFrame = {
    val payload = struct(payloadCols.map(col): _*)
    // one winning change per key: algebraic argmax, partial-agg friendly
    val winner = changes.groupBy(col(keyCol)).agg(
      max_by(struct(col(opCol).as("op"), payload.as("p")),
        struct(col(seqCol), col(opCol))).as("w"))
    val joined = snapshot.as("s").join(winner.as("c"),
      col(s"s.$keyCol") === col(s"c.$keyCol"), "full_outer")
    val hasChange = col(s"c.$keyCol").isNotNull
    val isDelete = hasChange && col("c.w.op") === lit("D")
    val outKey = coalesce(col(s"s.$keyCol"), col(s"c.$keyCol")).as(keyCol)
    val outs: Seq[Column] = payloadCols.map { p =>
      when(hasChange, col(s"c.w.p.$p")).otherwise(col(s"s.$p")).as(p)
    }
    joined.filter(!isDelete).select(outKey +: outs: _*)
  }
}
