package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-table referential-integrity audit: for each declared
  * child→parent relationship, count the child rows whose foreign key
  * matches no parent — the conformance complement of the per-column
  * [[Expectations]] gates. One summary row per relationship feeds a
  * data-quality dashboard or a publish gate ([[Publish]]).
  *
  * Each rule is one LEFT JOIN + conditional count on the key —
  * Catalyst broadcasts parent key sets that fit (dimension tables at
  * any scale) and shuffle-joins the rest; counting via the join (not
  * `anti` + separate `count`) keeps it a single pass per rule. NULL
  * foreign keys pass (SQL RI convention — nullability is a different
  * expectation). The per-rule summaries union into one
  * metadata-scale frame.
  */
object Integrity {

  /** One rule: relationship label, child frame + FK column, parent
    * frame + PK column.
    */
  final case class RefRule(name: String, child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String)

  /** (relationship, child_rows, orphan_rows, orphan_keys) per rule,
    * in the given order of `rules`.
    */
  def audit(rules: Seq[RefRule]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    rules.map { r =>
      val parentKeys = r.parent.select(col(r.parentKey).as("__pk")).distinct()
      val orphanFlag = col(r.childKey).isNotNull && col("__pk").isNull
      r.child.select(col(r.childKey))
        .join(parentKeys, col(r.childKey) === col("__pk"), "left")
        .agg(
          count(lit(1)).as("child_rows"),
          sum(when(orphanFlag, 1L).otherwise(0L)).as("orphan_rows"),
          count_distinct(when(orphanFlag, col(r.childKey))).as("orphan_keys"))
        .select(lit(r.name).as("relationship"), col("child_rows"),
          col("orphan_rows"), col("orphan_keys"))
    }.reduce(_ unionAll _)
  }
}
